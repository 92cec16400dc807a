from . import pointcloud, registration

__all__ = ["pointcloud", "registration"]
