from . import deskew, pointcloud, registration

__all__ = ["deskew", "pointcloud", "registration"]
