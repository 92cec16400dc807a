from . import base, scan_context

__all__ = ["base", "scan_context"]
