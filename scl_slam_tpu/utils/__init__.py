from . import logging, timing

__all__ = ["logging", "timing"]
