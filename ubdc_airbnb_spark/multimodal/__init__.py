from . import binary_ops

__all__ = ["binary_ops"]
