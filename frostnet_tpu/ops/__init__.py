"""Custom ops: torch-semantics resize (Pallas kernels live here too)."""
from .resize import resize_bilinear, resize_nearest

__all__ = ["resize_bilinear", "resize_nearest"]
