from .align import align

__all__ = ["align"]
