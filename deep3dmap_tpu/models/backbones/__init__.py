from .fpn2d import MnasFPN

__all__ = ["MnasFPN"]
