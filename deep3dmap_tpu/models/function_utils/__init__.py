from .diff_augment import diff_augment

__all__ = ["diff_augment"]
