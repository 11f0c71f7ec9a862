from .basic import (
    L1Loss,
    SmoothL1Loss,
    MaskL1Loss,
    l1_loss,
    smooth_l1_loss,
    mask_l1_loss,
    reduce_loss,
)

__all__ = [
    "L1Loss",
    "SmoothL1Loss",
    "MaskL1Loss",
    "l1_loss",
    "smooth_l1_loss",
    "mask_l1_loss",
    "reduce_loss",
]
