"""Elementwise regression losses.

Parity: /root/reference/deep3dmap/models/losses/l1_based_loss.py:55,107,147
(L1Loss / SmoothL1Loss / MaskL1Loss) and loss_utils.py:8-58 reduce/weight
helpers — as pure jnp functions plus thin registered classes.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..builder import LOSSES


def reduce_loss(loss, reduction: str = "mean", avg_factor: Optional[float] = None):
    if reduction == "none":
        return loss
    if reduction == "sum":
        return loss.sum()
    if reduction == "mean":
        if avg_factor is not None:
            return loss.sum() / jnp.maximum(avg_factor, 1e-12)
        return loss.mean()
    raise ValueError(f"unknown reduction {reduction}")


def l1_loss(pred, target, weight=None, reduction="mean", avg_factor=None):
    loss = jnp.abs(pred - target)
    if weight is not None:
        loss = loss * weight
    return reduce_loss(loss, reduction, avg_factor)


def smooth_l1_loss(pred, target, weight=None, beta: float = 1.0,
                   reduction="mean", avg_factor=None):
    diff = jnp.abs(pred - target)
    loss = jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
    if weight is not None:
        loss = loss * weight
    return reduce_loss(loss, reduction, avg_factor)


def mask_l1_loss(pred, target, mask, reduction="mean"):
    """Weighted-mask L1 (PRNet uv loss): per-pixel weights emphasize facial
    landmarks; normalized by the mask mass."""
    loss = jnp.abs(pred - target) * mask
    if reduction == "mean":
        return loss.sum() / jnp.maximum(jnp.broadcast_to(mask, loss.shape).sum(), 1e-12)
    return reduce_loss(loss, reduction)


@LOSSES.register_module()
class L1Loss:
    def __init__(self, reduction="mean", loss_weight=1.0):
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * l1_loss(pred, target, weight, self.reduction, avg_factor)


@LOSSES.register_module()
class SmoothL1Loss:
    def __init__(self, beta=1.0, reduction="mean", loss_weight=1.0):
        self.beta = beta
        self.reduction = reduction
        self.loss_weight = loss_weight

    def __call__(self, pred, target, weight=None, avg_factor=None):
        return self.loss_weight * smooth_l1_loss(pred, target, weight, self.beta,
                                                 self.reduction, avg_factor)


@LOSSES.register_module()
class MaskL1Loss:
    def __init__(self, mask=None, loss_weight=1.0):
        self.mask = mask
        self.loss_weight = loss_weight

    def __call__(self, pred, target, mask=None):
        m = mask if mask is not None else self.mask
        return self.loss_weight * mask_l1_loss(pred, target, m)
