"""Sigmoid / softmax focal losses.

Parity targets: /root/reference/deep3dmap/core/ops/csrc/pytorch/
focal_loss.cpp (sigmoid_focal_loss / softmax_focal_loss CUDA kernels).  On
TPU these are ordinary fused elementwise math — XLA fuses the probabilities,
modulators, and reduction into one pass, so no kernel is needed; gradients
come from autodiff (the CUDA backward is hand-written).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce(loss, weight, reduction, avg_factor=None):
    if weight is not None:
        loss = loss * weight
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    if avg_factor is not None:
        return jnp.sum(loss) / avg_factor
    return jnp.mean(loss)


def sigmoid_focal_loss(pred, target, gamma: float = 2.0, alpha: float = 0.25,
                       weight=None, reduction: str = "mean",
                       avg_factor=None):
    """pred (N, C) logits, target (N,) int class ids in [0, C).

    FL = -alpha_t * (1 - p_t)^gamma * log(p_t) per class-vs-rest sigmoid,
    matching focal_loss.cpp's per-element definition.
    """
    pred = jnp.asarray(pred, jnp.float32)
    num_classes = pred.shape[-1]
    t = jax.nn.one_hot(target, num_classes, dtype=pred.dtype)
    p = jax.nn.sigmoid(pred)
    pt = p * t + (1.0 - p) * (1.0 - t)
    alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
    # numerically stable BCE-with-logits
    bce = jnp.maximum(pred, 0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
    loss = alpha_t * ((1.0 - pt) ** gamma) * bce
    if weight is not None and weight.ndim == 1:
        weight = weight[:, None]
    return _reduce(loss, weight, reduction, avg_factor)


def softmax_focal_loss(pred, target, gamma: float = 2.0, alpha: float = 0.25,
                       weight=None, reduction: str = "mean",
                       avg_factor=None):
    """Softmax variant: FL = -alpha * (1 - p_target)^gamma * log(p_target)."""
    pred = jnp.asarray(pred, jnp.float32)
    logp = jax.nn.log_softmax(pred, axis=-1)
    logpt = jnp.take_along_axis(logp, target[:, None].astype(jnp.int32),
                                axis=-1)[:, 0]
    pt = jnp.exp(logpt)
    loss = -alpha * ((1.0 - pt) ** gamma) * logpt
    return _reduce(loss, weight, reduction, avg_factor)
