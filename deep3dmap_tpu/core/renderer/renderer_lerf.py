"""LERF ray renderers.

Parity: /root/reference/deep3dmap/core/renderer/renderer_lerf.py:5,20 —
CLIPRenderer (weight-composited embeddings, L2-normalized) and MeanRenderer.
"""
from __future__ import annotations

import jax.numpy as jnp


def render_clip(embeds: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    """embeds (..., S, D), weights (..., S, 1) -> (..., D) normalized.

    The norm floor (1e-3) bounds the 1/||out|| gradient scale when early-
    training ray weights are near zero; exact once opacity develops."""
    out = (embeds * weights).sum(axis=-2)
    # eps inside the sqrt: jnp.linalg.norm has a NaN gradient at exactly 0
    norm = jnp.sqrt((out ** 2).sum(-1, keepdims=True) + 1e-6)
    return out / norm


def render_mean(embeds: jnp.ndarray, weights: jnp.ndarray) -> jnp.ndarray:
    return (embeds * weights).sum(axis=-2)
