"""Differentiable augmentation for data-efficient GAN training.

Parity: /root/reference/deep3dmap/models/function_utils/diff_augment.py
(Zhao et al. 2020): color (brightness/saturation/contrast), translation,
cutout — NHWC, explicit rng, all static shapes (translation via pad+dynamic
gather, cutout via coordinate masks).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _rand_brightness(rng, x):
    return x + (jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) - 0.5)


def _rand_saturation(rng, x):
    mean = x.mean(axis=-1, keepdims=True)
    return (x - mean) * (jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) * 2) + mean


def _rand_contrast(rng, x):
    mean = x.mean(axis=(1, 2, 3), keepdims=True)
    return (x - mean) * (jax.random.uniform(rng, (x.shape[0], 1, 1, 1)) + 0.5) + mean


def _rand_translation(rng, x, ratio=0.125):
    B, H, W, C = x.shape
    sh, sw = int(H * ratio + 0.5), int(W * ratio + 0.5)
    r1, r2 = jax.random.split(rng)
    ty = jax.random.randint(r1, (B, 1, 1), -sh, sh + 1)
    tx = jax.random.randint(r2, (B, 1, 1), -sw, sw + 1)
    grid_y = jnp.clip(jnp.arange(H)[None, :, None] + ty + 1, 0, H + 1)
    grid_x = jnp.clip(jnp.arange(W)[None, None, :] + tx + 1, 0, W + 1)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    batch = jnp.arange(B)[:, None, None]
    return xp[batch, grid_y, grid_x]


def _rand_cutout(rng, x, ratio=0.5):
    B, H, W, C = x.shape
    ch, cw = int(H * ratio + 0.5), int(W * ratio + 0.5)
    r1, r2 = jax.random.split(rng)
    oy = jax.random.randint(r1, (B, 1, 1), 0, H + (1 - ch % 2))
    ox = jax.random.randint(r2, (B, 1, 1), 0, W + (1 - cw % 2))
    gy = jnp.arange(H)[None, :, None]
    gx = jnp.arange(W)[None, None, :]
    mask = ((gy < oy - ch // 2) | (gy >= oy + (ch + 1) // 2)
            | (gx < ox - cw // 2) | (gx >= ox + (cw + 1) // 2))
    return x * mask[..., None].astype(x.dtype)


_FNS = {
    "color": [_rand_brightness, _rand_saturation, _rand_contrast],
    "translation": [_rand_translation],
    "cutout": [_rand_cutout],
}


def diff_augment(rng, x, policy=None):
    """x NHWC; policy: iterable of {'color','translation','cutout'}."""
    if not policy:
        return x
    if isinstance(policy, str):
        policy = policy.split(",")
    for p in policy:
        for fn in _FNS[p]:
            rng, sub = jax.random.split(rng)
            x = fn(sub, x)
    return x
