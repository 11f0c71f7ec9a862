"""Patch samplers for GAN-based NeRF training.

Parity: /root/reference/deep3dmap/core/renderer/samples/patch_sampler.py:
FullImageSampler / RescalePatchSampler / FlexPatchSampler (annealed random
scale-and-shift patch grids in [-1, 1]² coordinates).  Functional JAX
re-design: samplers return (coords, scales) given an explicit rng key and
iteration count — no hidden mutable state.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ....ops.grid_sample import grid_sample_2d


def _base_grid(patch_size: int):
    """(1, P, P, 2) grid over [-1,1]²; channel order (h, w) as the reference."""
    lin = jnp.linspace(-1.0, 1.0, patch_size)
    w, h = jnp.meshgrid(lin, lin, indexing="ij")
    return jnp.stack([h, w], axis=-1)[None]  # matches torch meshgrid + cat([h,w])


class FullImageSampler:
    full_indices = True

    def __call__(self, rng, nbatch: int, wh, iterations: int = 0):
        H, W = wh[1], wh[0]
        lin_h = jnp.linspace(-1, 1, W)
        lin_w = jnp.linspace(-1, 1, H)
        w, h = jnp.meshgrid(lin_w, lin_h, indexing="ij")
        coords = jnp.stack([h, w], axis=-1)[None].repeat(nbatch, 0)
        scales = jnp.ones((nbatch, 1, 1, 1))
        return coords, scales


class RescalePatchSampler:
    full_indices = False

    def __init__(self, scale: float = 1.0):
        self.scale = scale

    def __call__(self, rng, nbatch: int, patch_size: int, iterations: int = 0):
        coords = _base_grid(patch_size) * self.scale
        coords = jnp.repeat(coords, nbatch, axis=0)
        scales = jnp.ones((nbatch, 1, 1, 1))
        return coords, scales


class FlexPatchSampler:
    full_indices = False

    def __init__(self, random_shift: bool = True, random_scale: bool = True,
                 min_scale: float = 0.25, max_scale: float = 1.0,
                 scale_anneal: float = -1.0):
        self.random_shift = random_shift
        self.random_scale = random_scale
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.scale_anneal = scale_anneal

    def current_scales(self, iterations):
        """iterations may be a traced jnp scalar (annealing inside jit)."""
        if self.scale_anneal > 0:
            min_scale = jnp.maximum(self.min_scale,
                                    self.max_scale * jnp.exp(-iterations * self.scale_anneal))
            min_scale = jnp.minimum(0.8, min_scale)
        else:
            min_scale = self.min_scale
        return min_scale, self.max_scale

    def __call__(self, rng, nbatch: int, patch_size: int, iterations: int = 0):
        min_scale, max_scale = self.current_scales(iterations)
        grid = _base_grid(patch_size)

        r1, r2, r3 = jax.random.split(rng, 3)
        if self.random_scale:
            scales = jax.random.uniform(r1, (nbatch, 1, 1, 1)) * (max_scale - min_scale) + min_scale
        else:
            scales = jnp.full((nbatch, 1, 1, 1), min_scale)
        coords = grid * scales

        if self.random_shift:
            max_offset = 1.0 - scales
            h_off = (jax.random.uniform(r2, (nbatch, 1, 1, 1)) * 2 - 1) * max_offset
            w_off = (jax.random.uniform(r3, (nbatch, 1, 1, 1)) * 2 - 1) * max_offset
            coords = coords + jnp.concatenate([h_off, w_off], axis=-1)

        return coords, scales


def sample_image_patches(imgs: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear-sample (B,H,W,C) images at [-1,1]² coords (B,P,P,2) with
    (h,w) channel ordering — the grid_sample step of
    PatchSampler.image2patch."""
    B, H, W, C = imgs.shape
    P = coords.shape[1]

    def one(img, c):
        px = (c[..., 0] + 1) * 0.5 * (W - 1)
        py = (c[..., 1] + 1) * 0.5 * (H - 1)
        return grid_sample_2d(img, px.reshape(-1), py.reshape(-1)).reshape(P, P, C)

    return jax.vmap(one)(imgs, coords)
