"""Bilinear/trilinear grid sampling in pure JAX (XLA gathers).

The TPU-native replacement for ``torch.nn.functional.grid_sample`` used by
the reference's back-projection (/root/reference/deep3dmap/core/voxel/
back_project.py:55) and TSDF resampling (datasets/pipelines/
transforms_seq.py:381).  Coordinates are in *pixel/voxel units* (not
normalized), matching ``align_corners=True`` semantics where pixel i sits at
coordinate i.  Out-of-bounds samples return 0 (zeros padding).
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray,
                   mode: str = "bilinear") -> jnp.ndarray:
    """Sample ``img`` (H, W, C) at continuous pixel coords (x, y) of shape (N,).

    Returns (N, C).  Zeros outside [0, W-1] x [0, H-1].
    """
    H, W = img.shape[0], img.shape[1]
    in_bounds = (x >= 0) & (x <= W - 1) & (y >= 0) & (y <= H - 1)

    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, H - 1)
        out = img[yi, xi]
        return out * in_bounds[..., None].astype(img.dtype)

    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    wx = jnp.clip(x, 0, W - 1) - x0
    wy = jnp.clip(y, 0, H - 1) - y0

    x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
    y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)

    v00 = img[y0i, x0i]
    v01 = img[y0i, x1i]
    v10 = img[y1i, x0i]
    v11 = img[y1i, x1i]

    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    out = (v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
           + v10 * (1 - wx) * wy + v11 * wx * wy)
    return out * in_bounds[..., None].astype(img.dtype)


def grid_sample_3d(vol: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
                   mode: str = "bilinear", fill: float = 0.0) -> jnp.ndarray:
    """Sample ``vol`` (X, Y, Z) or (X, Y, Z, C) at continuous voxel coords.

    Coordinate axes index the volume dims directly (x->dim0, y->dim1,
    z->dim2).  Out-of-bounds -> ``fill``.
    """
    squeeze = vol.ndim == 3
    if squeeze:
        vol = vol[..., None]
    X, Y, Z = vol.shape[:3]
    in_bounds = ((x >= 0) & (x <= X - 1) & (y >= 0) & (y <= Y - 1)
                 & (z >= 0) & (z <= Z - 1))

    if mode == "nearest":
        xi = jnp.clip(jnp.round(x).astype(jnp.int32), 0, X - 1)
        yi = jnp.clip(jnp.round(y).astype(jnp.int32), 0, Y - 1)
        zi = jnp.clip(jnp.round(z).astype(jnp.int32), 0, Z - 1)
        out = vol[xi, yi, zi]
    else:
        x0 = jnp.clip(jnp.floor(x), 0, X - 1)
        y0 = jnp.clip(jnp.floor(y), 0, Y - 1)
        z0 = jnp.clip(jnp.floor(z), 0, Z - 1)
        x1 = jnp.clip(x0 + 1, 0, X - 1)
        y1 = jnp.clip(y0 + 1, 0, Y - 1)
        z1 = jnp.clip(z0 + 1, 0, Z - 1)
        wx = (jnp.clip(x, 0, X - 1) - x0)[..., None].astype(vol.dtype)
        wy = (jnp.clip(y, 0, Y - 1) - y0)[..., None].astype(vol.dtype)
        wz = (jnp.clip(z, 0, Z - 1) - z0)[..., None].astype(vol.dtype)
        x0i, x1i = x0.astype(jnp.int32), x1.astype(jnp.int32)
        y0i, y1i = y0.astype(jnp.int32), y1.astype(jnp.int32)
        z0i, z1i = z0.astype(jnp.int32), z1.astype(jnp.int32)

        out = (vol[x0i, y0i, z0i] * (1 - wx) * (1 - wy) * (1 - wz)
               + vol[x1i, y0i, z0i] * wx * (1 - wy) * (1 - wz)
               + vol[x0i, y1i, z0i] * (1 - wx) * wy * (1 - wz)
               + vol[x0i, y0i, z1i] * (1 - wx) * (1 - wy) * wz
               + vol[x1i, y1i, z0i] * wx * wy * (1 - wz)
               + vol[x1i, y0i, z1i] * wx * (1 - wy) * wz
               + vol[x0i, y1i, z1i] * (1 - wx) * wy * wz
               + vol[x1i, y1i, z1i] * wx * wy * wz)

    mask = in_bounds[..., None].astype(vol.dtype)
    out = out * mask + fill * (1 - mask)
    if squeeze:
        out = out[..., 0]
    return out
