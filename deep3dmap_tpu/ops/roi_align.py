"""RoIAlign / RoIPool, differentiable and jit-compatible.

Parity targets: /root/reference/deep3dmap/core/ops/roi_align.py:14-133 (the
only Python-wrapped ops in the reference's CUDA zoo) plus roi_pool.cpp and
roi_align_rotated.cpp.  The CUDA kernels parallelize over output pixels with
atomic-add backward; here each RoI is a dense grid of bilinear samples built
with pure gathers, so forward AND backward are XLA-generated (no custom VJP
needed) and the sampling grid batches onto the VPU.

Layout note: NCHW like the reference wrapper (callers in mmdet style).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _bilinear(feat, y, x):
    """feat (C, H, W); y/x arbitrary equal shapes -> (C, *y.shape).
    Out-of-range samples contribute 0 (matches roi_align.cpp boundary)."""
    H, W = feat.shape[-2:]
    valid = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy1 = y - y0
    wx1 = x - x0
    wy0 = 1.0 - wy1
    wx0 = 1.0 - wx1

    def g(yy, xx):
        return feat[:, yy.astype(jnp.int32), xx.astype(jnp.int32)]

    out = (g(y0, x0) * (wy0 * wx0) + g(y0, x1) * (wy0 * wx1) +
           g(y1, x0) * (wy1 * wx0) + g(y1, x1) * (wy1 * wx1))
    return out * valid


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio", "aligned"))
def roi_align(input, rois, output_size, spatial_scale: float = 1.0,
              sampling_ratio: int = 0, aligned: bool = True):
    """input (N, C, H, W), rois (R, 5) [batch_idx, x1, y1, x2, y2] ->
    (R, C, out_h, out_w).  sampling_ratio<=0 falls back to a fixed 2×2
    sample grid per bin (the adaptive ceil(roi/out) of the CUDA kernel needs
    dynamic shapes; 2 is its value for typical RoI≈2×out sizes)."""
    out_h, out_w = (output_size if isinstance(output_size, (tuple, list))
                    else (output_size, output_size))
    s = sampling_ratio if sampling_ratio > 0 else 2
    offset = 0.5 if aligned else 0.0

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        x1, y1, x2, y2 = roi[1] * spatial_scale - offset, \
            roi[2] * spatial_scale - offset, \
            roi[3] * spatial_scale - offset, roi[4] * spatial_scale - offset
        rw = x2 - x1
        rh = y2 - y1
        if not aligned:
            rw = jnp.maximum(rw, 1.0)
            rh = jnp.maximum(rh, 1.0)
        bin_w = rw / out_w
        bin_h = rh / out_h
        # sample grid: (out_h*s, out_w*s)
        gy = y1 + (jnp.arange(out_h * s) + 0.5) * bin_h / s
        gx = x1 + (jnp.arange(out_w * s) + 0.5) * bin_w / s
        yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
        feat = jnp.take(input, b, axis=0)  # (C, H, W)
        samples = _bilinear(feat, yy, xx)  # (C, out_h*s, out_w*s)
        C = samples.shape[0]
        return samples.reshape(C, out_h, s, out_w, s).mean((2, 4))

    return jax.vmap(one_roi)(jnp.asarray(rois, jnp.float32))


@partial(jax.jit, static_argnames=("output_size",))
def roi_pool(input, rois, output_size, spatial_scale: float = 1.0):
    """Max-pool RoI pooling (roi_pool.cpp) via a dense sample grid per bin."""
    out_h, out_w = (output_size if isinstance(output_size, (tuple, list))
                    else (output_size, output_size))
    s = 4  # samples per bin side; dense enough to hit the max on real grids

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        x1 = jnp.round(roi[1] * spatial_scale)
        y1 = jnp.round(roi[2] * spatial_scale)
        x2 = jnp.round(roi[3] * spatial_scale)
        y2 = jnp.round(roi[4] * spatial_scale)
        rw = jnp.maximum(x2 - x1 + 1, 1.0)
        rh = jnp.maximum(y2 - y1 + 1, 1.0)
        gy = y1 + (jnp.arange(out_h * s) + 0.5) * rh / (out_h * s) - 0.5
        gx = x1 + (jnp.arange(out_w * s) + 0.5) * rw / (out_w * s) - 0.5
        yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
        feat = jnp.take(input, b, axis=0)
        samples = _bilinear(feat, yy, xx)
        C = samples.shape[0]
        return samples.reshape(C, out_h, s, out_w, s).max((2, 4))

    return jax.vmap(one_roi)(jnp.asarray(rois, jnp.float32))


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio",
                                   "aligned", "clockwise"))
def roi_align_rotated(input, rois, output_size, spatial_scale: float = 1.0,
                      sampling_ratio: int = 0, aligned: bool = True,
                      clockwise: bool = False):
    """Rotated RoIAlign (roi_align_rotated.cpp): rois (R, 6) =
    [batch_idx, cx, cy, w, h, angle-rad]."""
    out_h, out_w = (output_size if isinstance(output_size, (tuple, list))
                    else (output_size, output_size))
    s = sampling_ratio if sampling_ratio > 0 else 2
    offset = 0.5 if aligned else 0.0

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        cx = roi[1] * spatial_scale - offset
        cy = roi[2] * spatial_scale - offset
        w = roi[3] * spatial_scale
        h = roi[4] * spatial_scale
        theta = -roi[5] if clockwise else roi[5]
        if not aligned:
            w = jnp.maximum(w, 1.0)
            h = jnp.maximum(h, 1.0)
        gy = (jnp.arange(out_h * s) + 0.5) * (h / (out_h * s)) - h / 2
        gx = (jnp.arange(out_w * s) + 0.5) * (w / (out_w * s)) - w / 2
        yy, xx = jnp.meshgrid(gy, gx, indexing="ij")
        cos, sin = jnp.cos(theta), jnp.sin(theta)
        ry = yy * cos + xx * sin + cy
        rx = xx * cos - yy * sin + cx
        feat = jnp.take(input, b, axis=0)
        samples = _bilinear(feat, ry, rx)
        C = samples.shape[0]
        return samples.reshape(C, out_h, s, out_w, s).mean((2, 4))

    return jax.vmap(one_roi)(jnp.asarray(rois, jnp.float32))
