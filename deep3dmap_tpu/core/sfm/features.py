"""On-device feature detection and matching for the SfM/pose layer.

TPU-first design: Harris corner response via depthwise convs, non-max
suppression as a max-pool equality test, fixed-K keypoint selection with
``top_k`` (static shapes), patch descriptors gathered in one fused
``dynamic_slice``-free gather, and descriptor matching as a single
[K, D] x [D, K] matmul on the MXU with branch-free mutual-nearest +
Lowe-ratio filtering.  Everything jits; no data-dependent shapes.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


def _conv2(img, kernel):
    """Single-channel 2D conv, SAME padding.  img [H,W], kernel [kh,kw]."""
    return jax.lax.conv_general_dilated(
        img[None, :, :, None], kernel[:, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]


_SOBEL_X = jnp.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
_SOBEL_Y = _SOBEL_X.T


def harris_response(img: jnp.ndarray, k: float = 0.04, sigma_win: int = 3):
    """Harris corner response for a grayscale image [H, W] in [0, 1]."""
    gx = _conv2(img, _SOBEL_X.astype(img.dtype))
    gy = _conv2(img, _SOBEL_Y.astype(img.dtype))
    box = jnp.ones((sigma_win, sigma_win), img.dtype) / (sigma_win * sigma_win)
    Sxx, Syy, Sxy = _conv2(gx * gx, box), _conv2(gy * gy, box), _conv2(gx * gy, box)
    det = Sxx * Syy - Sxy * Sxy
    tr = Sxx + Syy
    return det - k * tr * tr


class Keypoints(NamedTuple):
    xy: jnp.ndarray      # [K, 2] (x, y) pixel coords
    score: jnp.ndarray   # [K]
    valid: jnp.ndarray   # [K] bool


def detect_keypoints(img: jnp.ndarray, k: int = 512, nms_radius: int = 4,
                     border: int = 8) -> Keypoints:
    """Top-k Harris corners after local non-max suppression (static K)."""
    resp = harris_response(img)
    H, W = resp.shape
    win = 2 * nms_radius + 1
    pooled = jax.lax.reduce_window(resp, -jnp.inf, jax.lax.max,
                                   (win, win), (1, 1), "SAME")
    is_max = (resp >= pooled)
    yy, xx = jnp.mgrid[0:H, 0:W]
    inb = ((xx >= border) & (xx < W - border) & (yy >= border) & (yy < H - border))
    score = jnp.where(is_max & inb, resp, -jnp.inf)
    flat = score.reshape(-1)
    top, idx = jax.lax.top_k(flat, k)
    xy = jnp.stack([idx % W, idx // W], -1)
    return Keypoints(xy=xy, score=top, valid=jnp.isfinite(top) & (top > 0))


def extract_descriptors(img: jnp.ndarray, kps: Keypoints, patch: int = 8,
                        stride: int = 2) -> jnp.ndarray:
    """Normalized intensity-patch descriptors [K, patch*patch].

    Samples a (patch x patch) grid with spacing ``stride`` around each
    keypoint via one batched gather (clamped), then zero-means and
    L2-normalizes — matching on the MXU reduces to cosine similarity.
    """
    H, W = img.shape
    half = (patch - 1) * stride / 2.0
    offs = jnp.arange(patch, dtype=img.dtype) * stride - half
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    gx = jnp.clip(kps.xy[:, 0:1, None] + ox[None], 0, W - 1)   # [K, p, p]
    gy = jnp.clip(kps.xy[:, 1:2, None] + oy[None], 0, H - 1)
    vals = img[gy.astype(jnp.int32), gx.astype(jnp.int32)]      # [K, p, p]
    d = vals.reshape(vals.shape[0], -1)
    d = d - jnp.mean(d, -1, keepdims=True)
    n = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d / jnp.where(n < 1e-8, 1.0, n)


class Matches(NamedTuple):
    idx1: jnp.ndarray    # [K] index into set 1 (identity)
    idx2: jnp.ndarray    # [K] best match in set 2
    score: jnp.ndarray   # [K] cosine similarity
    valid: jnp.ndarray   # [K] bool (mutual + ratio + validity)


def match_descriptors(d1: jnp.ndarray, d2: jnp.ndarray,
                      valid1=None, valid2=None, ratio: float = 0.9,
                      min_score: float = 0.2) -> Matches:
    """Mutual-nearest descriptor matching with Lowe ratio test.

    One [K1, D] x [D, K2] matmul; all filtering is elementwise masking.
    """
    sim = d1 @ d2.T                                     # [K1, K2] on the MXU
    if valid1 is not None:
        sim = jnp.where(valid1[:, None], sim, -2.0)
    if valid2 is not None:
        sim = jnp.where(valid2[None, :], sim, -2.0)
    best2 = jnp.argmax(sim, axis=1)                     # [K1]
    s12 = jnp.max(sim, axis=1)
    # second-best for the ratio test (mask out the best column per row)
    k1 = sim.shape[0]
    masked = sim.at[jnp.arange(k1), best2].set(-2.0)
    s2nd = jnp.max(masked, axis=1)
    best1 = jnp.argmax(sim, axis=0)                     # [K2]
    mutual = best1[best2] == jnp.arange(k1)
    # cosine distance ratio: (1 - s12) < ratio * (1 - s2nd)
    ratio_ok = (1.0 - s12) < ratio * (1.0 - s2nd)
    valid = mutual & ratio_ok & (s12 > min_score)
    return Matches(idx1=jnp.arange(k1), idx2=best2, score=s12, valid=valid)


def match_images(img1: jnp.ndarray, img2: jnp.ndarray, k: int = 512,
                 **match_kw):
    """Detect + describe + match two grayscale images; returns
    (kps1, kps2, Matches)."""
    kp1 = detect_keypoints(img1, k=k)
    kp2 = detect_keypoints(img2, k=k)
    d1 = extract_descriptors(img1, kp1)
    d2 = extract_descriptors(img2, kp2)
    m = match_descriptors(d1, d2, kp1.valid, kp2.valid, **match_kw)
    return kp1, kp2, m
