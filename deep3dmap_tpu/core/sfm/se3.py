"""SE(3)/SO(3) Lie-group utilities (pure JAX, batch-broadcastable).

The reference framework assumes poses are given (ScanNet GT; see SURVEY.md
§7 stage 9 — the pose/BA layer is the north-star extension beyond
/root/reference's surface).  These maps are the foundation: exp/log between
twist coordinates and matrices, and the right-multiplicative retraction used
by the bundle-adjustment and pose-graph solvers.

TPU notes: everything is closed-form (Rodrigues), branch-free via
``jnp.where`` with Taylor fallbacks near theta=0 — safe under jit/vmap/grad,
no data-dependent control flow.
"""
from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator: (...,3) -> (...,3,3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack([
        jnp.stack([z, -wz, wy], -1),
        jnp.stack([wz, z, -wx], -1),
        jnp.stack([-wy, wx, z], -1),
    ], -2)


def vee(W: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (...,3,3) -> (...,3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def _sinc_coeffs(theta2: jnp.ndarray):
    """(A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3), Taylor-safe."""
    theta = jnp.sqrt(theta2 + _EPS)
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation."""
    theta2 = jnp.sum(w * w, -1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) rotation -> (...,3) axis-angle (|w| <= pi)."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos_t)
    # w = theta/(2 sin theta) * vee(R - R^T); Taylor near 0
    sin_t = jnp.sin(theta)
    scale = jnp.where(theta < 1e-4, 0.5 + theta * theta / 12.0,
                      theta / (2.0 * sin_t + _EPS))
    return scale[..., None] * vee(R - jnp.swapaxes(R, -1, -2))


def se3_exp(xi: jnp.ndarray):
    """Twist (...,6) [rho, w] -> (R (...,3,3), t (...,3))."""
    rho, w = xi[..., :3], xi[..., 3:]
    theta2 = jnp.sum(w * w, -1)
    A, B, C = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), W.shape)
    R = I + A[..., None, None] * W + B[..., None, None] * W2
    V = I + B[..., None, None] * W + C[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, rho)
    return R, t


def se3_log(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """(R, t) -> twist (...,6) [rho, w]."""
    w = so3_log(R)
    theta2 = jnp.sum(w * w, -1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), W.shape)
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2   (Taylor-safe)
    coef = jnp.where(theta2 < 1e-8, 1.0 / 12.0 + theta2 / 720.0,
                     (1.0 - A / (2.0 * B + _EPS)) / (theta2 + _EPS))
    Vinv = I - 0.5 * W + coef[..., None, None] * W2
    rho = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([rho, w], -1)


def se3_compose(Ra, ta, Rb, tb):
    """(Ra,ta) * (Rb,tb): first apply b, then a."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_retract(R0, t0, xi):
    """Left-multiplicative retraction: exp(xi) * (R0, t0).

    World-frame increment — matches the Jacobians in ba.py / pose_graph.py.
    """
    dR, dt = se3_exp(xi)
    return se3_compose(dR, dt, R0, t0)


def transform_points(R, t, X):
    """Apply (...,3,3),(...,3) to points (...,N,3)."""
    return jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
