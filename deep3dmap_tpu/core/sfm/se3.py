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
    """(A, B, C) = (sin t/t, (1-cos t)/t^2, (t-sin t)/t^3), Taylor-safe.

    No additive eps on theta: the sqrt argument is replaced by 1.0 inside
    the Taylor-guarded region instead (an eps would bias theta for
    small-but-nonzero angles, and the bias gets amplified through se3_log's
    V-inverse coefficient cancellation).  The Taylor branch carries the t^4
    term so it stays accurate over the whole guarded region theta2 < 1e-6.
    """
    small = theta2 < 1e-6
    safe2 = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(safe2)
    A = jnp.where(small, 1.0 - theta2 / 6.0 + theta2 * theta2 / 120.0,
                  jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0 + theta2 * theta2 / 720.0,
                  (1.0 - jnp.cos(theta)) / safe2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0 + theta2 * theta2 / 5040.0,
                  (theta - jnp.sin(theta)) / (safe2 * theta))
    return A, B, C


def so3_exp(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (...,3) axis-angle -> (...,3,3) rotation."""
    theta2 = jnp.sum(w * w, -1)
    A, B, _ = _sinc_coeffs(theta2)
    W = hat(w)
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * (W @ W)


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(...,3,3) rotation -> (...,3) axis-angle (|w| <= pi).

    Three branches, blended with ``jnp.where`` (jit/vmap/grad-safe):
      * theta ~ 0: Taylor of theta/(2 sin theta);
      * generic: theta/(2 sin theta) * vee(R - R^T);
      * theta ~ pi: vee(R - R^T) = 2 sin(theta) axis vanishes, so recover
        the axis from the dominant column of R + I (near pi,
        (R + I)/2 -> axis axis^T), sign-aligned with vee(R - R^T) so the
        result is continuous as theta crosses into the near-pi region.
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    v = vee(R - jnp.swapaxes(R, -1, -2))          # = 2 sin(theta) * axis
    small = cos_t > 1.0 - 1e-4                    # theta < ~1.4e-2
    near_pi = cos_t < -1.0 + 1e-5                 # theta > pi - ~4.5e-3
    # gradient safety: arccos/sqrt have infinite slope at |cos|=1, and
    # jnp.where evaluates BOTH branches under autodiff — feed the exact
    # branch a guarded argument (double-where) so no inf leaks into the
    # Taylor region's cotangents (pose-graph edges are near-identity and
    # differentiate exactly there).
    c_gen = jnp.where(small | near_pi, 0.0, cos_t)
    theta_gen = jnp.arccos(c_gen)
    sin_gen = jnp.sqrt(1.0 - c_gen * c_gen)
    # scale = theta/(2 sin theta) as a series in e = 1 - cos(theta)
    e = 1.0 - cos_t
    scale = jnp.where(small, 0.5 + e / 6.0 + e * e / 15.0,
                      theta_gen / (2.0 * sin_gen))
    w_generic = scale[..., None] * v

    # near-pi: R + I = 2 axis axis^T + (1 + cos t)(I - axis axis^T) + sin t hat(axis);
    # the column with the largest diagonal entry is dominated by 2 axis_k axis
    S = R + jnp.broadcast_to(jnp.eye(3, dtype=R.dtype), R.shape)
    diag = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], -1)
    k = jnp.argmax(diag, axis=-1)
    col = jnp.take_along_axis(S, k[..., None, None], axis=-1)[..., 0]
    norm = jnp.sqrt(jnp.sum(col * col, -1, keepdims=True))
    axis = col / jnp.where(norm < 1e-12, 1.0, norm)
    # align sign with v (sin(theta) >= 0 on [0, pi]); at exactly pi both
    # signs are valid logs, keep whichever the dot product picks
    sign = jnp.where(jnp.sum(axis * v, -1, keepdims=True) < 0.0, -1.0, 1.0)
    # theta for this branch only: clip keeps arccos' slope finite (caps
    # theta at pi - ~4.5e-4, a negligible bias inside the near-pi window)
    theta_pi = jnp.arccos(jnp.clip(cos_t, -1.0 + 1e-7, -0.5))
    w_pi = theta_pi[..., None] * axis * sign
    return jnp.where(near_pi[..., None], w_pi, w_generic)


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
    # V^{-1} = I - W/2 + (1/theta^2)(1 - A/(2B)) W^2.  The exact expression
    # is a catastrophic cancellation near theta=0, so it gets its own Taylor
    # branch (1/12 + t^2/720 + t^4/30240) with eps-free safe denominators —
    # pose-graph edge residuals live exactly in this near-identity regime.
    small = theta2 < 1e-6
    safe2 = jnp.where(small, 1.0, theta2)
    coef = jnp.where(small,
                     1.0 / 12.0 + theta2 / 720.0 + theta2 * theta2 / 30240.0,
                     (1.0 - A / (2.0 * B)) / safe2)
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
