"""TPU-native bundle adjustment: Levenberg-Marquardt with Schur complement.

North-star extension beyond the reference (SURVEY.md §7 stage 9): the
reference assumes poses are given (ScanNet GT trajectories feed
SeqIntrinsicsPose — /root/reference/deep3dmap/datasets/pipelines/
seq_transforms.py); this module closes the loop with on-device pose/structure
refinement that integrates with fragment poses.

TPU-first design (not a translation of CPU sparse-BA libraries):

- **Static shapes.**  The observation list is a fixed-capacity array with a
  weight/validity mask — no CSR/COO dynamic sparsity.  Invalid slots carry
  zero weight and contribute nothing to the normal equations.
- **Batched analytic Jacobians** (vmapped closed forms), accumulated into
  camera/point blocks with ``segment_sum`` — XLA lowers these to efficient
  scatter-adds.
- **Schur complement as dense einsums.**  The camera-camera reduced system
  ``S = B - W C^{-1} W^T`` is formed from a dense per-(point, camera) block
  tensor ``U`` via einsum — three big contractions that run on the MXU,
  instead of pointer-chasing a sparse factorization.  Point blocks C_p are
  3x3 and inverted in closed form, batched.
- **Fixed-iteration LM** in ``lax.while_loop`` with branch-free
  accept/reject damping — compiles once, no host round-trips per iteration.
- **Multi-chip**: observations shard over a mesh axis; each device reduces
  its shard's normal-equation blocks and a single ``psum`` assembles the
  global system (Schur reduction over XLA collectives), solved replicated.

Capacity guidance: the dense U tensor is [P, C, 6, 3] floats — at the
fragment scale this solver targets (P ≤ ~16k points, C ≤ ~64 cameras) that
is ≤ 75 MB, far below HBM.  For city-scale BA, partition into fragment
problems and stitch with :mod:`pose_graph`.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .se3 import se3_retract

_DAMP_FIXED = 1e12


class BAProblem(NamedTuple):
    """Fixed-capacity bundle-adjustment problem.

    Attributes:
      K: [C, 4] per-camera intrinsics (fx, fy, cx, cy) — held fixed.
      cam_idx: [M] int32 camera index per observation.
      pt_idx: [M] int32 point index per observation.
      uv: [M, 2] observed pixel coordinates.
      w: [M] observation weights; 0 disables a slot (validity mask).
      cam_fixed: [C] bool — gauge-fixed cameras (pose not updated).
    """
    K: jnp.ndarray
    cam_idx: jnp.ndarray
    pt_idx: jnp.ndarray
    uv: jnp.ndarray
    w: jnp.ndarray
    cam_fixed: jnp.ndarray


def project(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray, X: jnp.ndarray):
    """Pinhole projection of world points.  Returns (uv [...,2], z [...])."""
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    z = Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, jnp.sign(z) * 1e-6 + 1e-12, z)
    u = K[..., 0] * Xc[..., 0] / zs + K[..., 2]
    v = K[..., 1] * Xc[..., 1] / zs + K[..., 3]
    return jnp.stack([u, v], -1), z


def reprojection_residuals(R, t, X, prob: BAProblem):
    """Weighted residuals r = w * (proj - uv_obs), shape [M, 2]."""
    Rm, tm = R[prob.cam_idx], t[prob.cam_idx]
    Km, Xm = prob.K[prob.cam_idx], X[prob.pt_idx]
    uv, _ = project(Km, Rm, tm, Xm)
    return (uv - prob.uv) * prob.w[:, None]


def _obs_jacobians(R, t, K, X):
    """Closed-form per-observation Jacobians.

    Left-multiplicative pose update exp(xi) ∘ (R,t) in the camera frame:
    Xc' ≈ (I + hat(w)) Xc + rho, so dXc/drho = I and dXc/dw = -hat(Xc);
    dXc/dX = R.  Composed with the pinhole Jacobian
    dpi/dXc = [[fx/z, 0, -fx·x/z²], [0, fy/z, -fy·y/z²]].

    Returns (r-free) Jc [..., 2, 6], Jp [..., 2, 3], uv [..., 2].
    """
    Xc = jnp.einsum("...ij,...j->...i", R, X) + t
    x, y, z = Xc[..., 0], Xc[..., 1], Xc[..., 2]
    zs = jnp.where(jnp.abs(z) < 1e-6, jnp.sign(z) * 1e-6 + 1e-12, z)
    iz = 1.0 / zs
    fx, fy = K[..., 0], K[..., 1]
    u = fx * x * iz + K[..., 2]
    v = fy * y * iz + K[..., 3]
    zero = jnp.zeros_like(iz)
    # dpi/dXc: [..., 2, 3]
    dpi = jnp.stack([
        jnp.stack([fx * iz, zero, -fx * x * iz * iz], -1),
        jnp.stack([zero, fy * iz, -fy * y * iz * iz], -1),
    ], -2)
    # dXc/dw = -hat(Xc): [..., 3, 3]
    dXc_dw = jnp.stack([
        jnp.stack([zero, z, -y], -1),
        jnp.stack([-z, zero, x], -1),
        jnp.stack([y, -x, zero], -1),
    ], -2)
    Jw = dpi @ dXc_dw                     # [..., 2, 3]
    Jc = jnp.concatenate([dpi, Jw], -1)   # [..., 2, 6]  (rho, w)
    Jp = dpi @ R                          # [..., 2, 3]
    return Jc, Jp, jnp.stack([u, v], -1)


def _inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse (adjugate) — no LAPACK on device."""
    a = A
    c00 = a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1]
    c01 = a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2]
    c02 = a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0]
    c10 = a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2]
    c11 = a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0]
    c12 = a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1]
    c20 = a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1]
    c21 = a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2]
    c22 = a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0]
    det = a[..., 0, 0] * c00 + a[..., 0, 1] * c01 + a[..., 0, 2] * c02
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], -1),
        jnp.stack([c01, c11, c21], -1),
        jnp.stack([c02, c12, c22], -1),
    ], -2)
    return adj / (det[..., None, None] + jnp.where(det[..., None, None] >= 0, 1e-12, -1e-12))


def _normal_blocks(R, t, X, prob: BAProblem, huber: Optional[float]):
    """Per-shard normal-equation blocks from the observation list.

    Returns (B [C,6,6], Cp [P,3,3], U [P,C,6,3], gc [C,6], gp [P,3], cost).
    This is the part that shards over observations — everything it returns
    is a pure sum over obs, so a psum over the mesh axis yields the global
    system (see :func:`lm_solve_sharded`).
    """
    C, P = prob.K.shape[0], X.shape[0]
    Rm, tm = R[prob.cam_idx], t[prob.cam_idx]
    Km, Xm = prob.K[prob.cam_idx], X[prob.pt_idx]
    Jc, Jp, uv = _obs_jacobians(Rm, tm, Km, Xm)
    r = uv - prob.uv                                     # [M, 2]
    w = prob.w
    if huber is not None:
        # IRLS Huber: downweight large residuals; sqrt-weight hits r and J
        rn = jnp.linalg.norm(r, axis=-1)
        w = w * jnp.sqrt(jnp.where(rn <= huber, 1.0, huber / (rn + 1e-12)))
    r = r * w[:, None]
    Jc = Jc * w[:, None, None]
    Jp = Jp * w[:, None, None]
    cost = 0.5 * jnp.sum(r * r)

    JcT_Jc = jnp.einsum("mki,mkj->mij", Jc, Jc)          # [M, 6, 6]
    JpT_Jp = jnp.einsum("mki,mkj->mij", Jp, Jp)          # [M, 3, 3]
    W = jnp.einsum("mki,mkj->mij", Jc, Jp)               # [M, 6, 3]
    gcm = -jnp.einsum("mki,mk->mi", Jc, r)               # [M, 6]
    gpm = -jnp.einsum("mki,mk->mi", Jp, r)               # [M, 3]

    B = jax.ops.segment_sum(JcT_Jc, prob.cam_idx, C)
    Cp = jax.ops.segment_sum(JpT_Jp, prob.pt_idx, P)
    gc = jax.ops.segment_sum(gcm, prob.cam_idx, C)
    gp = jax.ops.segment_sum(gpm, prob.pt_idx, P)
    # dense (point, camera) coupling blocks — one scatter, then pure einsums
    U = jax.ops.segment_sum(W, prob.pt_idx * C + prob.cam_idx, P * C)
    U = U.reshape(P, C, 6, 3)
    return B, Cp, U, gc, gp, cost


def _schur_solve(B, Cp, U, gc, gp, lam, cam_fixed):
    """Solve the damped normal equations by Schur complement onto cameras."""
    C, P = B.shape[0], Cp.shape[0]
    eye6 = jnp.eye(6, dtype=B.dtype)
    eye3 = jnp.eye(3, dtype=B.dtype)
    # Marquardt damping: lam * diag, plus an absolute floor for rank safety
    B_d = B + (lam * _bdiag(B) + 1e-8) * eye6
    B_d = B_d + jnp.where(cam_fixed[:, None, None], _DAMP_FIXED, 0.0) * eye6
    Cp_d = Cp + (lam * _bdiag(Cp) + 1e-8) * eye3
    Cinv = _inv3x3(Cp_d)                                  # [P, 3, 3]

    # S = B_d - sum_p U_p Cinv_p U_p^T   (camera-pair blocks), MXU einsums
    Y = jnp.einsum("pcij,pjk->pcik", U, Cinv)             # [P, C, 6, 3]
    S = -jnp.einsum("pcik,pdlk->cidl", Y, U)              # [C, 6, C, 6]
    S = S.at[jnp.arange(C), :, jnp.arange(C), :].add(B_d)
    rhs = gc - jnp.einsum("pcik,pk->ci", Y, gp)           # [C, 6]

    dxi = jnp.linalg.solve(S.reshape(C * 6, C * 6), rhs.reshape(C * 6))
    dxi = dxi.reshape(C, 6)
    dxi = jnp.where(cam_fixed[:, None], 0.0, dxi)
    # back-substitute points: dX = Cinv (gp - U^T dxi)
    dX = jnp.einsum("pij,pj->pi", Cinv, gp - jnp.einsum("pcij,ci->pj", U, dxi))
    return dxi, dX


def _bdiag(A):
    """Mean of a block-diagonal, used for relative (Marquardt) damping."""
    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    return jnp.mean(d, axis=-1, keepdims=True)[..., None]


def robust_cost(r: jnp.ndarray, huber: Optional[float]) -> jnp.ndarray:
    """True objective value for (optionally Huber-robustified) residuals.

    ``r`` is the [M, 2] w-weighted residual array.  With ``huber`` set this
    is the genuine Huber loss over residual norms — NOT the IRLS-reweighted
    squared cost.  LM accept/reject must compare this objective; comparing
    the raw squared cost while the step minimizes the Huber-IRLS objective
    rejects every step once gross outliers dominate the quadratic term.
    """
    if huber is None:
        return 0.5 * jnp.sum(r * r)
    rn = jnp.linalg.norm(r, axis=-1)
    return jnp.sum(jnp.where(rn <= huber, 0.5 * rn * rn,
                             huber * (rn - 0.5 * huber)))


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    cost: jnp.ndarray
    initial_cost: jnp.ndarray
    iterations: jnp.ndarray
    lam: jnp.ndarray


def lm_solve(R0, t0, X0, prob: BAProblem, iters: int = 20, lam0: float = 1e-3,
             huber: Optional[float] = None, blocks_fn=_normal_blocks,
             cost_fn=None) -> BAResult:
    """Levenberg-Marquardt bundle adjustment, fully on device.

    One compiled ``while_loop``; each iteration rebuilds the system at the
    current accepted state, solves the damped step, and accepts/rejects
    branch-free (rejected steps raise damping and retry next iteration —
    constant work per iteration keeps the loop XLA-friendly).

    ``blocks_fn``/``cost_fn`` are pluggable so the sharded variant can psum
    partial reductions — under shard_map BOTH must reduce globally or the
    per-device accept decisions would diverge.
    """
    def cost_at(R, t, X):
        if cost_fn is not None:
            return cost_fn(R, t, X)
        r = reprojection_residuals(R, t, X, prob)
        return robust_cost(r, huber)

    def body(state):
        R, t, X, lam, cost, it = state
        B, Cp, U, gc, gp, _ = blocks_fn(R, t, X, prob, huber)
        dxi, dX = _schur_solve(B, Cp, U, gc, gp, lam, prob.cam_fixed)
        R_n, t_n = se3_retract(R, t, dxi)
        X_n = X + dX
        new_cost = cost_at(R_n, t_n, X_n)
        accept = new_cost < cost
        R = jnp.where(accept, R_n, R)
        t = jnp.where(accept, t_n, t)
        X = jnp.where(accept, X_n, X)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-9),
                        jnp.minimum(lam * 4.0, 1e6))
        return R, t, X, lam, cost, it + 1

    def cond(state):
        return state[5] < iters

    c0 = cost_at(R0, t0, X0)
    lam = jnp.asarray(lam0, dtype=X0.dtype)
    R, t, X, lam, cost, it = jax.lax.while_loop(
        cond, body, (R0, t0, X0, lam, c0, jnp.asarray(0)))
    return BAResult(R, t, X, cost, c0, it, lam)


def lm_solve_sharded(mesh, R0, t0, X0, prob: BAProblem, axis: str = "data",
                     iters: int = 20, lam0: float = 1e-3,
                     huber: Optional[float] = None) -> BAResult:
    """Multi-chip LM: observations shard over ``axis``; Schur reduction via psum.

    Each device accumulates normal-equation blocks over its observation
    shard; one ``psum`` per iteration assembles the global (B, Cp, U, gc, gp)
    and the replicated solve proceeds identically on every device.  The
    observation arrays of ``prob`` must be shardable by ``axis`` (pad M to a
    multiple of the axis size with w=0 slots).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    obs_spec = P(axis)
    in_specs = (P(), P(), P(),
                BAProblem(K=P(), cam_idx=obs_spec, pt_idx=obs_spec,
                          uv=obs_spec, w=obs_spec, cam_fixed=P()))

    def psum_blocks(R, t, X, prob_shard, huber_):
        parts = _normal_blocks(R, t, X, prob_shard, huber_)
        return jax.lax.psum(parts, axis)

    def run(R0_, t0_, X0_, prob_shard):
        def psum_cost(R, t, X):
            r = reprojection_residuals(R, t, X, prob_shard)
            return jax.lax.psum(robust_cost(r, huber), axis)

        return lm_solve(R0_, t0_, X0_, prob_shard, iters=iters, lam0=lam0,
                        huber=huber, blocks_fn=psum_blocks, cost_fn=psum_cost)

    fn = shard_map(run, mesh=mesh, in_specs=in_specs,
                   out_specs=BAResult(P(), P(), P(), P(), P(), P(), P()))
    return jax.jit(fn)(R0, t0, X0, prob)
