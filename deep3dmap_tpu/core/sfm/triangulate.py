"""Batched multi-view triangulation and two-view geometry (pure JAX).

Completes the pose/SfM layer (SURVEY.md §7 stage 9): initialize structure
from matched 2D observations before handing off to ba.lm_solve.

TPU-first: fixed-capacity per-point view lists with masks; the DLT system is
solved as inhomogeneous 3x3 normal equations in closed form (batched adjugate
inverse) instead of per-point SVDs — thousands of points triangulate as one
fused batch of small matmuls.  Essential-matrix estimation uses an eigh of
the 9x9 scatter matrix (XLA-native on TPU), not a tall SVD.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .ba import _inv3x3
from .se3 import se3_compose, se3_inverse


def _projection_rows(K, R, t, uv):
    """Two DLT rows per view: (u·p3 - p1)·X = -(u·p3 - p1)_t etc.

    Returns A [..., 2, 3], b [..., 2] for the inhomogeneous system A X = b.
    """
    # P = K [R | t] with K = [fx, fy, cx, cy]
    fx, fy, cx, cy = K[..., 0], K[..., 1], K[..., 2], K[..., 3]
    P0 = fx[..., None] * R[..., 0, :] + cx[..., None] * R[..., 2, :]
    P1 = fy[..., None] * R[..., 1, :] + cy[..., None] * R[..., 2, :]
    P2 = R[..., 2, :]
    p0t = fx * t[..., 0] + cx * t[..., 2]
    p1t = fy * t[..., 1] + cy * t[..., 2]
    p2t = t[..., 2]
    u, v = uv[..., 0], uv[..., 1]
    A = jnp.stack([u[..., None] * P2 - P0, v[..., None] * P2 - P1], -2)
    b = jnp.stack([p0t - u * p2t, p1t - v * p2t], -1)
    return A, b


def triangulate(K, R, t, uv, mask):
    """Multi-view DLT triangulation.

    Args:
      K: [P, V, 4] intrinsics per (point, view) slot.
      R, t: [P, V, 3, 3], [P, V, 3] world→camera poses.
      uv: [P, V, 2] observations; mask: [P, V] validity (needs ≥2 views).

    Returns X [P, 3] world points (zeros where under-constrained).
    """
    A, b = _projection_rows(K, R, t, uv)           # [P, V, 2, 3], [P, V, 2]
    m = mask[..., None, None]
    AtA = jnp.sum(jnp.einsum("pvki,pvkj->pvij", A, A) * m, 1)   # [P, 3, 3]
    Atb = jnp.sum(jnp.einsum("pvki,pvk->pvi", A, b) * mask[..., None], 1)
    ok = jnp.sum(mask, -1) >= 2
    X = jnp.einsum("pij,pj->pi", _inv3x3(AtA), Atb)
    return jnp.where(ok[:, None], X, 0.0)


def triangulate_two_view(K1, R1, t1, K2, R2, t2, uv1, uv2):
    """Pairwise triangulation of matched points ([N,2] each) → X [N,3]."""
    N = uv1.shape[0]
    K = jnp.stack([jnp.broadcast_to(K1, (N, 4)), jnp.broadcast_to(K2, (N, 4))], 1)
    R = jnp.stack([jnp.broadcast_to(R1, (N, 3, 3)), jnp.broadcast_to(R2, (N, 3, 3))], 1)
    t = jnp.stack([jnp.broadcast_to(t1, (N, 3)), jnp.broadcast_to(t2, (N, 3))], 1)
    uv = jnp.stack([uv1, uv2], 1)
    return triangulate(K, R, t, uv, jnp.ones((N, 2), dtype=uv1.dtype))


def normalize_points(uv, K):
    """Pixels → normalized camera coordinates given [4] intrinsics."""
    return jnp.stack([(uv[..., 0] - K[2]) / K[0], (uv[..., 1] - K[3]) / K[1]], -1)


def essential_eight_point(x1, x2, w=None):
    """Weighted eight-point essential matrix from normalized correspondences.

    x1, x2: [N, 2] normalized coords; w: [N] weights (0 = inert slot).
    Returns E [3,3] with rank-2 constraint enforced.  Solved as the smallest
    eigenvector of the 9x9 scatter matrix A^T W A (eigh — TPU-native).
    """
    N = x1.shape[0]
    if w is None:
        w = jnp.ones(N, dtype=x1.dtype)
    one = jnp.ones(N, dtype=x1.dtype)
    u1, v1, u2, v2 = x1[:, 0], x1[:, 1], x2[:, 0], x2[:, 1]
    # x2^T E x1 = 0 rows
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], -1)
    AtA = jnp.einsum("ni,nj->ij", A * w[:, None], A)
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[:, 0].reshape(3, 3)
    # rank-2 projection with equal singular values (essential structure)
    U, S, Vt = _svd3(E)
    s = (S[0] + S[1]) * 0.5
    return U @ jnp.diag(jnp.array([s, s, 0.0], dtype=E.dtype)) @ Vt


def sampson_distance(E, x1, x2):
    """First-order epipolar (Sampson) distance for normalized coords [N,2]."""
    ones = jnp.ones(x1.shape[:-1] + (1,), x1.dtype)
    h1 = jnp.concatenate([x1, ones], -1)
    h2 = jnp.concatenate([x2, ones], -1)
    Ex1 = jnp.einsum("ij,nj->ni", E, h1)
    Etx2 = jnp.einsum("ji,nj->ni", E, h2)
    num = jnp.einsum("ni,ni->n", h2, Ex1) ** 2
    den = Ex1[:, 0] ** 2 + Ex1[:, 1] ** 2 + Etx2[:, 0] ** 2 + Etx2[:, 1] ** 2
    return num / (den + 1e-12)


def essential_ransac(x1, x2, key, w=None, n_hypotheses: int = 256,
                     thresh: float = 1e-3):
    """Robust essential-matrix estimation, fully batched — no host loop.

    TPU-native RANSAC: all ``n_hypotheses`` minimal 8-point sets are sampled
    at once, their E's solved as one batched 9x9 eigh, and every hypothesis
    scored against every correspondence in a single [H, N] Sampson-distance
    computation.  The winner's inliers then drive one weighted refit.
    Branch-free throughout; shapes are static in (H, N).

    Args:
      x1, x2: [N, 2] normalized correspondences.
      key: jax PRNG key for hypothesis sampling.
      w: [N] validity weights (0 = inert slot, excluded from sampling score).
      thresh: Sampson inlier threshold in normalized-coordinate units
        (≈ pixel_thresh / focal; 1e-3 ~ 0.5 px at f=500).

    Returns (E [3,3], inliers [N] bool).
    """
    N = x1.shape[0]
    if w is None:
        w = jnp.ones(N, dtype=x1.dtype)
    # sample WITHOUT replacement per hypothesis and only from valid (w>0)
    # slots: Gumbel-top-k over per-slot uniforms keeps every 8-point minimal
    # set distinct and non-degenerate even when most slots are w=0 padding
    # (randint with replacement wasted hypotheses on duplicate/invalid rows).
    g = jax.random.uniform(key, (n_hypotheses, N), minval=1e-9, maxval=1.0)
    logits = jnp.log(g) + jnp.where(w > 0, 0.0, -jnp.inf)
    _, idx = jax.lax.top_k(logits, 8)
    Es = jax.vmap(lambda ii: essential_eight_point(x1[ii], x2[ii], w[ii]))(idx)
    d = jax.vmap(lambda E: sampson_distance(E, x1, x2))(Es)      # [H, N]
    inl = (d < thresh) & (w > 0)
    scores = jnp.sum(inl, axis=1)
    best = jnp.argmax(scores)
    best_inl = inl[best]
    E = essential_eight_point(x1, x2, w * best_inl.astype(x1.dtype))
    inliers = (sampson_distance(E, x1, x2) < thresh) & (w > 0)
    return E, inliers


def _svd3(M):
    """3x3 SVD via eigh (TPU-friendly): M = U diag(S) V^T, S descending.

    U is rebuilt by Gram-Schmidt + cross product rather than dividing by
    singular values — for the (near-)rank-2 matrices this module feeds it,
    dividing M·v₂ by S₂ ≈ 1e-7 would amplify f32 noise into a garbage
    column and break orthonormality.
    """
    evals, V = jnp.linalg.eigh(M.T @ M)           # ascending
    evals, V = evals[::-1], V[:, ::-1]
    S = jnp.sqrt(jnp.clip(evals, 0.0))
    u0 = M @ V[:, 0]
    u0 = u0 / (jnp.linalg.norm(u0) + 1e-12)
    u1 = M @ V[:, 1]
    u1 = u1 - jnp.dot(u1, u0) * u0
    u1 = u1 / (jnp.linalg.norm(u1) + 1e-12)
    u2 = jnp.cross(u0, u1)
    return jnp.stack([u0, u1, u2], axis=1), S, V.T


def recover_pose(E, x1, x2, w=None):
    """Decompose E into the cheirality-consistent (R, t), |t| = 1.

    Returns (R, t) mapping camera-1 coordinates to camera-2: x2 ~ R x1 + t.
    Branch-free: all four (R, t) candidates are scored by the number of
    points with positive depth in both views; the argmax is selected with
    ``jnp.where`` — no host sync.
    """
    N = x1.shape[0]
    if w is None:
        w = jnp.ones(N, dtype=x1.dtype)
    U, _, Vt = _svd3(E)
    # proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], E.dtype)
    Ra, Rb = U @ W @ Vt, U @ W.T @ Vt
    tu = U[:, 2]
    cands = [(Ra, tu), (Ra, -tu), (Rb, tu), (Rb, -tu)]
    Kn = jnp.array([1.0, 1.0, 0.0, 0.0], E.dtype)  # normalized intrinsics
    I3 = jnp.eye(3, dtype=E.dtype)
    z3 = jnp.zeros(3, dtype=E.dtype)

    def score(R, t):
        X = triangulate_two_view(Kn, I3, z3, Kn, R, t, x1, x2)
        z1 = X[:, 2]
        z2 = (jnp.einsum("ij,nj->ni", R, X) + t)[:, 2]
        return jnp.sum(w * (z1 > 0) * (z2 > 0))

    scores = jnp.stack([score(R, t) for R, t in cands])
    best = jnp.argmax(scores)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best]


def relative_pose(R1, t1, R2, t2):
    """Relative transform cam1→cam2 from two world→camera poses."""
    Ri, ti = se3_inverse(R1, t1)
    return se3_compose(R2, t2, Ri, ti)
