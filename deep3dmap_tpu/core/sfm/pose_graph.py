"""Pose-graph optimization (fragment/keyframe trajectory) on device.

Stitches fragment-scale BA solutions (core/sfm/ba.py) into a consistent
trajectory: nodes are SE(3) poses T_i (node→world), edges are relative
measurements Z_ij ≈ T_i^{-1} T_j with scalar information weights.

TPU-first: fixed edge capacity with weights (w=0 slots inert), per-edge
Jacobians by forward-mode autodiff of the retraction (vmapped 6x6 blocks —
tiny closed-loop graphs don't merit hand-derived adjoints), Gauss-Newton
normal equations assembled by segment_sum into a dense [6N, 6N] system and
solved replicated.  Fragment counts are O(10²), so the dense solve is far
cheaper than any sparsity bookkeeping under XLA.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .se3 import se3_compose, se3_exp, se3_inverse, se3_log, se3_retract


class PoseGraph(NamedTuple):
    """Edges i->j with measured relative pose (Rz, tz) = Z_ij ≈ T_i^{-1} T_j.

    Attributes:
      i, j: [E] int32 node indices.
      Rz: [E, 3, 3]; tz: [E, 3] measured relative transforms.
      w: [E] edge weights (0 disables).
    """
    i: jnp.ndarray
    j: jnp.ndarray
    Rz: jnp.ndarray
    tz: jnp.ndarray
    w: jnp.ndarray


def edge_residual(Ri, ti, Rj, tj, Rz, tz):
    """r = log(Z^{-1} · T_i^{-1} · T_j) ∈ R^6."""
    Rzi, tzi = se3_inverse(Rz, tz)
    Rii, tii = se3_inverse(Ri, ti)
    Rr, tr = se3_compose(Rii, tii, Rj, tj)
    Rr, tr = se3_compose(Rzi, tzi, Rr, tr)
    return se3_log(Rr, tr)


def graph_cost(R, t, g: PoseGraph):
    r = jax.vmap(edge_residual)(R[g.i], t[g.i], R[g.j], t[g.j], g.Rz, g.tz)
    return 0.5 * jnp.sum(g.w[:, None] * r * r)


def _edge_linearize(Ri, ti, Rj, tj, Rz, tz):
    """Residual and Jacobians wrt left-multiplicative increments on i and j."""
    def f(xi):
        xii, xij = xi[:6], xi[6:]
        Ri_, ti_ = se3_retract(Ri, ti, xii)
        Rj_, tj_ = se3_retract(Rj, tj, xij)
        return edge_residual(Ri_, ti_, Rj_, tj_, Rz, tz)

    J = jax.jacfwd(f)(jnp.zeros(12, dtype=ti.dtype))   # [6, 12]
    r = edge_residual(Ri, ti, Rj, tj, Rz, tz)
    return r, J[:, :6], J[:, 6:]


def optimize(R0, t0, g: PoseGraph, iters: int = 15, lam0: float = 1e-4,
             anchor: int = 0):
    """Gauss-Newton/LM pose-graph optimization; anchors node ``anchor``.

    Returns (R [N,3,3], t [N,3], cost, initial_cost).
    """
    N = t0.shape[0]

    def build(R, t):
        r, Ji, Jj = jax.vmap(_edge_linearize)(
            R[g.i], t[g.i], R[g.j], t[g.j], g.Rz, g.tz)
        w = g.w[:, None, None]
        # block scatter: flatten (node, node) into N*N segments
        Hii = jnp.einsum("eki,ekj->eij", Ji, Ji) * w
        Hjj = jnp.einsum("eki,ekj->eij", Jj, Jj) * w
        Hij = jnp.einsum("eki,ekj->eij", Ji, Jj) * w
        idx_ii = g.i * N + g.i
        idx_jj = g.j * N + g.j
        idx_ij = g.i * N + g.j
        idx_ji = g.j * N + g.i
        flat = jax.ops.segment_sum(
            jnp.concatenate([Hii, Hjj, Hij, jnp.swapaxes(Hij, -1, -2)], 0),
            jnp.concatenate([idx_ii, idx_jj, idx_ij, idx_ji], 0), N * N)
        H = flat.reshape(N, N, 6, 6).transpose(0, 2, 1, 3)
        rw = r * g.w[:, None]
        b = -(jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Ji, rw), g.i, N)
              + jax.ops.segment_sum(jnp.einsum("eki,ek->ei", Jj, rw), g.j, N))
        return H, b

    anchor_mask = (jnp.arange(N) == anchor)

    def body(state):
        R, t, lam, cost, it = state
        H, b = build(R, t)
        d = jnp.diagonal(H.reshape(N * 6, N * 6))
        damp = lam * jnp.mean(d) + 1e-8
        Hd = H.reshape(N * 6, N * 6) + damp * jnp.eye(N * 6, dtype=t.dtype)
        # gauge fix: huge damping on the anchor block
        amask = jnp.repeat(anchor_mask, 6)
        Hd = Hd + jnp.diag(jnp.where(amask, 1e12, 0.0).astype(t.dtype))
        dx = jnp.linalg.solve(Hd, b.reshape(N * 6)).reshape(N, 6)
        dx = jnp.where(anchor_mask[:, None], 0.0, dx)
        R_n, t_n = se3_retract(R, t, dx)
        new_cost = graph_cost(R_n, t_n, g)
        accept = new_cost < cost
        R = jnp.where(accept, R_n, R)
        t = jnp.where(accept, t_n, t)
        cost = jnp.where(accept, new_cost, cost)
        lam = jnp.where(accept, jnp.maximum(lam * 0.33, 1e-10),
                        jnp.minimum(lam * 4.0, 1e6))
        return R, t, lam, cost, it + 1

    c0 = graph_cost(R0, t0, g)
    R, t, lam, cost, _ = jax.lax.while_loop(
        lambda s: s[4] < iters, body,
        (R0, t0, jnp.asarray(lam0, t0.dtype), c0, jnp.asarray(0)))
    return R, t, cost, c0


def odometry_graph(R_rel, t_rel, w=None):
    """Chain graph from N-1 consecutive relative poses (helper for tests/demos)."""
    E = t_rel.shape[0]
    i = jnp.arange(E)
    if w is None:
        w = jnp.ones(E, dtype=t_rel.dtype)
    return PoseGraph(i=i, j=i + 1, Rz=R_rel, tz=t_rel, w=w)


def compose_chain(R_rel, t_rel):
    """Integrate relative poses into absolute trajectory (T_0 = identity)."""
    def step(carry, rel):
        R, t = carry
        Rn, tn = se3_compose(R, t, rel[0], rel[1])
        return (Rn, tn), (Rn, tn)

    I = jnp.eye(3, dtype=t_rel.dtype)
    z = jnp.zeros(3, dtype=t_rel.dtype)
    (_, _), (Rs, ts) = jax.lax.scan(step, (I, z), (R_rel, t_rel))
    Rs = jnp.concatenate([I[None], Rs], 0)
    ts = jnp.concatenate([z[None], ts], 0)
    return Rs, ts
