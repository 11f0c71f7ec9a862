"""Voxelization, dynamic scatter, and points-in-boxes.

Parity targets: /root/reference/deep3dmap/core/ops/csrc/pytorch/
{voxelization.cpp, scatter_points.cpp, points_in_boxes.cpp}.  The CUDA
kernels build hash tables of occupied voxels; the TPU formulation keeps
static shapes: voxel coordinates are linearized, deduplicated with one sort
(XLA's sort is the TPU hash-table substitute), and features are
segment-reduced.  ``voxelize`` returns fixed-capacity (max_voxels,
max_points) buffers + counts, exactly the contract of the reference's hard
voxelization; ``dynamic_scatter`` mean/max-reduces features per voxel.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _coords_of(points, voxel_size, coors_range):
    vs = jnp.asarray(voxel_size, jnp.float32)
    lo = jnp.asarray(coors_range[:3], jnp.float32)
    hi = jnp.asarray(coors_range[3:], jnp.float32)
    grid = jnp.round((hi - lo) / vs).astype(jnp.int32)
    c = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    inside = jnp.all((c >= 0) & (c < grid), axis=1)
    return c, inside, grid


@partial(jax.jit, static_argnames=("max_points", "max_voxels"))
def voxelize(points, voxel_size, coors_range, max_points: int = 35,
             max_voxels: int = 20000):
    """Hard voxelization (voxelization.cpp hard path).

    points (N, C) with xyz first -> (voxels (max_voxels, max_points, C),
    coors (max_voxels, 3) zyx order like the reference, num_points_per_voxel
    (max_voxels,), num_voxels scalar).  Deterministic: points keep input
    order within a voxel; voxels appear in first-occurrence order.
    """
    N = points.shape[0]
    c, inside, grid = _coords_of(points, voxel_size, coors_range)
    lin = (c[:, 2] * grid[1] + c[:, 1]) * grid[0] + c[:, 0]  # z-major
    lin = jnp.where(inside, lin, jnp.iinfo(jnp.int32).max)

    # stable sort by voxel id, remembering original order
    order = jnp.argsort(lin, stable=True)
    lin_s = lin[order]
    new_seg = jnp.concatenate(
        [jnp.ones((1,), bool), lin_s[1:] != lin_s[:-1]])
    # voxel slot of each sorted point, in first-occurrence-of-sorted order
    seg_id = jnp.cumsum(new_seg) - 1  # 0-based segment index
    # rank of point within its voxel
    idx = jnp.arange(N)
    seg_start = jnp.where(new_seg, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, seg_start)
    rank = idx - seg_start

    valid_pt = (lin_s != jnp.iinfo(jnp.int32).max) & (rank < max_points) \
        & (seg_id < max_voxels)
    voxels = jnp.zeros((max_voxels, max_points, points.shape[1]),
                       points.dtype)
    tgt_v = jnp.where(valid_pt, seg_id, max_voxels)
    tgt_p = jnp.where(valid_pt, rank, 0)
    voxels = voxels.at[tgt_v, tgt_p].set(points[order], mode="drop")

    npts = jnp.zeros((max_voxels,), jnp.int32).at[tgt_v].add(
        valid_pt.astype(jnp.int32), mode="drop")

    valid_seg = new_seg & (lin_s != jnp.iinfo(jnp.int32).max) \
        & (seg_id < max_voxels)
    coors = jnp.full((max_voxels, 3), -1, jnp.int32)
    c_sorted = c[order]
    zyx = jnp.stack([c_sorted[:, 2], c_sorted[:, 1], c_sorted[:, 0]], 1)
    coors = coors.at[jnp.where(valid_seg, seg_id, max_voxels)].set(
        jnp.where(valid_seg[:, None], zyx, -1), mode="drop")
    num_voxels = jnp.sum(valid_seg.astype(jnp.int32))
    return voxels, coors, npts, num_voxels


@partial(jax.jit, static_argnames=("reduce_op", "max_voxels"))
def dynamic_scatter(feats, coors, reduce_op: str = "mean",
                    max_voxels: int = 20000):
    """Dynamic voxelization reduce (scatter_points.cpp): feats (N, C), integer
    coors (N, 3) (negative = invalid) -> (reduced (max_voxels, C),
    out_coors (max_voxels, 3), counts)."""
    assert reduce_op in ("mean", "max", "sum")
    N = feats.shape[0]
    valid = jnp.all(coors >= 0, axis=1)
    # linearize with a generous stride (coords are int32 grid indices)
    stride = jnp.max(jnp.abs(coors)) + 2
    lin = ((coors[:, 0] * stride + coors[:, 1]) * stride + coors[:, 2])
    lin = jnp.where(valid, lin, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(lin, stable=True)
    lin_s = lin[order]
    new_seg = jnp.concatenate([jnp.ones((1,), bool), lin_s[1:] != lin_s[:-1]])
    seg_id = jnp.cumsum(new_seg) - 1
    ok = (lin_s != jnp.iinfo(jnp.int32).max) & (seg_id < max_voxels)
    tgt = jnp.where(ok, seg_id, max_voxels)

    counts = jnp.zeros((max_voxels,), jnp.int32).at[tgt].add(
        ok.astype(jnp.int32), mode="drop")
    f_sorted = feats[order]
    if reduce_op == "max":
        out = jnp.full((max_voxels, feats.shape[1]), -jnp.inf, feats.dtype)
        out = out.at[tgt].max(jnp.where(ok[:, None], f_sorted, -jnp.inf),
                              mode="drop")
        out = jnp.where(counts[:, None] > 0, out, 0.0)
    else:
        out = jnp.zeros((max_voxels, feats.shape[1]), feats.dtype)
        out = out.at[tgt].add(jnp.where(ok[:, None], f_sorted, 0.0),
                              mode="drop")
        if reduce_op == "mean":
            out = out / jnp.maximum(counts[:, None], 1)
    out_coors = jnp.full((max_voxels, 3), -1, jnp.int32)
    out_coors = out_coors.at[jnp.where(new_seg & ok, seg_id, max_voxels)].set(
        jnp.where((new_seg & ok)[:, None], coors[order], -1), mode="drop")
    return out, out_coors, counts


@jax.jit
def points_in_boxes(points, boxes):
    """points (B, N, 3), boxes (B, T, 7) [cx, cy, cz, dx, dy, dz, yaw]
    (bottom-center convention, parity points_in_boxes.cpp) ->
    box index per point (B, N), -1 when in no box (first match wins)."""
    def one(pts, bxs):
        rel = pts[:, None, :] - bxs[None, :, :3]  # (N, T, 3)
        yaw = bxs[:, 6]
        cos, sin = jnp.cos(-yaw), jnp.sin(-yaw)
        lx = rel[..., 0] * cos - rel[..., 1] * sin
        ly = rel[..., 0] * sin + rel[..., 1] * cos
        lz = rel[..., 2]
        inx = jnp.abs(lx) <= bxs[None, :, 3] / 2
        iny = jnp.abs(ly) <= bxs[None, :, 4] / 2
        inz = (lz >= 0) & (lz <= bxs[None, :, 5])
        inside = inx & iny & inz  # (N, T)
        first = jnp.argmax(inside, axis=1)
        return jnp.where(jnp.any(inside, axis=1), first, -1)

    return jax.vmap(one)(points, boxes)


def voxelize_host(points: np.ndarray, voxel_size, coors_range,
                  max_points: int = 35, max_voxels: int = 20000):
    """Host-side convenience returning trimmed (dynamic-size) arrays, the
    shape the reference's Python callers see."""
    voxels, coors, npts, nv = voxelize(
        jnp.asarray(points), voxel_size, coors_range, max_points, max_voxels)
    nv = int(nv)
    return (np.asarray(voxels[:nv]), np.asarray(coors[:nv]),
            np.asarray(npts[:nv]))
