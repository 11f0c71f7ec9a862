"""Dense/sparse multi-view back-projection: the NeuralRecon hot op, TPU-native.

Re-design of /root/reference/deep3dmap/core/voxel/back_project.py:5-84.  The
reference unprojects image features onto a sparse voxel list with CUDA
grid_sample; XLA-on-TPU gathers are row-rate-bound (~200M rows/s measured on
v5e), so the op is engineered around gather row count:

  * all V views' feature maps are flattened into ONE (V*H*W, C) table and
    sampled with a single 4-tap gather — no per-view kernels, the projection
    itself is one einsum on the MXU;
  * at fine pyramid levels only a fixed-capacity set of K active voxels
    (selected from the previous level's occupancy via ``jnp.nonzero(size=K)``,
    the static-shape analogue of the reference's TRAIN_NUM_SAMPLE cap,
    configs/neural_recon/scannet.py:93) is back-projected, then scattered
    into the dense volume — a 34x row reduction at 96³.

Semantics preserved from the reference:
  - voxel world position = coord * voxel_size + origin
  - per-view 4x4 projection (intrinsics pre-scaled per level)
  - bilinear sampling, zeros padding, align_corners=True
  - validity: pixel inside image and depth z > 0
  - feature = mean over valid views; extra channel = per-voxel mean camera
    depth, standardized over the active voxel set
  - count = number of views seeing the voxel
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _packed_gather(table, idx, valid, hw, grad_cap=None):
    """``take(table, idx)`` with a per-view-scatter backward.

    Forward: one flat gather (the fast path — XLA's fused gather reaches
    ~540M rows/s on coherent projection indices).  Backward: the gather's
    natural VJP is ONE scatter-add over the whole (B*V*H*W)-row table, which
    the TPU scatter emitter runs at ~60M rows/s (r4 trace: 17.3 ms at level
    2); restructured as a ``lax.scan`` of per-view scatter-adds into
    (H*W)-row targets it runs 2.1x faster (9.1 ms measured) — the small
    per-view working set is what the emitter needs.

    Row reduction (r5): the emitter is row-rate-bound, so with ``grad_cap``
    set the backward scatters only the rows whose ``valid`` bit is on,
    mask-compacted into a static ``grad_cap``-row set; segments with more
    valid rows than the cap fall back (``lax.cond``) to the full K-row
    scatter, so the gradient is always exact.

    CONTRACT: callers must ensure invalid rows' cotangents are zero (the
    back-projection chain multiplies every consumer of row (s, k) by
    ``valid[s, k]``), because the compacted backward discards them.

    Args:
        table: (R, C) with R = n_segments * hw (one segment per (batch,view)).
        idx: (S, K) int32 global row indices, segment-major — every
            ``idx[s]`` must point inside segment s (rows [s*hw, (s+1)*hw)).
        valid: (S, K) bool — rows whose gradient must be kept.
        hw: static rows per segment.
        grad_cap: static per-segment valid-row capacity (None = all rows).
    """
    # mode="clip": idx is in-bounds by construction (pixel coords are clipped
    # before packing), and the default fill mode would add a bounds-check
    # pred + a full (S*K, C) select pass over the gather output (r5 trace:
    # ~1.4 ms/step of broadcast_select fusions at the bench shape)
    return jnp.take(table, idx.reshape(-1), axis=0, mode="clip")


def _packed_gather_fwd(table, idx, valid, hw, grad_cap=None):
    return _packed_gather(table, idx, valid, hw, grad_cap), (idx, valid)


def _packed_gather_bwd(hw, grad_cap, res, d_out):
    idx, valid = res
    S, K = idx.shape
    C = d_out.shape[-1]
    d_seg = d_out.reshape(S, K, C)
    base = (jnp.arange(S, dtype=jnp.int32) * hw)[:, None]
    idx_local = idx - base

    if grad_cap is None or grad_cap >= K:
        def body(_, args):
            ii, dd = args
            return 0, jnp.zeros((hw, C), dd.dtype).at[ii].add(
                dd, mode="promise_in_bounds")

        _, d_table = jax.lax.scan(body, 0, (idx_local, d_seg))
        return d_table.reshape(S * hw, C), None, None

    cap = int(grad_cap)

    def body(_, args):
        ii, vv, dd = args
        n = vv.sum()

        def comp(_):
            (sel,) = jnp.nonzero(vv, size=cap, fill_value=0)
            m = jnp.arange(cap) < n
            rows = jnp.where(m, ii[sel], hw)  # padding slots -> dump row
            vals = dd[sel] * m[:, None].astype(dd.dtype)
            return jnp.zeros((hw + 1, C), dd.dtype).at[rows].add(
                vals, mode="promise_in_bounds")[:hw]

        def full(_):
            return jnp.zeros((hw + 1, C), dd.dtype).at[ii].add(
                dd, mode="promise_in_bounds")[:hw]

        return 0, jax.lax.cond(n <= cap, comp, full, 0)

    _, d_table = jax.lax.scan(body, 0, (idx_local, valid, d_seg))
    return d_table.reshape(S * hw, C), None, None


_packed_gather.defvjp(_packed_gather_fwd, _packed_gather_bwd)


def _voxel_world_from_flat(flat_idx: jnp.ndarray, dim: int, voxel_size: float,
                           origin: jnp.ndarray, interval: int) -> jnp.ndarray:
    """World centers for voxels given by linear indices into a dim³ grid."""
    ix = flat_idx // (dim * dim)
    iy = (flat_idx // dim) % dim
    iz = flat_idx % dim
    coords = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32) * interval
    return coords * voxel_size + origin


def back_project_sparse_batch(feats: jnp.ndarray, proj: jnp.ndarray,
                              origin: jnp.ndarray, flat_idx: jnp.ndarray,
                              slot_valid: jnp.ndarray,
                              dim: int, voxel_size: float, interval: int,
                              gather_dtype=None, grad_row_frac=None):
    """Batched back-projection with ONE flat un-batched gather.

    The batch dim is folded into the gather row index instead of vmapping
    the per-sample op: a gather with an explicit batch dimension takes XLA's
    row-at-a-time batched-gather path on TPU (~125x slower than the
    vectorized 2D take — 7.5 ms vs 0.06 ms for the 9x131072-row level-2
    gather at 96³), so this explicit-batch form IS the hot path and the
    per-sample `back_project_sparse` is a wrapper over it.

    Args:
        feats: (B, V, H, W, C) per-view feature maps.
        proj: (B, V, 4, 4) combined projection matrices at this level.
        origin: (B, 3) world position of voxel (0, 0, 0).
        flat_idx: (B, K) linear voxel indices (padded).
        slot_valid: (B, K) bool — False for padding slots.

    Returns:
        features: (B, K, C + 1) mean features + normalized-depth channel.
        count: (B, K) number of views seeing each voxel.
    """
    B, V, H, W, C = feats.shape
    K = flat_idx.shape[1]
    world = _voxel_world_from_flat(flat_idx, dim, voxel_size,
                                   origin[:, None, :], interval)  # (B,K,3)

    homo = jnp.concatenate([world, jnp.ones_like(world[..., :1])], -1)  # (B,K,4)
    cam = jnp.einsum("bkj,bvij->bvki", homo, proj)  # (B,V,K,4) — MXU
    z = cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    px = cam[..., 0] / safe_z
    py = cam[..., 1] / safe_z

    valid = ((px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1) & (z > 0)
             & slot_valid[:, None, :])

    x0 = jnp.clip(jnp.floor(px), 0, W - 1)
    y0 = jnp.clip(jnp.floor(py), 0, H - 1)
    wx = jnp.clip(px, 0, W - 1) - x0
    wy = jnp.clip(py, 0, H - 1) - y0

    # patch-packed gather: the 2x2 bilinear neighborhood is packed into ONE
    # table row of 4C channels (edge-replicated shifts reproduce the clamped
    # x+1/y+1 taps exactly) — a single (B*V*K)-row gather instead of 4
    if gather_dtype is not None:
        feats = feats.astype(gather_dtype)
    f_x1 = jnp.concatenate([feats[:, :, :, 1:], feats[:, :, :, -1:]], axis=3)
    f_y1 = jnp.concatenate([feats[:, :, 1:], feats[:, :, -1:]], axis=2)
    f_y1x1 = jnp.concatenate([f_y1[:, :, :, 1:], f_y1[:, :, :, -1:]], axis=3)
    table = jnp.concatenate([feats, f_x1, f_y1, f_y1x1],
                            axis=-1).reshape(B * V * H * W, 4 * C)
    base = (jnp.arange(B * V, dtype=jnp.int32) * (H * W)).reshape(B, V, 1)
    idx = y0.astype(jnp.int32) * W + x0.astype(jnp.int32) + base  # (B,V,K)
    # static valid-row capacity for the scatter backward (the emitter is
    # row-rate-bound; ~29% of rows are out-of-frustum at the bench shape)
    cap = None
    if grad_row_frac is not None and 0 < grad_row_frac < 1:
        cap = max(8, -(-int(grad_row_frac * K) // 8) * 8)
    g = _packed_gather(table, idx.reshape(B * V, K),
                       valid.reshape(B * V, K), H * W, cap
                       ).reshape(B, V, K, 4 * C)
    # combine the 4 taps as lane-slices of the packed row (a reshape to
    # (..., 4, C) would transpose the whole gather output before the reduce);
    # per-slice converts fuse into the consumer, a bulk astype would
    # materialize the f32 copy
    f = (g[..., 0 * C:1 * C].astype(jnp.float32) * ((1 - wx) * (1 - wy))[..., None]
         + g[..., 1 * C:2 * C].astype(jnp.float32) * (wx * (1 - wy))[..., None]
         + g[..., 2 * C:3 * C].astype(jnp.float32) * ((1 - wx) * wy)[..., None]
         + g[..., 3 * C:4 * C].astype(jnp.float32) * (wx * wy)[..., None])

    vf = valid.astype(f.dtype)  # (B,V,K)
    f = f * vf[..., None]
    zv = z * vf

    count = vf.sum(axis=1)  # (B,K)
    denom = jnp.maximum(count, 1.0)
    mean_f = f.sum(axis=1) / denom[..., None]
    mean_z = zv.sum(axis=1) / denom

    # standardize mean depth over seen voxels, per batch element
    # (reference back_project.py:76-80)
    seen = mean_z > 0
    n_seen = jnp.maximum(seen.sum(axis=1), 1)
    z_mean = jnp.where(seen, mean_z, 0.0).sum(axis=1) / n_seen
    z_var = jnp.where(seen, (mean_z - z_mean[:, None]) ** 2, 0.0).sum(axis=1)
    z_std = jnp.sqrt(z_var) + 1e-5
    z_norm = jnp.where(seen, (mean_z - z_mean[:, None]) / z_std[:, None], 0.0)

    features = jnp.concatenate([mean_f, z_norm[..., None]], axis=-1)
    return features, count


def back_project_sparse(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                        flat_idx: jnp.ndarray, slot_valid: jnp.ndarray,
                        dim: int, voxel_size: float, interval: int,
                        gather_dtype=None, grad_row_frac=None):
    """Back-project K selected voxels against all views with one fused gather.

    Args:
        feats: (V, H, W, C) per-view feature maps (one batch element).
        proj: (V, 4, 4) combined projection matrices at this level's scale.
        origin: (3,) world position of voxel (0, 0, 0).
        flat_idx: (K,) linear voxel indices into the dim³ grid (padded).
        slot_valid: (K,) bool — False for padding slots.
        dim, voxel_size, interval: grid geometry (static).
        gather_dtype: dtype of the gather table (default: feats.dtype).
            bfloat16 halves the gather bytes — the op is gather-bound, so
            this is ~1.7x on TPU; weights/accumulation stay float32.

    Returns:
        features: (K, C + 1) mean features + normalized-depth channel.
        count: (K,) number of views seeing each voxel.
    """
    f, cnt = back_project_sparse_batch(
        feats[None], proj[None], origin[None], flat_idx[None],
        slot_valid[None], dim, voxel_size, interval, gather_dtype=gather_dtype,
        grad_row_frac=grad_row_frac)
    return f[0], cnt[0]


@partial(jax.jit, static_argnames=("dim", "voxel_size", "interval", "gather_dtype"))
def back_project_dense(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                       dim: int, voxel_size: float, interval: int,
                       gather_dtype=None, grad_row_frac=None):
    """Full-grid back-projection (all dim³ voxels active).

    Returns volume (dim,dim,dim,C+1) and count (dim,dim,dim).
    """
    C = feats.shape[-1]
    N = dim ** 3
    flat_idx = jnp.arange(N, dtype=jnp.int32)
    valid = jnp.ones((N,), bool)
    f, cnt = back_project_sparse(feats, proj, origin, flat_idx, valid,
                                 dim, voxel_size, interval,
                                 gather_dtype=gather_dtype,
                                 grad_row_frac=grad_row_frac)
    return f.reshape(dim, dim, dim, C + 1), cnt.reshape(dim, dim, dim)


def back_project_batch(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                       dim: int, voxel_size: float, interval: int,
                       gather_dtype=None, grad_row_frac=None):
    """Batched dense wrapper: feats (B,V,H,W,C), proj (B,V,4,4), origin (B,3)."""
    B = feats.shape[0]
    C = feats.shape[-1]
    N = dim ** 3
    flat_idx = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (B, N))
    valid = jnp.ones((B, N), bool)
    f, cnt = back_project_sparse_batch(feats, proj, origin, flat_idx, valid,
                                       dim, voxel_size, interval,
                                       gather_dtype=gather_dtype,
                                       grad_row_frac=grad_row_frac)
    return (f.reshape(B, dim, dim, dim, C + 1),
            cnt.reshape(B, dim, dim, dim))


def back_project_masked(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                        mask: jnp.ndarray, capacity: int,
                        dim: int, voxel_size: float, interval: int,
                        gather_dtype=None, grad_row_frac=None):
    """Sparse-capacity back-projection for one batch element.

    Selects up to ``capacity`` active voxels from ``mask`` (dim,dim,dim) and
    scatters results back into dense volume/count arrays.

    Returns volume (dim,dim,dim,C+1), count (dim,dim,dim).
    """
    C = feats.shape[-1]
    N = dim ** 3
    flat_mask = mask.reshape(N)
    (flat_idx,) = jnp.nonzero(flat_mask, size=capacity, fill_value=0)
    flat_idx = flat_idx.astype(jnp.int32)
    n_active = flat_mask.sum()
    slot_valid = jnp.arange(capacity) < n_active

    f, cnt = back_project_sparse(feats, proj, origin, flat_idx, slot_valid,
                                 dim, voxel_size, interval,
                                 gather_dtype=gather_dtype,
                                 grad_row_frac=grad_row_frac)
    vf = slot_valid.astype(f.dtype)
    volume = jnp.zeros((N, C + 1), f.dtype).at[flat_idx].add(f * vf[:, None])
    count = jnp.zeros((N,), cnt.dtype).at[flat_idx].add(cnt * vf)
    return volume.reshape(dim, dim, dim, C + 1), count.reshape(dim, dim, dim)


def back_project_masked_batch(feats, proj, origin, mask, capacity: int,
                              dim: int, voxel_size: float, interval: int,
                              gather_dtype=None, grad_row_frac=None):
    """Batched sparse-capacity back-projection.

    Active-voxel selection is vmapped (cheap), but the hot gather goes
    through the explicit-batch core and the dense scatter-back is ONE flat
    scatter with batch folded into the row index (a vmapped scatter takes
    the same slow batched path as a vmapped gather).
    """
    B = feats.shape[0]
    C = feats.shape[-1]
    N = dim ** 3

    def select(m):
        flat_mask = m.reshape(N)
        (flat_idx,) = jnp.nonzero(flat_mask, size=capacity, fill_value=0)
        return flat_idx.astype(jnp.int32), flat_mask.sum()

    flat_idx, n_active = jax.vmap(select)(mask)  # (B,K), (B,)
    slot_valid = jnp.arange(capacity)[None, :] < n_active[:, None]

    f, cnt = back_project_sparse_batch(feats, proj, origin, flat_idx,
                                       slot_valid, dim, voxel_size, interval,
                                       gather_dtype=gather_dtype,
                                       grad_row_frac=grad_row_frac)
    vf = slot_valid.astype(f.dtype)
    rows = (flat_idx
            + (jnp.arange(B, dtype=jnp.int32) * N)[:, None]).reshape(-1)
    volume = jnp.zeros((B * N, C + 1), f.dtype).at[rows].add(
        (f * vf[..., None]).reshape(B * capacity, C + 1))
    count = jnp.zeros((B * N,), cnt.dtype).at[rows].add(
        (cnt * vf).reshape(-1))
    return (volume.reshape(B, dim, dim, dim, C + 1),
            count.reshape(B, dim, dim, dim))
