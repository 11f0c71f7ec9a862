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


def _voxel_world_from_flat(flat_idx: jnp.ndarray, dim: int, voxel_size: float,
                           origin: jnp.ndarray, interval: int) -> jnp.ndarray:
    """World centers for voxels given by linear indices into a dim³ grid."""
    ix = flat_idx // (dim * dim)
    iy = (flat_idx // dim) % dim
    iz = flat_idx % dim
    coords = jnp.stack([ix, iy, iz], axis=-1).astype(jnp.float32) * interval
    return coords * voxel_size + origin


def back_project_sparse(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                        flat_idx: jnp.ndarray, slot_valid: jnp.ndarray,
                        dim: int, voxel_size: float, interval: int,
                        gather_dtype=None):
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
    V, H, W, C = feats.shape
    K = flat_idx.shape[0]
    world = _voxel_world_from_flat(flat_idx, dim, voxel_size, origin, interval)

    homo = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=-1)  # (K,4)
    cam = jnp.einsum("kj,vij->vki", homo, proj)  # (V,K,4) — MXU
    z = cam[..., 2]
    safe_z = jnp.where(jnp.abs(z) > 1e-6, z, 1e-6)
    px = cam[..., 0] / safe_z
    py = cam[..., 1] / safe_z

    valid = ((px >= 0) & (px <= W - 1) & (py >= 0) & (py <= H - 1) & (z > 0)
             & slot_valid[None, :])

    x0 = jnp.clip(jnp.floor(px), 0, W - 1)
    y0 = jnp.clip(jnp.floor(py), 0, H - 1)
    wx = jnp.clip(px, 0, W - 1) - x0
    wy = jnp.clip(py, 0, H - 1) - y0

    # patch-packed gather: XLA row gathers on TPU are row-rate-bound, so the
    # 2x2 bilinear neighborhood is packed into ONE table row of 4C channels
    # (edge-replicated shifts reproduce the clamped x+1/y+1 taps exactly) —
    # a single (V*K)-row gather instead of 4
    if gather_dtype is not None:
        feats = feats.astype(gather_dtype)
    f_x1 = jnp.concatenate([feats[:, :, 1:], feats[:, :, -1:]], axis=2)
    f_y1 = jnp.concatenate([feats[:, 1:], feats[:, -1:]], axis=1)
    f_y1x1 = jnp.concatenate([f_y1[:, :, 1:], f_y1[:, :, -1:]], axis=2)
    table = jnp.concatenate([feats, f_x1, f_y1, f_y1x1],
                            axis=-1).reshape(V * H * W, 4 * C)
    base = (jnp.arange(V, dtype=jnp.int32) * (H * W))[:, None]
    idx = y0.astype(jnp.int32) * W + x0.astype(jnp.int32) + base  # (V,K)
    g = jnp.take(table, idx.reshape(-1), axis=0).reshape(V, K, 4, C)
    g = g.astype(jnp.float32)
    w = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy],
                  axis=-1)  # (V,K,4)
    f = (g * w[..., None]).sum(axis=2)  # (V,K,C)

    vf = valid.astype(f.dtype)
    f = f * vf[..., None]
    zv = z * vf

    count = vf.sum(axis=0)
    denom = jnp.maximum(count, 1.0)
    mean_f = f.sum(axis=0) / denom[..., None]
    mean_z = zv.sum(axis=0) / denom

    # standardize mean depth over seen voxels (reference back_project.py:76-80)
    seen = mean_z > 0
    n_seen = jnp.maximum(seen.sum(), 1)
    z_mean = jnp.where(seen, mean_z, 0.0).sum() / n_seen
    z_var = jnp.where(seen, (mean_z - z_mean) ** 2, 0.0).sum()
    z_std = jnp.sqrt(z_var) + 1e-5
    z_norm = jnp.where(seen, (mean_z - z_mean) / z_std, 0.0)

    features = jnp.concatenate([mean_f, z_norm[..., None]], axis=-1)
    return features, count


@partial(jax.jit, static_argnames=("dim", "voxel_size", "interval", "gather_dtype"))
def back_project_dense(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                       dim: int, voxel_size: float, interval: int,
                       gather_dtype=None):
    """Full-grid back-projection (all dim³ voxels active).

    Returns volume (dim,dim,dim,C+1) and count (dim,dim,dim).
    """
    C = feats.shape[-1]
    N = dim ** 3
    flat_idx = jnp.arange(N, dtype=jnp.int32)
    valid = jnp.ones((N,), bool)
    f, cnt = back_project_sparse(feats, proj, origin, flat_idx, valid,
                                 dim, voxel_size, interval,
                                 gather_dtype=gather_dtype)
    return f.reshape(dim, dim, dim, C + 1), cnt.reshape(dim, dim, dim)


def back_project_batch(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                       dim: int, voxel_size: float, interval: int,
                       gather_dtype=None):
    """Batched dense wrapper: feats (B,V,H,W,C), proj (B,V,4,4), origin (B,3)."""
    fn = partial(back_project_dense, dim=dim, voxel_size=voxel_size,
                 interval=interval, gather_dtype=gather_dtype)
    return jax.vmap(fn)(feats, proj, origin)


def back_project_masked(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                        mask: jnp.ndarray, capacity: int,
                        dim: int, voxel_size: float, interval: int,
                        gather_dtype=None):
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
                                 gather_dtype=gather_dtype)
    vf = slot_valid.astype(f.dtype)
    volume = jnp.zeros((N, C + 1), f.dtype).at[flat_idx].add(f * vf[:, None])
    count = jnp.zeros((N,), cnt.dtype).at[flat_idx].add(cnt * vf)
    return volume.reshape(dim, dim, dim, C + 1), count.reshape(dim, dim, dim)


def back_project_masked_batch(feats, proj, origin, mask, capacity: int,
                              dim: int, voxel_size: float, interval: int,
                              gather_dtype=None):
    fn = partial(back_project_masked, capacity=capacity, dim=dim,
                 voxel_size=voxel_size, interval=interval,
                 gather_dtype=gather_dtype)
    return jax.vmap(fn)(feats, proj, origin, mask)
