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
                        dim: int, voxel_size: float, interval: int):
    """Back-project K selected voxels against all views with one fused gather.

    Args:
        feats: (V, H, W, C) per-view feature maps (one batch element).
        proj: (V, 4, 4) combined projection matrices at this level's scale.
        origin: (3,) world position of voxel (0, 0, 0).
        flat_idx: (K,) linear voxel indices into the dim³ grid (padded).
        slot_valid: (K,) bool — False for padding slots.
        dim, voxel_size, interval: grid geometry (static).

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
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    wx = jnp.clip(px, 0, W - 1) - x0
    wy = jnp.clip(py, 0, H - 1) - y0

    # single flattened gather across views and ALL 4 bilinear taps: one take
    # call keeps only one padded gather buffer live at a time
    flat = feats.reshape(V * H * W, C)
    base = (jnp.arange(V, dtype=jnp.int32) * (H * W))[None, :, None]

    def _fi(yi, xi):
        return yi.astype(jnp.int32) * W + xi.astype(jnp.int32)

    idx = jnp.stack([_fi(y0, x0), _fi(y0, x1), _fi(y1, x0), _fi(y1, x1)]) + base
    w = jnp.stack([(1 - wx) * (1 - wy), wx * (1 - wy), (1 - wx) * wy, wx * wy])
    g = jnp.take(flat, idx.reshape(-1), axis=0).reshape(4, V, K, C)
    f = (g * w[..., None]).sum(axis=0)  # (V,K,C)

    vf = valid.astype(feats.dtype)
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


@partial(jax.jit, static_argnames=("dim", "voxel_size", "interval"))
def back_project_dense(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                       dim: int, voxel_size: float, interval: int):
    """Full-grid back-projection (all dim³ voxels active).

    Returns volume (dim,dim,dim,C+1) and count (dim,dim,dim).
    """
    C = feats.shape[-1]
    N = dim ** 3
    flat_idx = jnp.arange(N, dtype=jnp.int32)
    valid = jnp.ones((N,), bool)
    f, cnt = back_project_sparse(feats, proj, origin, flat_idx, valid,
                                 dim, voxel_size, interval)
    return f.reshape(dim, dim, dim, C + 1), cnt.reshape(dim, dim, dim)


def back_project_batch(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                       dim: int, voxel_size: float, interval: int):
    """Batched dense wrapper: feats (B,V,H,W,C), proj (B,V,4,4), origin (B,3)."""
    fn = partial(back_project_dense, dim=dim, voxel_size=voxel_size, interval=interval)
    return jax.vmap(fn)(feats, proj, origin)


def back_project_masked(feats: jnp.ndarray, proj: jnp.ndarray, origin: jnp.ndarray,
                        mask: jnp.ndarray, capacity: int,
                        dim: int, voxel_size: float, interval: int):
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
                                 dim, voxel_size, interval)
    vf = slot_valid.astype(f.dtype)
    volume = jnp.zeros((N, C + 1), f.dtype).at[flat_idx].add(f * vf[:, None])
    count = jnp.zeros((N,), cnt.dtype).at[flat_idx].add(cnt * vf)
    return volume.reshape(dim, dim, dim, C + 1), count.reshape(dim, dim, dim)


def back_project_masked_batch(feats, proj, origin, mask, capacity: int,
                              dim: int, voxel_size: float, interval: int):
    fn = partial(back_project_masked, capacity=capacity, dim=dim,
                 voxel_size=voxel_size, interval=interval)
    return jax.vmap(fn)(feats, proj, origin, mask)
