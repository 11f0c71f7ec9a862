"""Global hidden-state volumes with windowed read/write.

The TPU-native replacement for the reference's unbounded sparse global
volumes (/root/reference/deep3dmap/models/modulars/gru_fusion.py:33-50,
122-150): per scale, the scene-level recurrent state lives in a *fixed-size
dense* array carried through the jitted train step (donated, shardable over a
mesh axis), and each fragment's partial-volume window is addressed with
``lax.dynamic_slice`` / ``dynamic_update_slice`` at the fragment's voxel
offset from the scene origin.  Scene changes zero the state via a masked
reset instead of reallocating (gru_fusion.py:230-233).

Window starts are clamped into the global extent; configure
``global_dim`` generously enough to cover the scene (the reference's global
volume grows unboundedly — here the extent is an explicit capacity knob,
which is also what makes multi-host spatial sharding of the state possible).
"""
from __future__ import annotations

from typing import List, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp


class GlobalVolumeState(NamedTuple):
    """Per-scale hidden volumes, each (B, G, G, G, C)."""

    volumes: Tuple


def init_global_volumes(batch: int, global_dims: Sequence[int],
                        channels: Sequence[int], dtype=jnp.float32) -> GlobalVolumeState:
    vols = tuple(jnp.zeros((batch, g, g, g, c), dtype)
                 for g, c in zip(global_dims, channels))
    return GlobalVolumeState(volumes=vols)


def reset_volumes(state: GlobalVolumeState, reset_mask: jnp.ndarray) -> GlobalVolumeState:
    """Zero state for batch elements where reset_mask (B,) is True."""
    m = reset_mask.reshape(-1, 1, 1, 1, 1)
    vols = tuple(jnp.where(m, jnp.zeros_like(v), v) for v in state.volumes)
    return GlobalVolumeState(volumes=vols)


def _clamp_start(rel_origin_vox: jnp.ndarray, global_dim: int, window: int) -> jnp.ndarray:
    start = jnp.round(rel_origin_vox).astype(jnp.int32)
    return jnp.clip(start, 0, global_dim - window)


def read_window(volume: jnp.ndarray, rel_origin_vox: jnp.ndarray, window: int) -> jnp.ndarray:
    """Slice a (window³, C) region from one sample's global volume (G,G,G,C).

    rel_origin_vox: (3,) fragment origin in this scale's voxel units relative
    to the scene origin.
    """
    g = volume.shape[0]
    if g == window:
        # window covers the whole extent: the clamp forces start 0, so the
        # slice is the identity (avoids a full-volume dynamic-slice copy)
        return volume
    start = _clamp_start(rel_origin_vox, g, window)
    return jax.lax.dynamic_slice(
        volume, (start[0], start[1], start[2], 0),
        (window, window, window, volume.shape[-1]))


def write_window(volume: jnp.ndarray, window_data: jnp.ndarray,
                 rel_origin_vox: jnp.ndarray) -> jnp.ndarray:
    g = volume.shape[0]
    w = window_data.shape[0]
    if g == w:
        # full overwrite: the vmapped dynamic-update-slice otherwise lowers
        # to a whole-volume select (r5 trace: ~1 ms/step at 96³ x 24ch)
        return window_data.astype(volume.dtype)
    start = _clamp_start(rel_origin_vox, g, w)
    return jax.lax.dynamic_update_slice(
        volume, window_data.astype(volume.dtype), (start[0], start[1], start[2], 0))


def read_windows_batch(volume: jnp.ndarray, rel_origin_vox: jnp.ndarray,
                       window: int) -> jnp.ndarray:
    """vmapped read: volume (B,G,G,G,C), rel_origin_vox (B,3) -> (B,w,w,w,C)."""
    return jax.vmap(lambda v, o: read_window(v, o, window))(volume, rel_origin_vox)


def write_windows_batch(volume: jnp.ndarray, window_data: jnp.ndarray,
                        rel_origin_vox: jnp.ndarray) -> jnp.ndarray:
    return jax.vmap(write_window)(volume, window_data, rel_origin_vox)
