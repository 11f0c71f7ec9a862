"""Positional encodings and learnable pose embeddings.

Parity: /root/reference/deep3dmap/models/modulars/embeddings.py —
HighDimEmbedding (NeRF positional encoding, x ++ sin/cos(2^k x)) and
PoseParameters (per-image optimizable camera poses in '3d' position-only or
'6d' rotation+translation form), plus the r6d2mat/pose_to_d9 helpers from the
reference's core/renderer/utils.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ...core.renderer.samples.ray_sampler import look_at_rotation


def high_dim_embedding(x: jnp.ndarray, n_freqs: int, logscale: bool = True) -> jnp.ndarray:
    """(…, C) -> (…, C*(2*n_freqs+1)); includes the raw input."""
    if logscale:
        freqs = 2.0 ** jnp.arange(n_freqs)
    else:
        freqs = jnp.linspace(1.0, 2.0 ** (n_freqs - 1), n_freqs)
    out = [x]
    for f in freqs:
        out.append(jnp.sin(f * x))
        out.append(jnp.cos(f * x))
    return jnp.concatenate(out, axis=-1)


def embedding_out_channels(in_channels: int, n_freqs: int) -> int:
    return in_channels * (2 * n_freqs + 1)


def r6d2mat(d6: jnp.ndarray) -> jnp.ndarray:
    """6D rotation representation -> (…, 3, 3) via Gram-Schmidt (Zhou et al.)."""
    a1, a2 = d6[..., :3], d6[..., 3:6]
    b1 = a1 / (jnp.linalg.norm(a1, axis=-1, keepdims=True) + 1e-9)
    a2p = a2 - (b1 * a2).sum(-1, keepdims=True) * b1
    b2 = a2p / (jnp.linalg.norm(a2p, axis=-1, keepdims=True) + 1e-9)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def pose_to_d9(pose: jnp.ndarray) -> jnp.ndarray:
    """(…, 3, 4) [R|t] -> (…, 9): [t, R_row0, R_row1]."""
    t = pose[..., :3, 3]
    r = pose[..., :2, :3].reshape(pose.shape[:-2] + (6,))
    return jnp.concatenate([t, r], axis=-1)


class PoseParameters(nn.Module):
    """Learnable per-image camera poses (embeddings.py PoseParameters)."""

    length: int
    pose_mode: str = "6d"  # '3d' = position only (rotation by look-at)

    def _init_embed(self):
        t = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (self.length, 1))
        if self.pose_mode == "3d":
            return t
        R = look_at_rotation(t)
        poses = jnp.concatenate([R, t[..., None]], -1)
        return pose_to_d9(poses)

    @nn.compact
    def __call__(self, pose_indices=None):
        embed = self.param("poses_embed", lambda rng: self._init_embed())
        if self.pose_mode == "3d":
            t = embed[:, :3]
            R = look_at_rotation(t)
        else:
            t = embed[:, :3]
            R = r6d2mat(embed[:, 3:9])
        poses = jnp.concatenate([R, t[..., None]], -1)  # (N, 3, 4)
        if pose_indices is None:
            return poses
        return poses[pose_indices]
