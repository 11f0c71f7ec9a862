"""NeRF MLP backbone.

Parity: /root/reference/deep3dmap/models/backbones/nerf.py:9-74 — positional
encodings on xyz/dir, 8x256 trunk with skip at layer 4, sigma head + view-
dependent rgb head with sigmoid.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from ..modulars.embeddings import high_dim_embedding


@BACKBONES.register_module()
class NeRF(nn.Module):
    xyz_freq: int = 10
    dir_freq: int = 4
    fc_depth: int = 8
    fc_dim: int = 256
    skips: Sequence[int] = (4,)

    @nn.compact
    def __call__(self, xyz, dirs=None, sigma_only: bool = False):
        """xyz (..., 3); dirs (..., 3) or None when sigma_only."""
        input_xyz = high_dim_embedding(xyz, self.xyz_freq)
        h = input_xyz
        for i in range(self.fc_depth):
            if i in self.skips:
                h = jnp.concatenate([input_xyz, h], axis=-1)
            h = nn.Dense(self.fc_dim, name=f"xyz_encoding_{i + 1}")(h)
            h = nn.relu(h)
        sigma = nn.Dense(1, name="sigma")(h)
        if sigma_only:
            return sigma

        final = nn.Dense(self.fc_dim, name="xyz_encoding_final")(h)
        input_dir = high_dim_embedding(dirs, self.dir_freq)
        d = jnp.concatenate([final, input_dir], axis=-1)
        d = nn.Dense(self.fc_dim // 2, name="rgb1")(d)
        d = nn.relu(d)
        rgb = nn.sigmoid(nn.Dense(3, name="rgb2")(d))
        return jnp.concatenate([rgb, sigma], axis=-1)
