"""LERF language field: multi-scale hashgrids -> CLIP/DINO heads.

Parity: /root/reference/deep3dmap/models/modulars/ns_fields/
lerf_field.py:33-123 — a list of hash-grid encodings whose concatenated
features feed (a) a CLIP head conditioned on the physical scale (4x256 MLP,
L2-normalized output) and (b) a DINO head (1x256 MLP); plus the hashgrid
reuse path for multi-scale relevancy sweeps.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .hashgrid import HashGridEncoding


class LERFField(nn.Module):
    grid_layers: Sequence[int] = (8, 8)
    grid_sizes: Sequence[int] = (16, 16)           # log2 hashmap sizes
    grid_resolutions: Sequence = ((16, 128), (128, 256))
    clip_n_dims: int = 512
    dino_n_dims: int = 384
    hidden: int = 256

    def setup(self):
        self.clip_encs = [
            HashGridEncoding(n_levels=self.grid_layers[i],
                             log2_hashmap_size=self.grid_sizes[i],
                             base_res=self.grid_resolutions[i][0],
                             end_res=self.grid_resolutions[i][1],
                             name=f"enc_{i}")
            for i in range(len(self.grid_layers))
        ]
        self.clip_net = [nn.Dense(self.hidden, name=f"clip_fc{i}") for i in range(4)] \
            + [nn.Dense(self.clip_n_dims, name="clip_out")]
        self.dino_net = [nn.Dense(self.hidden, name="dino_fc0"),
                         nn.Dense(self.dino_n_dims, name="dino_out")]

    def hashgrid_features(self, positions):
        """positions (..., 3) in [0,1] -> concatenated multi-grid features."""
        return jnp.concatenate([enc(positions) for enc in self.clip_encs], axis=-1)

    def clip_from_hashgrid(self, feats, scales):
        """feats (..., F); scales (..., 1) -> normalized clip (..., D)
        (lerf_field.py:115-123 get_output_from_hashgrid)."""
        h = jnp.concatenate([feats, scales], axis=-1)
        for fc in self.clip_net[:-1]:
            h = nn.relu(fc(h))
        out = self.clip_net[-1](h)
        return out / jnp.sqrt((out ** 2).sum(-1, keepdims=True) + 1e-8)

    def __call__(self, positions, clip_scales):
        feats = self.hashgrid_features(positions)
        clip = self.clip_from_hashgrid(feats, clip_scales)
        h = feats
        h = nn.relu(self.dino_net[0](h))
        dino = self.dino_net[1](h)
        return {"hashgrid": feats, "clip": clip, "dino": dino}
