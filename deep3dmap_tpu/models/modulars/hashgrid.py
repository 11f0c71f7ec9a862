"""Multi-resolution hash-grid positional encoding (instant-ngp style).

The TPU-native replacement for tinycudann's HashGrid encoding used by the
reference LERF field (/root/reference/deep3dmap/models/modulars/ns_fields/
lerf_field.py:78-93): per level, trilinear interpolation of learned features
stored in a hashed table — expressed as 8-corner gathers + lerp, which XLA
fuses; tables live in HBM and shard over the mesh if annotated.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

_PRIMES = (np.uint32(1), np.uint32(2654435761), np.uint32(805459861))


def _hash(coords: jnp.ndarray, table_size: int) -> jnp.ndarray:
    """coords (..., 3) int -> (...,) int32 indices in [0, table_size).
    uint32 wraparound multiply (instant-ngp spatial hash)."""
    c = coords.astype(jnp.uint32)
    h = c[..., 0] * _PRIMES[0]
    h = h ^ (c[..., 1] * _PRIMES[1])
    h = h ^ (c[..., 2] * _PRIMES[2])
    return (h % np.uint32(table_size)).astype(jnp.int32)


class HashGridEncoding(nn.Module):
    """n_levels geometric resolutions from base_res to end_res."""

    n_levels: int = 8
    features_per_level: int = 8
    log2_hashmap_size: int = 16
    base_res: int = 16
    end_res: int = 128

    @nn.compact
    def __call__(self, x):
        """x (..., 3) in [0, 1] -> (..., n_levels * features_per_level)."""
        table_size = 2 ** self.log2_hashmap_size
        growth = np.exp((np.log(self.end_res) - np.log(self.base_res))
                        / max(self.n_levels - 1, 1))
        tables = self.param(
            "tables", nn.initializers.uniform(1e-4),
            (self.n_levels, table_size, self.features_per_level))

        outs = []
        for lvl in range(self.n_levels):
            res = int(np.floor(self.base_res * growth ** lvl))
            pos = x * res
            p0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - p0
            feats = 0.0
            for corner in range(8):
                offset = jnp.asarray([(corner >> 2) & 1, (corner >> 1) & 1,
                                      corner & 1], jnp.int32)
                c = p0 + offset
                idx = _hash(c, table_size)
                w = jnp.prod(jnp.where(offset == 1, frac, 1.0 - frac), axis=-1)
                feats = feats + w[..., None] * tables[lvl][idx]
            outs.append(feats)
        return jnp.concatenate(outs, axis=-1)
