"""Compact VGG-style feature extractor (NHWC, flax).

Parity surface: /root/reference/deep3dmap/models/backbones/vgg.py:11 — conv
trunk producing a 512-d global feature for the 3DMM shape encoder.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES


@BACKBONES.register_module()
class Vgg(nn.Module):
    feat_dim: int = 512

    @nn.compact
    def __call__(self, x):
        for ch, reps in [(64, 2), (128, 2), (256, 3), (512, 3)]:
            for _ in range(reps):
                x = nn.Conv(ch, (3, 3))(x)
                groups = min(8, x.shape[-1])
                x = nn.GroupNorm(num_groups=groups)(x)
                x = nn.relu(x)
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.mean(axis=(1, 2))  # global average pool
        return nn.Dense(self.feat_dim)(x)
