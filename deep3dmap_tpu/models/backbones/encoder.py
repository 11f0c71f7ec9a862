"""Encoder / ResEncoder — compact conv encoders for view/light prediction.

Parity: /root/reference/deep3dmap/models/backbones/encoder.py:12,65
(unsup3d-style): stride-2 conv stack to a vector output, optional tanh.
NHWC flax.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES


@BACKBONES.register_module()
class Encoder(nn.Module):
    cout: int = 6
    nf: int = 32
    activation: str = "tanh"  # or "none"

    @nn.compact
    def __call__(self, x):
        """x (B, H, W, C) -> (B, cout)."""
        nf = self.nf
        for ch in (nf, nf * 2, nf * 4, nf * 8):
            x = nn.Conv(ch, (4, 4), strides=(2, 2), use_bias=False)(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.Conv(nf * 8, (4, 4), strides=(2, 2), use_bias=False)(x)
        x = nn.relu(x)
        x = x.mean(axis=(1, 2))
        x = nn.Dense(self.cout)(x)
        if self.activation == "tanh":
            x = jnp.tanh(x)
        return x
