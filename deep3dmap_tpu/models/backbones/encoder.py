"""Encoder / ResEncoder — compact conv encoders for view/light prediction.

Parity: /root/reference/deep3dmap/models/backbones/encoder.py:12,65
(unsup3d-style): stride-2 conv stack to a vector output, optional tanh.
NHWC flax.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES


class ResBlockDown(nn.Module):
    """Stride-2 residual downsampling block (encoder.py ResBlockDown)."""

    cout: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.cout, (4, 4), strides=(2, 2), use_bias=False)(
            nn.leaky_relu(x, 0.2))
        h = nn.Conv(self.cout, (3, 3), use_bias=False)(nn.leaky_relu(h, 0.2))
        skip = nn.Conv(self.cout, (1, 1), strides=(2, 2), use_bias=False)(x)
        return h + skip


@BACKBONES.register_module()
class ResEncoder(nn.Module):
    """Residual conv encoder to a flat vector
    (parity: /root/reference/deep3dmap/models/backbones/encoder.py:65-88):
    4x4-stride-2 stem, ResBlockDown chain down to 4x4, then 4x4 VALID conv to
    1x1 and a 1x1 projection to ``cout``. NHWC flax."""

    cout: int = 512
    nf: int = 16
    size: int = 128
    activation: str = "none"  # or "tanh"

    @nn.compact
    def __call__(self, x):
        import math

        nf = self.nf
        h = nn.Conv(nf, (4, 4), strides=(2, 2), use_bias=False)(x)
        h = ResBlockDown(nf * 2)(h)
        h = ResBlockDown(nf * 4)(h)
        h = ResBlockDown(nf * 8)(h)
        extra = int(math.log2(self.size)) - 6
        for _ in range(max(extra, 0)):
            nf *= 2
            h = ResBlockDown(nf * 8)(h)
        h = nn.relu(h)
        h = nn.Conv(nf * 16, (4, 4), padding="VALID", use_bias=False)(h)
        h = nn.relu(h)
        h = nn.Conv(self.cout, (1, 1), use_bias=False)(h)
        out = h.reshape(h.shape[0], -1)
        if self.activation == "tanh":
            out = jnp.tanh(out)
        return out


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
