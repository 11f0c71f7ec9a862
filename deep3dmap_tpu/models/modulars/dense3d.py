"""Dense 3D convolution stacks — the TPU-native sparse-conv replacement.

The reference regularizes back-projected voxel features with torchsparse
SPVCNN point-voxel networks (/root/reference/deep3dmap/models/modulars/
sparse_cnn.py:74-175).  Sparse gather/scatter convolution maps poorly to the
MXU; at NeuralRecon's partial-volume sizes (24³/48³/96³) dense 3D convolution
with occupancy *masking* is both faster on TPU and XLA-friendly (static
shapes, fusable).  UNet3D mirrors SPVCNN's capacity: stem 32·cr, encoder
[64·cr, 128·cr], decoder [96·cr, 96·cr] with skip connections, where
cr = 1/2^level gives per-level output channels [96, 48, 24].

Layout: NDHWC (batch, x, y, z, channels).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


def _gn(x, max_groups: int = 8):
    groups = min(max_groups, x.shape[-1])
    while x.shape[-1] % groups != 0:
        groups -= 1
    return nn.GroupNorm(num_groups=groups)(x)


class ConvBlock3D(nn.Module):
    out_ch: int
    kernel: int = 3
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        k, s = self.kernel, self.stride
        x = nn.Conv(self.out_ch, (k, k, k), strides=(s, s, s), use_bias=False)(x)
        x = _gn(x)
        return nn.relu(x)


class ResBlock3D(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = ConvBlock3D(self.out_ch)(x)
        h = nn.Conv(self.out_ch, (3, 3, 3), use_bias=False)(h)
        h = _gn(h)
        if x.shape[-1] != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1, 1), use_bias=False)(x)
        return nn.relu(x + h)


def _up2(x):
    """Nearest-neighbor 2x upsample on the three spatial dims."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return jnp.repeat(x, 2, axis=3)


def _crop_to(x, ref):
    """Crop x's spatial dims down to ref's (handles odd input sizes where a
    stride-2 down + 2x up overshoots by one)."""
    return x[:, :ref.shape[1], :ref.shape[2], :ref.shape[3], :]


class UNet3D(nn.Module):
    """Two-down/two-up residual UNet over a dense voxel grid."""

    out_ch: int
    cr: float = 1.0  # channel ratio, SPVCNN-style

    @nn.compact
    def __call__(self, x):
        cs = [max(int(c * self.cr), 8) for c in (32, 64, 128, 96, 96)]
        stem = ConvBlock3D(cs[0])(x)

        d1 = ResBlock3D(cs[1])(ConvBlock3D(cs[1], stride=2)(stem))
        d2 = ResBlock3D(cs[2])(ConvBlock3D(cs[2], stride=2)(d1))

        u1 = _crop_to(_up2(d2), d1)
        u1 = ResBlock3D(cs[3])(jnp.concatenate([u1, d1], axis=-1))
        u2 = _crop_to(_up2(u1), stem)
        u2 = ResBlock3D(cs[4])(jnp.concatenate([u2, stem], axis=-1))

        return nn.Conv(self.out_ch, (1, 1, 1))(u2)
