"""ResFCN256 — the PRNet position-map regression backbone (NHWC, flax).

Capability parity with the reference's resfcn256_std
(/root/reference/deep3dmap/models/backbones/resfcn256_std.py:153-238):
encoder = 16ch stem + 5 bottleneck stages (2 blocks each, stride 2)
256→8 spatial / 512ch; decoder mirrors back to 256×256×3 with a sigmoid.

TPU-native choices: NHWC, GroupNorm, and resize-then-conv upsampling instead
of stride-2 transposed conv (equivalent capacity, no checkerboard artifacts,
maps cleanly onto the MXU).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES


def _gn(x):
    groups = min(8, x.shape[-1])
    while x.shape[-1] % groups != 0:
        groups -= 1
    return nn.GroupNorm(num_groups=groups)(x)


class Bottleneck(nn.Module):
    out_ch: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        shortcut = x
        half = self.out_ch // 2
        h = nn.Conv(half, (1, 1), use_bias=False)(x)
        h = nn.relu(_gn(h))
        h = nn.Conv(half, (4, 4), strides=(self.stride, self.stride), use_bias=False)(h)
        h = nn.relu(_gn(h))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=False)(h)
        h = _gn(h)
        if self.stride != 1 or x.shape[-1] != self.out_ch:
            shortcut = nn.Conv(self.out_ch, (1, 1), strides=(self.stride, self.stride),
                               use_bias=False)(x)
        return nn.relu(h + shortcut)


class _UpBlock(nn.Module):
    out_ch: int
    n_convs: int = 1
    upsample: bool = True

    @nn.compact
    def __call__(self, x):
        if self.upsample:
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        for _ in range(self.n_convs):
            x = nn.Conv(self.out_ch, (4, 4), use_bias=False)(x)
            x = nn.relu(_gn(x))
        return x


@BACKBONES.register_module(name=["ResFCN256", "resfcn256_std"])
class ResFCN256(nn.Module):
    """Input (B, R, R, 3) in [0,1]; output (B, R, R, out_ch) in (0,1)."""

    out_ch: int = 3
    base: int = 16

    @nn.compact
    def __call__(self, x):
        b = self.base
        h = nn.Conv(b, (4, 4), use_bias=False)(x)
        h = nn.relu(_gn(h))
        for i, ch in enumerate([2 * b, 4 * b, 8 * b, 16 * b, 32 * b]):
            h = Bottleneck(ch, stride=2)(h)
            h = Bottleneck(ch, stride=1)(h)
        # decoder: 8 -> 256 with the reference's channel schedule
        h = _UpBlock(32 * b, n_convs=1, upsample=False)(h)
        h = _UpBlock(16 * b, n_convs=3)(h)   # 16
        h = _UpBlock(8 * b, n_convs=3)(h)    # 32
        h = _UpBlock(4 * b, n_convs=3)(h)    # 64
        h = _UpBlock(2 * b, n_convs=2)(h)    # 128
        h = _UpBlock(b, n_convs=2)(h)        # 256
        h = nn.Conv(self.out_ch, (4, 4))(h)
        h = nn.Conv(self.out_ch, (4, 4))(h)
        return nn.sigmoid(h)
