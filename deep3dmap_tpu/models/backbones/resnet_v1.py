"""ResNet v1 classifier backbone (NHWC, flax).

Capability parity with the reference's 5-stage face ResNet
(/root/reference/deep3dmap/models/backbones/resnet_v1.py:88-156): 16-ch
3x3 stem, maxpool, five stride-2 stages at (32, 64, 128, 256, 512) planes
with BasicBlock/Bottleneck residuals, global average pool, linear head.

TPU-native choices: NHWC layout, GroupNorm instead of BatchNorm (no
cross-device batch statistics to sync — the reference needed SyncBN hooks
for this), and a mean-pool over the full spatial extent instead of a fixed
8x8 AvgPool so the backbone is input-size agnostic under jit.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES


def _norm(x):
    groups = min(8, x.shape[-1])
    while x.shape[-1] % groups != 0:
        groups -= 1
    return nn.GroupNorm(num_groups=groups)(x)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, use_bias=False)(x)
        out = nn.relu(_norm(out))
        out = nn.Conv(self.planes, (3, 3), use_bias=False)(out)
        out = _norm(out)
        if self.stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False)(x)
            residual = _norm(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        out_ch = self.planes * self.expansion
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False)(x)
        out = nn.relu(_norm(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2, use_bias=False)(out)
        out = nn.relu(_norm(out))
        out = nn.Conv(out_ch, (1, 1), use_bias=False)(out)
        out = _norm(out)
        if self.stride != 1 or x.shape[-1] != out_ch:
            residual = nn.Conv(out_ch, (1, 1), strides=(self.stride,) * 2,
                               use_bias=False)(x)
            residual = _norm(residual)
        return nn.relu(out + residual)


_BLOCKS = {"basic": BasicBlock, "bottleneck": Bottleneck}


@BACKBONES.register_module()
class ResNetV1(nn.Module):
    """x (B, H, W, 3) -> logits (B, num_classes)."""

    block: str = "basic"  # "basic" | "bottleneck"
    layers: Sequence[int] = (2, 2, 2, 2, 2)
    num_classes: int = 1000
    stem_ch: int = 16

    @nn.compact
    def __call__(self, x):
        block_cls = _BLOCKS[self.block]
        x = nn.Conv(self.stem_ch, (3, 3), use_bias=False)(x)
        x = nn.relu(_norm(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i, n_blocks in enumerate(self.layers):
            planes = self.stem_ch * (2 ** (i + 1))
            for j in range(n_blocks):
                x = block_cls(planes=planes, stride=2 if j == 0 else 1)(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(self.num_classes)(x)


@BACKBONES.register_module()
class ResFCN256Cls(nn.Module):
    """The reference's ``resfcn256`` factory (resnet_v1.py:149-156): a
    BasicBlock [2,2,2,2,2] ResNetV1 classifier (distinct from the PRNet
    position-map ResFCN256 in resfcn256.py)."""

    num_classes: int = 1000

    @nn.compact
    def __call__(self, x):
        return ResNetV1(block="basic", layers=(2, 2, 2, 2, 2),
                        num_classes=self.num_classes)(x)
