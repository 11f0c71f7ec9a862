"""Pose inversion network: image patch -> camera pose embedding.

Parity: /root/reference/deep3dmap/models/modulars/inversion_net.py:7-33 — a
ViT regressing a 3d (position) or 9d (position + 6d rotation) pose; compact
flax ViT implementation (patch embed + transformer encoder + cls head).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES


class _Block(nn.Module):
    dim: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm()(x)
        h = nn.MultiHeadDotProductAttention(num_heads=self.heads)(h, h)
        x = x + h
        h = nn.LayerNorm()(x)
        h = nn.Dense(self.mlp_dim)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim)(h)
        return x + h


@BACKBONES.register_module()
class InversionNet(nn.Module):
    imsize: int = 64
    pose_mode: str = "6d"
    dim: int = 256
    depth: int = 6
    heads: int = 16
    mlp_dim: int = 256

    @nn.compact
    def __call__(self, img):
        """img (B, imsize, imsize, 3) -> (B, 3 or 9)."""
        out_dim = 3 if self.pose_mode == "3d" else 9
        p = max(self.imsize // 16, 1)
        B, H, W, C = img.shape
        x = img.reshape(B, H // p, p, W // p, p, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, (H // p) * (W // p), p * p * C)
        x = nn.Dense(self.dim)(x)
        cls = self.param("cls", nn.initializers.zeros, (1, 1, self.dim))
        x = jnp.concatenate([jnp.broadcast_to(cls, (B, 1, self.dim)), x], axis=1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, x.shape[1], self.dim))
        x = x + pos
        for _ in range(self.depth):
            x = _Block(self.dim, self.heads, self.mlp_dim)(x)
        x = nn.LayerNorm()(x)
        return nn.Dense(out_dim)(x[:, 0])
