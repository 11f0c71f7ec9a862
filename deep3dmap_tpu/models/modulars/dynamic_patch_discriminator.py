"""Scale-conditional patch discriminator with differentiable augmentation.

Parity: /root/reference/deep3dmap/models/modulars/
dynamic_patch_discriminator.py:10-125 — DCGAN-style strided conv stack sized
by patch resolution (16/32/64/128), spectral norm, optional conditioning on
the patch scale via positional embedding, DiffAugment applied stochastically.
NHWC flax; spectral norm via nn.SpectralNorm.
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..function_utils.diff_augment import diff_augment
from .embeddings import high_dim_embedding


class _SNConv(nn.Module):
    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = nn.SpectralNorm(nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            use_bias=False))
        return conv(x, update_stats=train)


class _IN(nn.Module):
    @nn.compact
    def __call__(self, x):
        # instance norm = GroupNorm with one group per channel
        return nn.GroupNorm(num_groups=x.shape[-1])(x)


class Discriminator(nn.Module):
    conditional: bool = True
    policy: Optional[Sequence[str]] = ("color", "translation", "cutout")
    ndf: int = 64
    imsize: int = 64

    @nn.compact
    def __call__(self, x, y=None, rng: Optional[jax.Array] = None, train: bool = True):
        """x (B, imsize, imsize, 3) in [-1,1]; y (B, 1) patch scales."""
        assert self.imsize in (16, 32, 64, 128)
        if self.policy is not None and rng is not None:
            r_gate, r_aug = jax.random.split(rng)
            do_aug = jax.random.uniform(r_gate) > 0.5
            x = jax.lax.cond(do_aug,
                             lambda im: diff_augment(r_aug, im, self.policy),
                             lambda im: im, x)

        ndf = self.ndf
        h = x
        if self.imsize == 128:
            h = nn.leaky_relu(_SNConv(ndf // 2)(h, train), 0.2)
            h = nn.leaky_relu(_IN()(_SNConv(ndf)(h, train)), 0.2)
            h = nn.leaky_relu(_IN()(_SNConv(ndf * 2)(h, train)), 0.2)
            h = nn.leaky_relu(_IN()(_SNConv(ndf * 4)(h, train)), 0.2)
        elif self.imsize == 64:
            h = nn.leaky_relu(_SNConv(ndf)(h, train), 0.2)
            h = nn.leaky_relu(_IN()(_SNConv(ndf * 2)(h, train)), 0.2)
            h = nn.leaky_relu(_IN()(_SNConv(ndf * 4)(h, train)), 0.2)
        elif self.imsize == 32:
            h = nn.leaky_relu(_IN()(_SNConv(ndf * 2)(h, train)), 0.2)
            h = nn.leaky_relu(_IN()(_SNConv(ndf * 4)(h, train)), 0.2)
        else:  # 16
            h = nn.leaky_relu(_IN()(_SNConv(ndf * 4)(h, train)), 0.2)

        h = nn.leaky_relu(_IN()(_SNConv(ndf * 8)(h, train)), 0.2)  # 4x4
        final_dim = self.ndf if self.conditional else 1
        h = _SNConv(final_dim, kernel=4, stride=1, padding=0)(h, train)  # (B,1,1,C)

        if self.conditional:
            assert y is not None
            y_emb = high_dim_embedding(y, 4)[:, None, None, :]  # (B,1,1,9)
            h = jnp.concatenate([h, y_emb], axis=-1)
            h = nn.leaky_relu(h, 0.2)
            h = _SNConv(ndf, kernel=1, stride=1, padding=0)(h, train)
            h = nn.leaky_relu(h, 0.2)
            h = _SNConv(ndf, kernel=1, stride=1, padding=0)(h, train)
            h = nn.leaky_relu(h, 0.2)
            h = _SNConv(1, kernel=1, stride=1, padding=0)(h, train)
        return h.reshape(x.shape[0])
