"""BiSeNet face-parsing network (NHWC flax).

Parity: /root/reference/deep3dmap/models/parsing/bisenet.py:282 — spatial
path (3 stride-2 convs) + context path (resnet-ish trunk with global context)
fused by attention refinement, per-pixel class logits.  Used by Gan2Shape to
derive face-region masks (gan2shape.py:313-363); weights loadable from .npz.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES


def _cbr(x, ch, k=3, s=1):
    x = nn.Conv(ch, (k, k), strides=(s, s), use_bias=False)(x)
    g = min(8, ch)
    x = nn.GroupNorm(num_groups=g)(x)
    return nn.relu(x)


class _ARM(nn.Module):
    """Attention refinement: global-pool gate."""

    ch: int

    @nn.compact
    def __call__(self, x):
        x = _cbr(x, self.ch)
        atten = x.mean(axis=(1, 2), keepdims=True)
        atten = nn.Conv(self.ch, (1, 1), use_bias=False)(atten)
        atten = nn.sigmoid(nn.GroupNorm(num_groups=min(8, self.ch))(atten))
        return x * atten


def _up_to(x, ref):
    import jax

    return jax.image.resize(x, (x.shape[0], ref.shape[1], ref.shape[2], x.shape[3]),
                            "bilinear")


@BACKBONES.register_module()
class BiSeNet(nn.Module):
    n_classes: int = 19
    base: int = 32

    @nn.compact
    def __call__(self, x):
        b = self.base
        # spatial path: 1/8 resolution, rich detail
        sp = _cbr(x, b, 7, 2)
        sp = _cbr(sp, b * 2, 3, 2)
        sp = _cbr(sp, b * 4, 3, 2)

        # context path: deeper trunk
        c = _cbr(x, b, 3, 2)
        c = _cbr(c, b * 2, 3, 2)
        c8 = _cbr(c, b * 4, 3, 2)
        c16 = _cbr(c8, b * 8, 3, 2)
        c32 = _cbr(c16, b * 16, 3, 2)

        g = c32.mean(axis=(1, 2), keepdims=True)
        a32 = _ARM(b * 16)(c32) + g
        a32 = _up_to(a32, c16)
        a16 = _ARM(b * 8)(c16)
        ctx = _cbr(jnp.concatenate([a16, a32], -1), b * 4)
        ctx = _up_to(ctx, sp)

        # feature fusion
        fused = jnp.concatenate([sp, ctx], -1)
        fused = _cbr(fused, b * 4, 1)
        atten = fused.mean(axis=(1, 2), keepdims=True)
        atten = nn.relu(nn.Conv(b, (1, 1))(atten))
        atten = nn.sigmoid(nn.Conv(b * 4, (1, 1))(atten))
        fused = fused + fused * atten

        out = nn.Conv(self.n_classes, (1, 1))(fused)
        return _up_to(out, x)
