"""PSPNet scene-parsing network (NHWC flax).

Parity: /root/reference/deep3dmap/models/parsing/pspnet.py:116 +
resnet_psp.py — dilated-resnet trunk + pyramid pooling module (1/2/3/6 bins)
+ per-pixel class logits.  Gan2Shape mask prior for non-face categories.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..builder import BACKBONES


def _cbr(x, ch, k=3, s=1, dilation=1):
    x = nn.Conv(ch, (k, k), strides=(s, s), kernel_dilation=(dilation, dilation),
                use_bias=False)(x)
    x = nn.GroupNorm(num_groups=min(8, ch))(x)
    return nn.relu(x)


class _PPM(nn.Module):
    bins: tuple = (1, 2, 3, 6)
    ch: int = 64

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        outs = [x]
        for b in self.bins:
            p = nn.avg_pool(x, (max(H // b, 1), max(W // b, 1)),
                            strides=(max(H // b, 1), max(W // b, 1)))
            p = _cbr(p, self.ch, 1)
            outs.append(jax.image.resize(p, (B, H, W, self.ch), "bilinear"))
        return jnp.concatenate(outs, -1)


@BACKBONES.register_module()
class PSPNet(nn.Module):
    n_classes: int = 21
    base: int = 32

    @nn.compact
    def __call__(self, x):
        b = self.base
        h = _cbr(x, b, 3, 2)
        h = _cbr(h, b * 2, 3, 2)
        h = _cbr(h, b * 4, 3, 2)       # 1/8
        h = _cbr(h, b * 8, 3, 1, dilation=2)   # dilated, keeps 1/8
        h = _cbr(h, b * 8, 3, 1, dilation=4)
        h = _PPM(ch=b * 2)(h)
        h = _cbr(h, b * 4, 3)
        out = nn.Conv(self.n_classes, (1, 1))(h)
        return jax.image.resize(out, (x.shape[0], x.shape[1], x.shape[2],
                                      self.n_classes), "bilinear")
