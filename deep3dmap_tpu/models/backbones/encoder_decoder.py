"""EDDeconv — encoder-decoder for depth/albedo prediction.

Parity: /root/reference/deep3dmap/models/backbones/encoder_decoder.py:13
(unsup3d EDDeconv): conv encoder to a latent vector, deconv decoder back to
full resolution, tanh output.  NHWC flax with resize-conv upsampling.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES


def _up2(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


@BACKBONES.register_module()
class EDDeconv(nn.Module):
    cout: int = 1
    nf: int = 32
    zdim: int = 256
    activation: str = "tanh"

    @nn.compact
    def __call__(self, x):
        """x (B, S, S, C) -> (B, S, S, cout)."""
        nf, z = self.nf, self.zdim
        S = x.shape[1]
        # encoder: S -> S/16 -> latent
        h = x
        for ch in (nf, nf * 2, nf * 4, nf * 8):
            h = nn.Conv(ch, (4, 4), strides=(2, 2), use_bias=False)(h)
            h = nn.leaky_relu(h, 0.2)
        # global conv to the latent: kernel spans the remaining spatial extent
        h = nn.Conv(z, (h.shape[1], h.shape[2]), padding="VALID", use_bias=False)(h)
        h = nn.relu(h)  # (B,1,1,z)

        # decoder: 1 -> 4 -> ... -> S
        h = nn.ConvTranspose(nf * 8, (4, 4), strides=(1, 1), padding="VALID")(h)
        h = nn.relu(h)  # 4x4
        res = 4
        chans = [nf * 8, nf * 4, nf * 2, nf, nf]
        ci = 0
        while res < S:
            h = _up2(h)
            ch = chans[min(ci, len(chans) - 1)]
            h = nn.Conv(ch, (3, 3), use_bias=False)(h)
            groups = min(8, ch)
            h = nn.GroupNorm(num_groups=groups)(h)
            h = nn.relu(h)
            res *= 2
            ci += 1
        h = nn.Conv(self.nf, (3, 3))(h)
        h = nn.relu(h)
        h = nn.Conv(self.cout, (5, 5))(h)
        if self.activation == "tanh":
            h = jnp.tanh(h)
        return h
