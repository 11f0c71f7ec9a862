"""Face-parsing BiSeNet (resnet18 context path) — checkpoint-importable.

The reference's Gan2Shape derives face masks from a *pretrained* BiSeNet
(/root/reference/deep3dmap/models/frameworks/gan2shape.py:313-333 loads the
public face-parsing checkpoint into models/parsing/bisenet.py:282).  The
compact ``bisenet.py`` here covers random-init pipeline runs; this module
reproduces the published architecture exactly so the released checkpoint
imports key-for-key (utils/torch_import.import_bisenet →
``tools/import_weights.py bisenet``).

Inference-mode network: BatchNorms are folded into the preceding convs at
import (exact in eval mode — the reference always runs it under no_grad/
eval, gan2shape.py:334-336), so convs carry biases and there is no norm
plumbing.  Padding is torch-symmetric (explicit), matching stride-2 conv
geometry bit-for-bit.

Structure (face-parsing.PyTorch layout):
  ContextPath: resnet18 -> feat8 (128ch, 1/8), feat16 (256, 1/16),
    feat32 (512, 1/32); global-avg head + two attention-refinement modules
    merge 32- and 16-stride context, upsampled (nearest) back to 1/8.
  FFM: fuse feat8 (spatial) with context via channel attention.
  Output head: 3x3 conv + 1x1 classifier (19 classes), bilinear to input.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..builder import BACKBONES


def _conv(x, ch, k, s, name, use_bias=True):
    pad = k // 2
    return nn.Conv(ch, (k, k), strides=(s, s), use_bias=use_bias,
                   padding=((pad, pad), (pad, pad)), name=name)(x)


def _maxpool_3x3_s2(x):
    """torch MaxPool2d(3, stride=2, padding=1)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (1, 1), (1, 1), (0, 0)))


def _nearest_to(x, h, w):
    return jax.image.resize(x, (x.shape[0], h, w, x.shape[-1]), "nearest")


class _Basic(nn.Module):
    """resnet18 BasicBlock, BN folded (convs carry bias)."""

    ch: int
    stride: int = 1
    down: bool = False

    @nn.compact
    def __call__(self, x):
        h = nn.relu(_conv(x, self.ch, 3, self.stride, "conv1"))
        h = _conv(h, self.ch, 3, 1, "conv2")
        if self.down:
            x = _conv(x, self.ch, 1, self.stride, "downsample")
        return nn.relu(x + h)


class _Resnet18(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.relu(_conv(x, 64, 7, 2, "conv1"))
        x = _maxpool_3x3_s2(x)
        for b in range(2):
            x = _Basic(64, name=f"layer1_{b}")(x)
        for b in range(2):
            x = _Basic(128, stride=2 if b == 0 else 1, down=b == 0,
                       name=f"layer2_{b}")(x)
        feat8 = x
        for b in range(2):
            x = _Basic(256, stride=2 if b == 0 else 1, down=b == 0,
                       name=f"layer3_{b}")(x)
        feat16 = x
        for b in range(2):
            x = _Basic(512, stride=2 if b == 0 else 1, down=b == 0,
                       name=f"layer4_{b}")(x)
        return feat8, feat16, x


class _ARM(nn.Module):
    """Attention refinement: ConvBNReLU then global-pool channel gate."""

    ch: int = 128

    @nn.compact
    def __call__(self, x):
        feat = nn.relu(_conv(x, self.ch, 3, 1, "conv"))
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.sigmoid(_conv(atten, self.ch, 1, 1, "conv_atten"))
        return feat * atten


@BACKBONES.register_module()
class BiSeNetFP(nn.Module):
    """Face-parsing BiSeNet; input (B, H, W, 3), output (B, H, W, n_classes)."""

    n_classes: int = 19

    @nn.compact
    def __call__(self, x):
        H, W = x.shape[1], x.shape[2]
        feat8, feat16, feat32 = _Resnet18(name="resnet")(x)

        avg = feat32.mean(axis=(1, 2), keepdims=True)
        avg = nn.relu(_conv(avg, 128, 1, 1, "conv_avg"))
        avg_up = jnp.broadcast_to(avg, feat32.shape[:3] + (128,))

        a32 = _ARM(name="arm32")(feat32) + avg_up
        a32 = _nearest_to(a32, feat16.shape[1], feat16.shape[2])
        a32 = nn.relu(_conv(a32, 128, 3, 1, "conv_head32"))

        a16 = _ARM(name="arm16")(feat16) + a32
        a16 = _nearest_to(a16, feat8.shape[1], feat8.shape[2])
        a16 = nn.relu(_conv(a16, 128, 3, 1, "conv_head16"))

        # FFM: feat8 is the spatial path (face-parsing variant)
        fcat = jnp.concatenate([feat8, a16], axis=-1)
        feat = nn.relu(_conv(fcat, 256, 1, 1, "ffm_convblk"))
        atten = feat.mean(axis=(1, 2), keepdims=True)
        atten = nn.relu(nn.Conv(64, (1, 1), use_bias=False, name="ffm_conv1")(atten))
        atten = nn.sigmoid(nn.Conv(256, (1, 1), use_bias=False, name="ffm_conv2")(atten))
        feat = feat * atten + feat

        out = nn.relu(_conv(feat, 256, 3, 1, "out_conv"))
        out = nn.Conv(self.n_classes, (1, 1), name="out_cls")(out)
        return jax.image.resize(out, (x.shape[0], H, W, self.n_classes), "bilinear")


# imagenet normalization used by the face-parsing checkpoint
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class FaceParser:
    """parse_mask-equivalent (gan2shape.py:336-363): category-specific
    region masks from parsing logits.

    Args:
        weights_path: .npz from ``tools/import_weights.py bisenet`` (key-
            matched real checkpoint) — random init otherwise (pipeline runs).
    """

    def __init__(self, weights_path: Optional[str] = None, n_classes: int = 19,
                 seed: int = 0):
        self.net = BiSeNetFP(n_classes=n_classes)
        if weights_path:
            data = np.load(weights_path, allow_pickle=True)
            self.params = jax.tree_util.tree_map(jnp.asarray, data["params"].item())
        else:
            self.params = jax.jit(self.net.init)(
                jax.random.PRNGKey(seed), jnp.zeros((1, 64, 64, 3)))
        self._apply = jax.jit(self.net.apply)

    def parse_mask(self, images, category: str = "face", out_size: Optional[int] = None):
        """images (B, H, W, 3) in [-1, 1] -> (B, S, S, 1) soft mask.

        Category semantics match the reference exactly (gan2shape.py:349-362):
        face: (all-classes>=1 except 16[cloth]) averaged with (classes 1..13);
        synface: classes 1..14; car/cat/church/horse: single PSP class ids.
        """
        size = 512 if category in ("face", "synface") else 473
        x = jax.image.resize(images, (images.shape[0], size, size, 3), "bilinear")
        if category in ("car", "cat"):
            x = (x / 2 + 0.5 - _IMAGENET_MEAN) / _IMAGENET_STD
        cls = jnp.argmax(self._apply(self.params, x), axis=-1)  # (B,S,S)
        if category == "face":
            mask_all = ((cls >= 1) & (cls != 16)).astype(jnp.float32)
            mask_face = ((cls >= 1) & (cls <= 13)).astype(jnp.float32)
            mask = (mask_all + mask_face) / 2.0
        elif category == "synface":
            mask = ((cls >= 1) & (cls <= 14)).astype(jnp.float32)
        else:
            class_id = {"car": 7, "cat": 8, "church": 1, "horse": 13}[category]
            mask = (cls == class_id).astype(jnp.float32)
        mask = mask[..., None]
        if out_size:
            mask = jax.image.resize(
                mask, (mask.shape[0], out_size, out_size, 1), "bilinear")
        return mask
