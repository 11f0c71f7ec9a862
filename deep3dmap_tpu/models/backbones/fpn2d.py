"""MNASNet-style 2D feature-pyramid backbone (NHWC, flax).

Capability parity with the reference's MnasMulti
(/root/reference/deep3dmap/models/backbones/mnas_multi.py:22-77): an
MBConv trunk with three strided stages feeding a top-down FPN that emits
[C=24 @ 1/4, C=40 @ 1/8, C=80 @ 1/16] feature maps (alpha=1 depths).

TPU-native choices: NHWC layout, GroupNorm instead of BatchNorm (stateless,
batch-size independent — no running-stat plumbing through the functional
train step), bfloat16-friendly.

Import mode: the reference constructs its trunk from *pretrained* torchvision
MNASNet (mnas_multi.py:26 ``MNASNet(alpha, pretrained=True)``).  To load those
weights here, build with ``norm="none", torch_pad=True``: convs then carry a
bias (the eval-mode BatchNorm affine folds into the preceding conv exactly)
and strided convs use torch's symmetric k//2 padding instead of XLA SAME
(which pads asymmetrically at stride 2).  See utils/torch_import.py
``import_mnasnet_trunk``.

Note: BN folding is exact for *inference only* — the reference trains with
live BatchNorm, whereas ``norm="none"`` leaves the trunk unnormalized, so
fine-tuning an imported trunk directly would drift.  Import mode is intended
for frozen/inference backbones: set ``BACKBONE2D.FREEZE=True`` (NeuralRecon)
to stop-gradient the pyramid, or train from scratch with ``norm="gn"``.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES


def _pad(kernel: int, torch_pad: bool):
    """torch-style symmetric padding, or XLA SAME."""
    if torch_pad:
        p = kernel // 2
        return ((p, p), (p, p))
    return "SAME"


def _depths(alpha: float) -> list:
    """MNASNet channel scaling (asymmetric round-to-multiple-of-8)."""
    base = [32, 16, 24, 40, 80, 96, 192, 320]

    def _round(val, divisor=8, bias=0.9):
        new = max(divisor, int(val + divisor / 2) // divisor * divisor)
        return new if new >= bias * val else new + divisor

    return [_round(d * alpha) for d in base]


class _GN(nn.Module):
    @nn.compact
    def __call__(self, x):
        groups = min(8, x.shape[-1])
        while x.shape[-1] % groups != 0:
            groups -= 1
        # norm statistics always in float32 (params are f32, flax promotes)
        return nn.GroupNorm(num_groups=groups)(x)


class MBConv(nn.Module):
    """Inverted residual block: 1x1 expand -> kxk depthwise -> 1x1 project."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    expand: int = 3
    norm: str = "gn"
    torch_pad: bool = False
    dtype: object = None      # conv compute dtype (e.g. bfloat16); params f32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        bias = self.norm == "none"

        def _norm(h):
            return h if self.norm == "none" else _GN()(h)

        h = nn.Conv(mid, (1, 1), use_bias=bias, dtype=self.dtype)(x)
        h = nn.relu(_norm(h))
        h = nn.Conv(mid, (self.kernel, self.kernel), strides=(self.stride, self.stride),
                    padding=_pad(self.kernel, self.torch_pad),
                    feature_group_count=mid, use_bias=bias, dtype=self.dtype)(h)
        h = nn.relu(_norm(h))
        h = nn.Conv(self.out_ch, (1, 1), use_bias=bias, dtype=self.dtype)(h)
        h = _norm(h)
        if self.stride == 1 and in_ch == self.out_ch:
            h = h + x
        return h


class _Stack(nn.Module):
    out_ch: int
    kernel: int
    stride: int
    expand: int
    repeats: int
    norm: str = "gn"
    torch_pad: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = MBConv(self.out_ch, self.kernel, self.stride, self.expand,
                   self.norm, self.torch_pad, self.dtype)(x)
        for _ in range(self.repeats - 1):
            x = MBConv(self.out_ch, self.kernel, 1, self.expand,
                       self.norm, self.torch_pad, self.dtype)(x)
        return x


@BACKBONES.register_module()
class MnasFPN(nn.Module):
    """Returns pyramid [1/4 scale (fine), 1/8, 1/16 (coarse)] like the
    reference's ``outputs[::-1]`` ordering (mnas_multi.py:77)."""

    alpha: float = 1.0
    norm: str = "gn"          # "gn" | "none" (bias convs, for torch import)
    torch_pad: bool = False   # symmetric k//2 padding on strided convs
    dtype: object = None      # conv compute dtype ("bfloat16" ~ 2x on MXU);
                              # norms and outputs stay float32

    @nn.compact
    def __call__(self, x):
        d = _depths(self.alpha)
        bias = self.norm == "none"
        dt = self.dtype

        def _norm(h):
            return h if self.norm == "none" else _GN()(h)

        # stem: conv s2 + depthwise + project (mnasnet layers 0-7)
        h = nn.Conv(d[0], (3, 3), strides=(2, 2), use_bias=bias,
                    padding=_pad(3, self.torch_pad), dtype=dt)(x)
        h = nn.relu(_norm(h))
        h = nn.Conv(d[0], (3, 3), feature_group_count=d[0], use_bias=bias,
                    dtype=dt)(h)
        h = nn.relu(_norm(h))
        h = nn.Conv(d[1], (1, 1), use_bias=bias, dtype=dt)(h)
        h = _norm(h)
        # stage blocks (mnasnet layers 8,9,10)
        conv0 = _Stack(d[2], 3, 2, 3, 3, self.norm, self.torch_pad, dt)(h)      # 1/4,  24ch
        conv1 = _Stack(d[3], 5, 2, 3, 3, self.norm, self.torch_pad, dt)(conv0)  # 1/8,  40ch
        conv2 = _Stack(d[4], 5, 2, 6, 3, self.norm, self.torch_pad, dt)(conv1)  # 1/16, 80ch

        # top-down FPN
        final = d[4]
        intra = nn.Conv(final, (1, 1), use_bias=False, dtype=dt)(conv2)
        out_coarse = intra

        up = jnp.repeat(jnp.repeat(intra, 2, axis=1), 2, axis=2)
        intra = up + nn.Conv(final, (1, 1), dtype=dt)(conv1)
        out_mid = nn.Conv(d[3], (3, 3), use_bias=False, dtype=dt)(intra)

        up = jnp.repeat(jnp.repeat(intra, 2, axis=1), 2, axis=2)
        intra = up + nn.Conv(final, (1, 1), dtype=dt)(conv0)
        out_fine = nn.Conv(d[2], (3, 3), use_bias=False, dtype=dt)(intra)

        f32 = jnp.float32
        return [out_fine.astype(f32), out_mid.astype(f32),
                out_coarse.astype(f32)]
