"""upfirdn2d + fused bias/leaky-relu — the StyleGAN2 primitive ops.

Capability parity with the reference's CUDA kernels
(/root/reference/deep3dmap/core/ops/csrc upfirdn2d / fused_bias_leakyrelu and
pnpmodules/stylegan2-pytorch/op/*.cu): upsample-pad-FIR-downsample expressed
as XLA ops (dilated depthwise convolution), which the TPU compiler fuses —
no custom kernel needed for speed-of-light here since the op is
bandwidth-bound and XLA emits a single fused conv.

Layout: NHWC.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def make_kernel(k) -> jnp.ndarray:
    k = jnp.asarray(k, jnp.float32)
    if k.ndim == 1:
        k = k[None, :] * k[:, None]
    k = k / k.sum()
    return k


def upfirdn2d(x: jnp.ndarray, kernel: jnp.ndarray, up: int = 1, down: int = 1,
              pad=(0, 0)) -> jnp.ndarray:
    """x (B, H, W, C); kernel (kh, kw); returns filtered/resampled NHWC.

    Semantics match the reference op: zero-insert upsample by ``up``, pad by
    ``pad`` (before, after), correlate with ``kernel``, subsample by ``down``.
    """
    B, H, W, C = x.shape
    kh, kw = kernel.shape
    pad0, pad1 = pad

    # upsample by zero insertion: use lhs_dilation in the conv
    k = jnp.flip(kernel, (0, 1))  # conv vs correlation: kernels here are
    # symmetric in practice (binomial), flip keeps exact parity anyway
    kern = jnp.tile(k[:, :, None, None], (1, 1, 1, C))  # (kh,kw,1,C) depthwise

    # lhs_dilation inserts zeros BETWEEN samples (length H*up - (up-1)); the
    # reference op zero-pads to H*up (trailing zeros) — add them to pad1
    pad1_eff = pad1 + (up - 1)
    y = lax.conv_general_dilated(
        x, kern,
        window_strides=(down, down),
        padding=((pad0, pad1_eff), (pad0, pad1_eff)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C)
    return y


def upsample2d(x, kernel, factor: int = 2):
    """StyleGAN2 upsample (op/upfirdn2d.py upsample semantics)."""
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2 + factor - 1
    pad1 = p // 2
    return upfirdn2d(x, kernel * (factor ** 2), up=factor, pad=(pad0, pad1))


def downsample2d(x, kernel, factor: int = 2):
    kh = kernel.shape[0]
    p = kh - factor
    pad0 = (p + 1) // 2
    pad1 = p // 2
    return upfirdn2d(x, kernel, down=factor, pad=(pad0, pad1))


def blur2d(x, kernel, pad):
    return upfirdn2d(x, kernel, pad=pad)


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = 2 ** 0.5):
    """Parity: fused_bias_leakyrelu CUDA op — bias add + leaky relu + gain.
    XLA fuses this chain into the producing matmul/conv."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale
