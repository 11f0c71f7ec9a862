"""Block-sparse 3D conv stacks: UNet3D / ConvGRU3D in active-block domain.

Block-granular re-design of the reference's torchsparse SPVCNN + sparse
ConvGRU (/root/reference/deep3dmap/models/modulars/sparse_cnn.py:74-221):
convolutions run as dense batched VALID convs on halo-padded active blocks
(ops/block_sparse.py), so compute scales with occupancy like the sparse
reference, while every matmul stays a static-shape dense conv on the MXU.

Semantics vs the dense-masked path (modulars/dense3d.py):
  * every conv sees true neighbor data via a 1-voxel halo gather (inactive
    neighbors read zeros — exactly the sparse conv's out-of-set behavior);
  * GroupNorm statistics are computed over *active blocks only* (padding
    slots excluded), the analogue of sparse BN over the active set;
  * stride-2 down / nearest-neighbor up stay inside each block (bs 8->4->2),
    so the block partition is stable across the whole UNet.

Input/output layout: (B, MAXB, bs, bs, bs, C) + a BlockSet.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.block_sparse import BlockSet, gather_halo


def _mask_slots(x, valid):
    return x * valid[:, :, None, None, None, None].astype(x.dtype)


class BlockGN(nn.Module):
    """GroupNorm over the active voxel set (valid blocks only)."""

    max_groups: int = 8
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, valid):
        x = x.astype(jnp.float32)  # stats in f32 even for bf16 conv stacks
        C = x.shape[-1]
        groups = min(self.max_groups, C)
        while C % groups != 0:
            groups -= 1
        gs = C // groups
        B, maxb = x.shape[0], x.shape[1]
        xg = x.reshape(B, maxb, -1, groups, gs)  # (B, MAXB, bs³, G, gs)
        w = valid[:, :, None, None, None].astype(x.dtype)
        denom = jnp.maximum((w * jnp.ones_like(xg[..., :1])).sum(
            axis=(1, 2, 4), keepdims=True) * gs, 1.0)
        mean = (xg * w).sum(axis=(1, 2, 4), keepdims=True) / denom
        var = (jnp.square(xg - mean) * w).sum(axis=(1, 2, 4), keepdims=True) / denom
        xn = (xg - mean) * jax.lax.rsqrt(var + self.eps)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        out = xn.reshape(x.shape) * scale + bias
        return _mask_slots(out, valid)


class BlockConv3D(nn.Module):
    """3³ conv on halo-padded blocks: halo gather -> batched VALID conv.

    ``dtype`` selects the conv compute dtype (bfloat16 halves both the halo
    gather bytes and the MXU cycles; params stay float32)."""

    out_ch: int
    stride: int = 1
    use_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, bset: BlockSet):
        B, maxb, bs = x.shape[0], x.shape[1], x.shape[2]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        h = gather_halo(x, bset._replace(bs=bs), halo=1)
        hs = h.shape[2]
        hb = h.reshape(B * maxb, hs, hs, hs, h.shape[-1])
        out = nn.Conv(self.out_ch, (3, 3, 3),
                      strides=(self.stride,) * 3,
                      padding="VALID", use_bias=self.use_bias,
                      dtype=self.dtype)(hb)
        os_ = out.shape[1]
        out = out.reshape(B, maxb, os_, os_, os_, self.out_ch)
        return _mask_slots(out, bset.valid)


class BlockConvBlock3D(nn.Module):
    out_ch: int
    stride: int = 1
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, bset):
        x = BlockConv3D(self.out_ch, stride=self.stride,
                        dtype=self.dtype)(x, bset)
        x = BlockGN()(x, bset.valid)
        return nn.relu(x)


class BlockResBlock3D(nn.Module):
    out_ch: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, bset):
        h = BlockConvBlock3D(self.out_ch, dtype=self.dtype)(x, bset)
        h = BlockConv3D(self.out_ch, dtype=self.dtype)(h, bset)
        h = BlockGN()(h, bset.valid)
        if x.shape[-1] != self.out_ch:
            B, maxb = x.shape[0], x.shape[1]
            sp = x.shape[2]
            xb = x.reshape(B * maxb, sp, sp, sp, x.shape[-1])
            xb = nn.Conv(self.out_ch, (1, 1, 1), use_bias=False,
                         dtype=self.dtype)(xb)
            x = xb.reshape(B, maxb, sp, sp, sp, self.out_ch)
        return nn.relu(x.astype(h.dtype) + h)


def _up2_block(x):
    """Nearest-neighbor 2x upsample inside each block."""
    x = jnp.repeat(x, 2, axis=2)
    x = jnp.repeat(x, 2, axis=3)
    return jnp.repeat(x, 2, axis=4)


class BlockUNet3D(nn.Module):
    """Two-down/two-up residual UNet over active blocks (dense3d.UNet3D's
    block-sparse counterpart; same capacity schedule, SPVCNN-style cr)."""

    out_ch: int
    cr: float = 1.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x, bset: BlockSet):
        cs = [max(int(c * self.cr), 8) for c in (32, 64, 128, 96, 96)]
        dt = self.dtype
        stem = BlockConvBlock3D(cs[0], dtype=dt)(x, bset)

        d1 = BlockConvBlock3D(cs[1], stride=2, dtype=dt)(stem, bset)
        d1 = BlockResBlock3D(cs[1], dtype=dt)(d1, bset)
        d2 = BlockConvBlock3D(cs[2], stride=2, dtype=dt)(d1, bset)
        d2 = BlockResBlock3D(cs[2], dtype=dt)(d2, bset)

        u1 = _up2_block(d2)
        u1 = BlockResBlock3D(cs[3], dtype=dt)(jnp.concatenate([u1, d1], axis=-1), bset)
        u2 = _up2_block(u1)
        u2 = BlockResBlock3D(cs[4], dtype=dt)(jnp.concatenate([u2, stem], axis=-1), bset)

        B, maxb, bs = u2.shape[0], u2.shape[1], u2.shape[2]
        ub = u2.reshape(B * maxb, bs, bs, bs, u2.shape[-1])
        out = nn.Conv(self.out_ch, (1, 1, 1), dtype=dt)(ub)
        out = out.reshape(B, maxb, bs, bs, bs, self.out_ch)
        out = out.astype(x.dtype)
        return _mask_slots(out, bset.valid)


class BlockConvGRU3D(nn.Module):
    """ConvGRU on active blocks (gating math of modulars/conv_gru3d.py).

    Gate convs run in ``dtype``; the state update itself stays in the input
    dtype (float32 hidden state across fragments)."""

    hidden_dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, h, x, bset: BlockSet):
        hx = jnp.concatenate([h, x], axis=-1)
        zr = BlockConv3D(2 * self.hidden_dim, use_bias=True, dtype=self.dtype,
                         name="convzr")(hx, bset)
        zr = zr.astype(h.dtype)
        z = nn.sigmoid(zr[..., :self.hidden_dim])
        r = nn.sigmoid(zr[..., self.hidden_dim:])
        rhx = jnp.concatenate([r * h, x], axis=-1)
        q = nn.tanh(BlockConv3D(self.hidden_dim, use_bias=True,
                                dtype=self.dtype,
                                name="convq")(rhx, bset).astype(h.dtype))
        out = (1.0 - z) * h + z * q
        return _mask_slots(out, bset.valid)
