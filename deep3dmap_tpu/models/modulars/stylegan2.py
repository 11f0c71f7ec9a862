"""StyleGAN2 generator + discriminator (NHWC, flax).

Capability parity with the vendored stylegan2-pytorch
(/root/reference/pnpmodules/stylegan2/stylegan2-pytorch/model.py): mapping
MLP with pixel-norm, modulated/demodulated convolutions, noise injection,
skip-connection ToRGB synthesis, blur-resampled up/downsampling
(ops/upfirdn2d.py), minibatch-stddev + residual discriminator.

TPU-native: modulated conv is an einsum-built per-sample kernel executed as a
grouped convolution (batch folded into feature groups) — all MXU; equalized
learning rate implemented as runtime weight scaling.
"""
from __future__ import annotations

import math
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.upfirdn2d import (
    blur2d,
    downsample2d,
    fused_leaky_relu,
    make_kernel,
    upsample2d,
)


def pixel_norm(x, eps=1e-8):
    return x * jax.lax.rsqrt(jnp.mean(x ** 2, axis=-1, keepdims=True) + eps)


class EqualDense(nn.Module):
    features: int
    lr_mul: float = 1.0
    use_bias: bool = True
    activation: bool = False

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        scale = (1.0 / math.sqrt(in_f)) * self.lr_mul
        w = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                       (in_f, self.features))
        out = x @ (w * scale)
        b = (self.param("bias", nn.initializers.zeros, (self.features,)) * self.lr_mul
             if self.use_bias else None)
        if self.activation:
            return fused_leaky_relu(out, b)
        if b is not None:
            out = out + b
        return out


class MappingNet(nn.Module):
    """StyleGAN2 mapping MLP; supports partial passes over layers
    [skip:depth] — layer 0 includes pixel-norm."""

    style_dim: int = 512
    n_mlp: int = 8
    lr_mlp: float = 0.01

    @nn.compact
    def __call__(self, x, depth: Optional[int] = None, skip: int = 0):
        end = self.n_mlp if depth is None else depth
        if skip == 0:
            x = pixel_norm(x)
        # instantiate all layers so the param tree is complete regardless of
        # the (static) depth/skip arguments
        layers = [EqualDense(self.style_dim, lr_mul=self.lr_mlp, activation=True,
                             name=f"dense_{i}") for i in range(self.n_mlp)]
        for i in range(skip, end):
            x = layers[i](x)
        return x


class ModulatedConv(nn.Module):
    features: int
    kernel: int = 3
    demodulate: bool = True
    up: bool = False
    down: bool = False
    blur_kernel: Sequence[int] = (1, 3, 3, 1)

    @nn.compact
    def __call__(self, x, style):
        """x (B, H, W, Cin); style (B, w_dim)."""
        B, H, W, Cin = x.shape
        k = self.kernel
        scale = 1.0 / math.sqrt(Cin * k * k)
        weight = self.param("weight", nn.initializers.normal(1.0),
                            (k, k, Cin, self.features))
        s = EqualDense(Cin, use_bias=True, name="modulation")(style) + 1.0  # (B,Cin)

        w = weight[None] * s[:, None, None, :, None] * scale  # (B,k,k,Cin,Cout)
        if self.demodulate:
            demod = jax.lax.rsqrt((w ** 2).sum(axis=(1, 2, 3)) + 1e-8)  # (B,Cout)
            w = w * demod[:, None, None, None, :]

        blur = make_kernel(self.blur_kernel)
        if self.up:
            # stride-2 transposed conv with per-sample kernels: correlation of
            # the 2x-dilated input with the spatially-flipped grouped kernel
            x = x.reshape(1, H, W, B * Cin)
            w_flip = jnp.flip(w, axis=(1, 2))
            y = jax.lax.conv_general_dilated(
                x, _group_weights(w_flip),
                window_strides=(1, 1), padding=((k - 1, k - 1), (k - 1, k - 1)),
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=B)
            y = y.reshape(B, y.shape[1], y.shape[2], self.features)
            # blur pads for the transposed-conv output (stylegan2 geometry)
            p = (len(self.blur_kernel) - 2) - (k - 1)
            y = blur2d(y, blur * 4.0, pad=((p + 1) // 2 + 1, p // 2 + 1))
        elif self.down:
            p = len(self.blur_kernel) - 2 + (k - 1)
            x = blur2d(x, blur, pad=((p + 1) // 2, p // 2))
            x = x.reshape(1, x.shape[1], x.shape[2], B * Cin)
            y = jax.lax.conv_general_dilated(
                x, _group_weights(w), window_strides=(2, 2), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=B)
            y = y.reshape(B, y.shape[1], y.shape[2], self.features)
        else:
            x = x.reshape(1, H, W, B * Cin)
            pad = k // 2
            y = jax.lax.conv_general_dilated(
                x, _group_weights(w), window_strides=(1, 1),
                padding=((pad, pad), (pad, pad)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=B)
            y = y.reshape(B, H, W, self.features)
        return y


def _group_weights(w):
    """(B,k,k,Cin,Cout) -> (k,k,Cin*B... ) HWIO for feature_group_count=B:
    groups along the INPUT channel dim; output channels ordered per group."""
    B, k, _, Cin, Cout = w.shape
    # HWIO with groups: I = Cin (per group), O = B*Cout (group-major)
    return jnp.transpose(w, (1, 2, 3, 0, 4)).reshape(k, k, Cin, B * Cout)


class StyledConv(nn.Module):
    features: int
    kernel: int = 3
    up: bool = False
    demodulate: bool = True

    @nn.compact
    def __call__(self, x, style, noise=None):
        y = ModulatedConv(self.features, self.kernel, up=self.up,
                          demodulate=self.demodulate, name="conv")(x, style)
        if noise is None:
            noise = jnp.zeros(y.shape[:3] + (1,))
        strength = self.param("noise_strength", nn.initializers.zeros, ())
        y = y + strength * noise
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return fused_leaky_relu(y, bias)


class ToRGB(nn.Module):
    up: bool = True

    @nn.compact
    def __call__(self, x, style, skip=None):
        y = ModulatedConv(3, 1, demodulate=False, name="conv")(x, style)
        y = y + self.param("bias", nn.initializers.zeros, (3,))
        if skip is not None:
            if self.up:
                skip = upsample2d(skip, make_kernel((1, 3, 3, 1)))
            y = y + skip
        return y


class Generator(nn.Module):
    """StyleGAN2 synthesis; returns image in [-1, 1] (NHWC)."""

    size: int = 128
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    lr_mlp: float = 0.01

    def channels(self):
        cm = self.channel_multiplier
        return {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm,
                128: 128 * cm, 256: 64 * cm, 512: 32 * cm, 1024: 16 * cm}

    @property
    def n_latent(self):
        log_size = int(math.log2(self.size))
        return log_size * 2 - 2

    @nn.nowrap
    def mapping_net(self) -> "MappingNet":
        """The mapping submodule definition; apply with
        ``params['mapping']`` for partial style_forward(depth=/skip=) passes
        (Gan2Shape latent projection, gan2shape.py:393-395, 537-542)."""
        return MappingNet(style_dim=self.style_dim, n_mlp=self.n_mlp,
                          lr_mlp=self.lr_mlp)

    @nn.compact
    def __call__(self, styles, input_is_latent: bool = False, noise=None,
                 rng: Optional[jax.Array] = None, return_latents: bool = False,
                 truncation: float = 1.0, truncation_latent=None):
        """styles: (B, style_dim) z or w, or (B, n_latent, style_dim) w+."""
        ch = self.channels()
        log_size = int(math.log2(self.size))
        n_latent = self.n_latent

        if not input_is_latent:
            w = MappingNet(style_dim=self.style_dim, n_mlp=self.n_mlp,
                           lr_mlp=self.lr_mlp, name="mapping")(styles)
        else:
            w = styles
        if truncation < 1.0 and truncation_latent is not None:
            w = truncation_latent + truncation * (w - truncation_latent)
        if w.ndim == 2:
            latent = jnp.repeat(w[:, None], n_latent, axis=1)  # (B, n_latent, D)
        else:
            latent = w
        B = latent.shape[0]

        if noise is None:
            if rng is None:
                rng = self.make_rng("noise") if self.has_rng("noise") else jax.random.PRNGKey(0)
            # noise resolutions: [4, 8, 8, 16, 16, ..., size, size]
            noise = []
            rng, sub = jax.random.split(rng)
            noise.append(jax.random.normal(sub, (B, 4, 4, 1)))
            r = 8
            while r <= self.size:
                for _ in range(2):
                    rng, sub = jax.random.split(rng)
                    noise.append(jax.random.normal(sub, (B, r, r, 1)))
                r *= 2

        const = self.param("input_const", nn.initializers.normal(1.0),
                           (1, 4, 4, ch[4]))
        x = jnp.repeat(const, B, axis=0)
        x = StyledConv(ch[4], name="conv1")(x, latent[:, 0], noise[0])
        skip = ToRGB(up=False, name="to_rgb1")(x, latent[:, 1])

        i = 1
        res = 8
        ni = 1
        while res <= self.size:
            x = StyledConv(ch[res], up=True, name=f"conv_{res}_up")(
                x, latent[:, i], noise[ni] if ni < len(noise) else None)
            x = StyledConv(ch[res], name=f"conv_{res}")(
                x, latent[:, i + 1], noise[ni + 1] if ni + 1 < len(noise) else None)
            skip = ToRGB(name=f"to_rgb_{res}")(x, latent[:, i + 2], skip)
            i += 2
            ni += 2
            res *= 2

        if return_latents:
            return skip, latent
        return skip


class _DiscBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        h = _equal_conv(x, cin, 3, name_scope=self, name="conv1")
        h = fused_leaky_relu(h, self.param("b1", nn.initializers.zeros, (cin,)))
        # downsample conv
        blur = make_kernel((1, 3, 3, 1))
        p3 = (4 - 2) + (3 - 1)  # blur pad for the k=3 downsample conv
        h = blur2d(h, blur, pad=((p3 + 1) // 2, p3 // 2))
        h = _equal_conv(h, self.features, 3, stride=2, padding="VALID",
                        name_scope=self, name="conv2")
        h = fused_leaky_relu(h, self.param("b2", nn.initializers.zeros, (self.features,)))

        p1 = (4 - 2) + (1 - 1)  # blur pad for the k=1 skip conv
        skip = blur2d(x, blur, pad=((p1 + 1) // 2, p1 // 2))
        skip = _equal_conv(skip, self.features, 1, stride=2, padding="VALID",
                           use_scale=True, name_scope=self, name="skip")
        return (h + skip) / math.sqrt(2)


def _equal_conv(x, features, kernel, stride=1, padding=None, use_scale=True,
                name_scope=None, name="conv"):
    cin = x.shape[-1]
    scale = 1.0 / math.sqrt(cin * kernel * kernel)
    w = name_scope.param(f"{name}_weight", nn.initializers.normal(1.0),
                         (kernel, kernel, cin, features))
    if padding is None:
        pad = kernel // 2
        padding = ((pad, pad), (pad, pad))
    return jax.lax.conv_general_dilated(
        x, w * (scale if use_scale else 1.0), window_strides=(stride, stride),
        padding=padding, dimension_numbers=("NHWC", "HWIO", "NHWC"))


class StyleDiscriminator(nn.Module):
    size: int = 128
    channel_multiplier: int = 2

    @nn.compact
    def __call__(self, x, return_features: bool = False):
        cm = self.channel_multiplier
        ch = {4: 512, 8: 512, 16: 512, 32: 512, 64: 256 * cm,
              128: 128 * cm, 256: 64 * cm, 512: 32 * cm, 1024: 16 * cm}
        log_size = int(math.log2(self.size))

        h = _equal_conv(x, ch[self.size], 1, name_scope=self, name="from_rgb")
        h = fused_leaky_relu(h, self.param("frgb_b", nn.initializers.zeros,
                                           (ch[self.size],)))
        features = []
        res = self.size
        while res > 4:
            h = _DiscBlock(ch[res // 2], name=f"block_{res}")(h)
            features.append(h)
            res //= 2

        # minibatch stddev
        B = h.shape[0]
        group = min(4, B)
        g = h.reshape(group, -1, h.shape[1], h.shape[2], h.shape[3])
        stddev = jnp.sqrt(g.var(axis=0) + 1e-8).mean(axis=(1, 2, 3), keepdims=True)
        stddev = jnp.tile(stddev, (group, h.shape[1], h.shape[2], 1))
        h = jnp.concatenate([h, stddev], axis=-1)

        h = _equal_conv(h, ch[4], 3, name_scope=self, name="final_conv")
        h = fused_leaky_relu(h, self.param("fc_b", nn.initializers.zeros, (ch[4],)))
        h = h.reshape(B, -1)
        h = EqualDense(ch[4], activation=True, name="final_dense")(h)
        out = EqualDense(1, name="out")(h)
        if return_features:
            return out, features
        return out
