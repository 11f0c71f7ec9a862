"""Deformable sampling ops: deform conv v1/v2, deform RoI pool, MSDeformAttn.

Parity targets: /root/reference/deep3dmap/core/ops/csrc/pytorch/
{deform_conv.cpp, modulated_deform_conv.cpp, deform_roi_pool.cpp,
ms_deform_attn.cpp} (+ their cuda/ kernels).  The CUDA versions build an
im2col buffer with one thread per sampled tap and run cuBLAS on it; the
TPU-native formulation is the same algebra expressed as dense gathers +
one big MXU matmul:

    columns[n, kh*kw*C, Ho*Wo] = bilinear(x, base_grid + offsets)
    out = weight.reshape(Cout, -1) @ columns

Everything is static-shaped, fully differentiable through the gathers (no
custom VJP — XLA derives the scatter-add backward the atomicAdd kernels
hand-roll), and batched with vmap.  Layout NCHW to match the reference
wrapper contracts (core/ops/csrc/pytorch/pybind.cpp deform_conv_forward).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _bilinear_chw(feat, y, x):
    """feat (C, H, W); y, x (...) -> (C, ...). Zero outside (im2col rule:
    samples strictly outside the (-1, H)x(-1, W) band contribute nothing)."""
    H, W = feat.shape[-2:]
    valid = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx

    def g(yy, xx):
        return feat[:, yy.astype(jnp.int32), xx.astype(jnp.int32)]

    out = (g(y0, x0) * (hy * hx) + g(y0, x1) * (hy * lx) +
           g(y1, x0) * (ly * hx) + g(y1, x1) * (ly * lx))
    return out * valid


def _deform_columns(x, offset, mask, kernel_size, stride, padding, dilation,
                    deform_groups):
    """x (C, H, W), offset (2*dg*kh*kw, Ho, Wo), mask (dg*kh*kw, Ho, Wo)|None
    -> columns (kh*kw, C, Ho, Wo) sampled at deformed tap locations."""
    kh, kw = kernel_size
    sh, sw = stride
    ph, pw = padding
    dh, dw = dilation
    C, H, W = x.shape
    Ho, Wo = offset.shape[-2:]
    cg = C // deform_groups

    oy = jnp.arange(Ho) * sh - ph
    ox = jnp.arange(Wo) * sw - pw
    base_y = oy[:, None] + jnp.zeros((1, Wo))          # (Ho, Wo)
    base_x = ox[None, :] + jnp.zeros((Ho, 1))

    off = offset.reshape(deform_groups, kh * kw, 2, Ho, Wo)
    cols = []
    for k in range(kh * kw):
        ky, kx = divmod(k, kw)
        per_g = []
        for g in range(deform_groups):
            y = base_y + ky * dh + off[g, k, 0]
            xx = base_x + kx * dw + off[g, k, 1]
            sampled = _bilinear_chw(x[g * cg:(g + 1) * cg], y, xx)
            if mask is not None:
                sampled = sampled * mask.reshape(
                    deform_groups, kh * kw, Ho, Wo)[g, k]
            per_g.append(sampled)
        cols.append(jnp.concatenate(per_g, 0))
    return jnp.stack(cols, 0)  # (kh*kw, C, Ho, Wo)


def _deform_conv_single(x, offset, mask, weight, stride, padding, dilation,
                        groups, deform_groups):
    kh, kw = weight.shape[-2:]
    cols = _deform_columns(x, offset, mask, (kh, kw), stride, padding,
                           dilation, deform_groups)      # (K, C, Ho, Wo)
    K, C, Ho, Wo = cols.shape
    cout = weight.shape[0]
    cols = cols.transpose(1, 0, 2, 3).reshape(groups, (C // groups) * K,
                                              Ho * Wo)
    w = weight.reshape(groups, cout // groups, (C // groups) * kh * kw)
    # weight layout is (cout, cin/g, kh, kw) -> flatten matches cols' (c, k)
    out = jnp.einsum("gok,gkn->gon", w, cols,
                     preferred_element_type=jnp.float32)
    return out.reshape(cout, Ho, Wo)


@partial(jax.jit, static_argnames=("stride", "padding", "dilation", "groups",
                                   "deform_groups"))
def deform_conv2d(x, offset, weight, stride=1, padding=0, dilation=1,
                  groups: int = 1, deform_groups: int = 1):
    """Deformable convolution v1 (deform_conv.cpp).

    x (N, C, H, W); offset (N, 2*dg*kh*kw, Ho, Wo) as (dy, dx) pairs;
    weight (Cout, C/groups, kh, kw) -> (N, Cout, Ho, Wo)."""
    fn = partial(_deform_conv_single, mask=None, weight=weight,
                 stride=_pair(stride), padding=_pair(padding),
                 dilation=_pair(dilation), groups=groups,
                 deform_groups=deform_groups)
    return jax.vmap(lambda xi, oi: fn(xi, oi))(x, offset)


@partial(jax.jit, static_argnames=("stride", "padding", "dilation", "groups",
                                   "deform_groups"))
def modulated_deform_conv2d(x, offset, mask, weight, bias=None, stride=1,
                            padding=0, dilation=1, groups: int = 1,
                            deform_groups: int = 1):
    """Modulated deformable convolution v2 (modulated_deform_conv.cpp):
    adds a per-tap scalar mask (N, dg*kh*kw, Ho, Wo)."""
    fn = partial(_deform_conv_single, weight=weight, stride=_pair(stride),
                 padding=_pair(padding), dilation=_pair(dilation),
                 groups=groups, deform_groups=deform_groups)
    out = jax.vmap(lambda xi, oi, mi: fn(xi, oi, mi))(x, offset, mask)
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out


@partial(jax.jit, static_argnames=("output_size", "sampling_ratio"))
def deform_roi_pool(input, rois, offset, output_size, spatial_scale=1.0,
                    sampling_ratio: int = 2, gamma: float = 0.1):
    """Deformable RoI pooling (deform_roi_pool.cpp): RoIAlign whose bins are
    shifted by learned offsets scaled by gamma*(roi size).

    input (N, C, H, W); rois (R, 5) [b, x1, y1, x2, y2];
    offset (R, 2, out_h, out_w) or None -> (R, C, out_h, out_w)."""
    oh, ow = _pair(output_size)
    sr = max(sampling_ratio, 1)

    def one(roi, off):
        b = roi[0].astype(jnp.int32)
        x1, y1, x2, y2 = roi[1:] * spatial_scale
        rw = jnp.maximum(x2 - x1, 1.0)
        rh = jnp.maximum(y2 - y1, 1.0)
        bw, bh = rw / ow, rh / oh
        iy = jnp.arange(oh)
        ix = jnp.arange(ow)
        sy = (jnp.arange(sr) + 0.5) / sr
        # bin centers + intra-bin sample grid
        ys = y1 + (iy[:, None] + sy[None, :]) * bh          # (oh, sr)
        xs = x1 + (ix[:, None] + sy[None, :]) * bw          # (ow, sr)
        y = ys[:, None, :, None] + jnp.zeros((1, ow, 1, sr))
        x = xs[None, :, None, :] + jnp.zeros((oh, 1, sr, 1))
        if off is not None:
            y = y + gamma * rh * off[1][:, :, None, None]
            x = x + gamma * rw * off[0][:, :, None, None]
        feat = input[b]
        vals = _bilinear_chw(feat, y, x)                    # (C, oh, ow, sr, sr)
        return vals.mean((-1, -2))

    offs = offset if offset is not None else jnp.zeros(
        (rois.shape[0], 2, oh, ow), input.dtype)
    return jax.vmap(one)(rois, offs)


def ms_deform_attn(value, spatial_shapes, level_start_index,
                   sampling_locations, attention_weights):
    """Multi-scale deformable attention (ms_deform_attn.cpp, Deformable DETR).

    value (N, Lv, heads, C); spatial_shapes (L, 2) [(H, W)] (concrete host
    values — static under jit via closure); sampling_locations
    (N, Lq, heads, L, P, 2) normalized to [0, 1]; attention_weights
    (N, Lq, heads, L, P) -> (N, Lq, heads*C).

    The CUDA kernel does one thread per (query, head, point) bilinear tap;
    here each level is one vmapped gather batch and the weighted sum fuses.
    """
    shapes = [(int(h), int(w)) for h, w in spatial_shapes]
    starts = [int(s) for s in level_start_index]
    N, Lq, nh, C = value.shape[0], sampling_locations.shape[1], \
        value.shape[2], value.shape[3]
    out = jnp.zeros((N, Lq, nh, C), value.dtype)
    for lvl, (H, W) in enumerate(shapes):
        v = value[:, starts[lvl]:starts[lvl] + H * W]          # (N, HW, nh, C)
        v = v.transpose(0, 2, 3, 1).reshape(N, nh, C, H, W)
        loc = sampling_locations[:, :, :, lvl]                 # (N, Lq, nh, P, 2)
        # align_corners=False convention of the CUDA kernel
        x = loc[..., 0] * W - 0.5
        y = loc[..., 1] * H - 0.5

        def per_head(vh, yh, xh):                              # (C,H,W),(Lq,P)
            return _bilinear_chw(vh, yh, xh)                   # (C, Lq, P)

        sampled = jax.vmap(jax.vmap(per_head))(
            v, y.transpose(0, 2, 1, 3), x.transpose(0, 2, 1, 3))
        w = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        out = out + jnp.einsum("nhclp,nhlp->nlhc", sampled, w)
    return out.reshape(N, Lq, nh * C)
