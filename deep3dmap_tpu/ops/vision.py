"""Dense-vision op family: CARAFE, masked conv, correlation, TIN shift,
PSA mask, border align, corner pool.

Parity targets: /root/reference/deep3dmap/core/ops/csrc/pytorch/
{carafe.cpp, carafe_naive.cpp, masked_conv2d.cpp, correlation.cpp,
tin_shift.cpp, psamask.cpp, border_align.cpp, corner_pool.cpp} and their
cuda/ kernels.  Each CUDA kernel is a hand-scheduled per-output-element
loop; on TPU they all reduce to static gathers, rolls, and scans that XLA
fuses, with backward derived automatically.  Layout NCHW to match the
reference call contracts.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# CARAFE — content-aware reassembly upsampling
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kernel_size", "group_size",
                                   "scale_factor"))
def carafe(features, masks, kernel_size: int = 5, group_size: int = 1,
           scale_factor: int = 2):
    """CARAFE reassembly (carafe_cuda.cu CARAFEForward).

    features (N, C, H, W); masks (N, group*k*k, sH, sW) — per-output-pixel
    normalized k x k kernels -> (N, C, sH, sW).  Output pixel (i, j) is the
    mask-weighted sum of the k x k source neighborhood centred at
    (i // s, j // s)."""
    N, C, H, W = features.shape
    s, k = scale_factor, kernel_size
    r = k // 2
    sH, sW = H * s, W * s
    cg = C // group_size

    oy = jnp.arange(sH) // s
    ox = jnp.arange(sW) // s
    m = masks.reshape(N, group_size, k * k, sH, sW)
    out = jnp.zeros((N, C, sH, sW), features.dtype)
    for t in range(k * k):
        dy, dx = divmod(t, k)
        yy = oy + (dy - r)
        xx = ox + (dx - r)
        valid = ((yy >= 0) & (yy < H))[:, None] & ((xx >= 0) & (xx < W))[None]
        src = features[:, :, jnp.clip(yy, 0, H - 1)[:, None],
                       jnp.clip(xx, 0, W - 1)[None, :]]      # (N, C, sH, sW)
        w = m[:, :, t]                                       # (N, g, sH, sW)
        w = jnp.repeat(w, cg, axis=1)
        out = out + src * w * valid
    return out


def carafe_naive(features, masks, kernel_size: int = 5, group_size: int = 1,
                 scale_factor: int = 2):
    """carafe_naive.cpp computes the same map without the staged buffers."""
    return carafe(features, masks, kernel_size, group_size, scale_factor)


# ---------------------------------------------------------------------------
# Masked conv
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("padding",))
def masked_conv2d(x, mask, weight, bias=None, padding: int = 1):
    """masked_conv2d.cpp: 3x3 stride-1 conv evaluated only where
    mask > 0 (zeros elsewhere).  The CUDA path gathers masked columns to
    shrink the GEMM; on TPU the dense conv is already MXU-shaped, so compute
    everywhere and select — same outputs, better tiling.

    x (N, C, H, W); mask (N, H, W); weight (Cout, C, kh, kw)."""
    out = jax.lax.conv_general_dilated(
        x, weight, window_strides=(1, 1),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias[None, :, None, None]
    return out * (mask[:, None] > 0)


# ---------------------------------------------------------------------------
# Correlation (FlowNet / spatial correlation sampler)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("kernel_size", "max_displacement",
                                   "stride", "padding", "dilation",
                                   "dilation_patch"))
def correlation(input1, input2, kernel_size: int = 1,
                max_displacement: int = 1, stride: int = 1, padding: int = 0,
                dilation: int = 1, dilation_patch: int = 1):
    """correlation.cpp forward: output (N, pH, pW, oH, oW) where
    patch = 2*max_displacement+1 and
    out[n, pi, pj, i, j] = sum_{c, u, v} I1[n, c, y+u, x+v] *
                           I2[n, c, y+u+dy, x+v+dx]
    with (dy, dx) the patch displacement scaled by dilation_patch.  Each
    displacement is one shifted elementwise product reduced over (c, k, k) —
    a roll + conv-style reduction XLA vectorizes; no per-thread loops."""
    N, C, H, W = input1.shape
    k, d = kernel_size, max_displacement
    patch = 2 * d + 1
    pad = padding
    x1 = jnp.pad(input1, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    x2 = jnp.pad(input2, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    Hp, Wp = x1.shape[-2:]
    kr = (k - 1) * dilation // 2 if k > 1 else 0
    oH = (Hp - 2 * kr) // stride
    oW = (Wp - 2 * kr) // stride

    ys = kr + jnp.arange(oH) * stride
    xs = kr + jnp.arange(oW) * stride
    outs = []
    for pi in range(patch):
        for pj in range(patch):
            dy = (pi - d) * dilation_patch
            dx = (pj - d) * dilation_patch
            # product of I1 with displaced I2, zero where displaced OOB
            shifted = jnp.roll(x2, (-dy, -dx), axis=(-2, -1))
            vy = (jnp.arange(Hp) + dy >= 0) & (jnp.arange(Hp) + dy < Hp)
            vx = (jnp.arange(Wp) + dx >= 0) & (jnp.arange(Wp) + dx < Wp)
            prod = x1 * shifted * (vy[:, None] & vx[None, :])
            acc = jnp.zeros((N, Hp, Wp), prod.dtype)
            red = prod.sum(1)                                 # sum over C
            for u in range(k):
                for v in range(k):
                    du = (u - k // 2) * dilation
                    dv = (v - k // 2) * dilation
                    acc = acc + jnp.roll(red, (-du, -dv), axis=(-2, -1))
            outs.append(acc[:, ys[:, None], xs[None, :]])
    return jnp.stack(outs, 1).reshape(N, patch, patch, oH, oW)


# ---------------------------------------------------------------------------
# TIN shift
# ---------------------------------------------------------------------------

@jax.jit
def tin_shift(x, shift):
    """tin_shift_cuda_kernel.cuh: temporal group shift.

    x (N, T, C, HW); shift (N, G) int — channel group g reads from frame
    t - shift[n, g], zero outside [0, T).  A take_along_axis gather."""
    N, T, C, HW = x.shape
    G = shift.shape[1]
    cg = C // G
    src_t = (jnp.arange(T)[None, :, None] -
             jnp.repeat(shift, cg, axis=1)[:, None, :])       # (N, T, C)
    valid = (src_t >= 0) & (src_t < T)
    idx = jnp.clip(src_t, 0, T - 1)[..., None]
    out = jnp.take_along_axis(x, jnp.broadcast_to(idx, x.shape), axis=1)
    return out * valid[..., None]


# ---------------------------------------------------------------------------
# PSA mask
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("psa_type", "mask_h", "mask_w"))
def psamask(input, psa_type: str, mask_h: int, mask_w: int):
    """psamask_cuda_kernel.cuh: expand a per-pixel (mask_h x mask_w)
    relation window into a dense (H*W)-way relation map.

    input (N, mask_h*mask_w, H, W) -> (N, H*W, H, W).
    'collect':   out[n, p, h, w] = in[n, widx(p, h, w), h, w]
    'distribute' is the flattened transpose of collect (verified against the
    kernel's index algebra: both read mask[c(p, q), q])."""
    N, _, H, W = input.shape
    hh, hw = (mask_h - 1) // 2, (mask_w - 1) // 2
    p_h = jnp.arange(H * W) // W
    p_w = jnp.arange(H * W) % W
    dh = p_h[:, None, None] - jnp.arange(H)[None, :, None] + hh
    dw = p_w[:, None, None] - jnp.arange(W)[None, None, :] + hw
    valid = (dh >= 0) & (dh < mask_h) & (dw >= 0) & (dw < mask_w)
    cidx = jnp.clip(dh, 0, mask_h - 1) * mask_w + jnp.clip(dw, 0, mask_w - 1)
    collect = jnp.take_along_axis(
        input, jnp.broadcast_to(cidx[None], (N, H * W, H, W)), axis=1)
    collect = collect * valid[None]
    if psa_type == "collect":
        return collect
    flat = collect.reshape(N, H * W, H * W)
    return flat.transpose(0, 2, 1).reshape(N, H * W, H, W)


# ---------------------------------------------------------------------------
# Border align
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("pool_size",))
def border_align(input, boxes, pool_size: int = 10):
    """border_align_cuda_kernel.cuh: pool the 4 borders of each box.

    input (N, 4C, H, W) channel-grouped [top, left, bottom, right];
    boxes (N, B, 4) xyxy -> (N, C, B, 4): max over pool_size+1 bilinear
    samples walking each border (top: (x1,y1)->+x, left: (x1,y1)->+y,
    bottom: (x2,y2)->-x, right: (x2,y2)->-y)."""
    N, C4, H, W = input.shape
    C = C4 // 4
    steps = jnp.arange(pool_size + 1, dtype=input.dtype)

    def one_image(feat, bxs):                                  # (4C,H,W),(B,4)
        x1, y1, x2, y2 = bxs[:, 0], bxs[:, 1], bxs[:, 2], bxs[:, 3]
        bw = (x2 - x1) / pool_size
        bh = (y2 - y1) / pool_size
        zeros = jnp.zeros_like(bw)
        # (4, B, S) sample tracks per border
        sx = jnp.stack([x1[:, None] + steps * bw[:, None],
                        x1[:, None] + steps * zeros[:, None],
                        x2[:, None] - steps * bw[:, None],
                        x2[:, None] - steps * zeros[:, None]])
        sy = jnp.stack([y1[:, None] + steps * zeros[:, None],
                        y1[:, None] + steps * bh[:, None],
                        y2[:, None] - steps * zeros[:, None],
                        y2[:, None] - steps * bh[:, None]])

        def border(e):
            f = jax.lax.dynamic_slice_in_dim(feat, e * C, C, axis=0)
            vals = _bilinear_nchw(f, sy[e], sx[e])             # (C, B, S)
            return vals.max(-1)                                # (C, B)

        return jnp.stack([border(e) for e in range(4)], -1)    # (C, B, 4)

    return jax.vmap(one_image)(input, boxes)


def _bilinear_nchw(feat, y, x):
    H, W = feat.shape[-2:]
    valid = (y > -1.0) & (y < H) & (x > -1.0) & (x < W)
    y = jnp.clip(y, 0.0, H - 1)
    x = jnp.clip(x, 0.0, W - 1)
    y0, x0 = jnp.floor(y), jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    ly, lx = y - y0, x - x0
    hy, hx = 1.0 - ly, 1.0 - lx

    def g(yy, xx):
        return feat[:, yy.astype(jnp.int32), xx.astype(jnp.int32)]

    out = (g(y0, x0) * (hy * hx) + g(y0, x1) * (hy * lx) +
           g(y1, x0) * (ly * hx) + g(y1, x1) * (ly * lx))
    return out * valid


# ---------------------------------------------------------------------------
# Corner pool
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("mode",))
def corner_pool(x, mode: str):
    """corner_pool.cpp: directional cumulative max over H or W.

    x (N, C, H, W); mode in {top, bottom, left, right}.  top pools from the
    bottom upward (out[i] = max(x[i:])), bottom from the top downward, left
    from the right leftward, right from the left rightward — a reversed
    associative cummax scan (log-depth on TPU vs the kernel's serial loop)."""
    axis, rev = {"top": (2, True), "bottom": (2, False),
                 "left": (3, True), "right": (3, False)}[mode]
    if rev:
        x = jnp.flip(x, axis)
    out = jax.lax.associative_scan(jnp.maximum, x, axis=axis)
    return jnp.flip(out, axis) if rev else out
