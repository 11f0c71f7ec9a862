"""Hard z-buffer grid-mesh depth rasterizer (Pallas TPU kernel).

The reference renders warped depth with the NMR CUDA triangle rasterizer
(/root/reference/deep3dmap/core/renderer/renderer_nr.py:116-125 render_depth
over the pixel-grid mesh; CUDA kernels in /root/reference/pnpmodules/
neural_renderer/neural_renderer/cuda/rasterize_cuda_kernel.cu).  The TPU
port's default is softmax-z-buffer splatting (renderer_nr.py here); this
module adds the *hard* rasterizer: the warped pixel grid is treated as
2(H-1)(W-1) triangles, rasterized with perspective-correct z interpolation
and a min z-buffer — sharp self-occlusion boundaries.

TPU-native design: no scatter.  Triangles are laid out (3, T) with T on the
128-lane axis; the kernel walks triangle chunks with a fori_loop and tests
each chunk against a tile of pixels as one dense (PT, CH) VPU computation,
folding a running min into the tile's z-buffer.  Everything is static-shape;
degenerate/behind-camera triangles are masked, not branched.

Gradients: hard rasterization is piecewise-constant in the coverage term, so
``raster_depth_st`` pairs the hard forward with the soft-splat backward
(straight-through) — sharp images, smooth optimization.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-7
_CH = 128     # triangles tested per loop step (lane-dim chunk; lane-aligned)
_PT = 1024    # pixels per tile


def _cdiv(a, b):
    return -(-a // b)


def grid_mesh_triangles(pix: jnp.ndarray, z: jnp.ndarray):
    """Build the pixel-grid quad mesh's triangles from projected vertices.

    pix (B, H, W, 2) pixel coords, z (B, H, W) camera depth ->
    xs, ys, zs each (B, 3, T) with T = 2*(H-1)*(W-1), padded to _CH.
    """
    B, H, W = z.shape
    px, py = pix[..., 0], pix[..., 1]

    def corners(a):
        return a[:, :-1, :-1], a[:, :-1, 1:], a[:, 1:, :-1], a[:, 1:, 1:]

    x00, x01, x10, x11 = corners(px)
    y00, y01, y10, y11 = corners(py)
    z00, z01, z10, z11 = corners(z)

    def tris(a00, a01, a10, a11):
        # triangle A: (v00, v01, v10); triangle B: (v11, v10, v01)
        ta = jnp.stack([a00, a01, a10], axis=1).reshape(B, 3, -1)
        tb = jnp.stack([a11, a10, a01], axis=1).reshape(B, 3, -1)
        return jnp.concatenate([ta, tb], axis=-1)

    xs, ys, zs = tris(x00, x01, x10, x11), tris(y00, y01, y10, y11), \
        tris(z00, z01, z10, z11)
    T = xs.shape[-1]
    Tpad = _cdiv(T, _CH) * _CH
    if Tpad != T:
        pad = ((0, 0), (0, 0), (0, Tpad - T))
        xs = jnp.pad(xs, pad, constant_values=-1e6)  # off-screen: never hit
        ys = jnp.pad(ys, pad, constant_values=-1e6)
        zs = jnp.pad(zs, pad, constant_values=1e6)
    return xs, ys, zs


def _raster_kernel(ybounds_ref, xs_ref, ys_ref, zs_ref, out_ref, *, W: int,
                   HW: int, background: float):
    tile = pl.program_id(1)
    n_chunks = xs_ref.shape[-1] // _CH

    lin = jax.lax.broadcasted_iota(jnp.int32, (_PT, 1), 0) + tile * _PT
    pxp = (lin % W).astype(jnp.float32)   # (PT, 1) pixel x
    pyp = (lin // W).astype(jnp.float32)  # (PT, 1) pixel y
    valid_pix = lin < HW
    # tile's pixel-row extent for chunk culling
    ty0 = (tile * _PT // W)
    ty1 = ((tile + 1) * _PT - 1) // W

    def body(ci, zbuf):
        # cull: skip chunks whose triangles cannot touch this tile's rows
        cy0 = ybounds_ref[0, 0, ci]
        cy1 = ybounds_ref[0, 1, ci]
        overlap = (cy1 >= ty0) & (cy0 <= ty1)

        def hit(zbuf):
            sl = pl.ds(pl.multiple_of(ci * _CH, _CH), _CH)
            x0 = xs_ref[0, 0, sl].reshape(1, _CH)
            x1 = xs_ref[0, 1, sl].reshape(1, _CH)
            x2 = xs_ref[0, 2, sl].reshape(1, _CH)
            y0 = ys_ref[0, 0, sl].reshape(1, _CH)
            y1 = ys_ref[0, 1, sl].reshape(1, _CH)
            y2 = ys_ref[0, 2, sl].reshape(1, _CH)
            z0 = zs_ref[0, 0, sl].reshape(1, _CH)
            z1 = zs_ref[0, 1, sl].reshape(1, _CH)
            z2 = zs_ref[0, 2, sl].reshape(1, _CH)

            denom = (y1 - y2) * (x0 - x2) + (x2 - x1) * (y0 - y2)  # (1, CH)
            ok = (jnp.abs(denom) > 1e-9) & (z0 > EPS) & (z1 > EPS) & (z2 > EPS)
            inv_d = 1.0 / jnp.where(ok, denom, 1.0)

            dx2 = pxp - x2  # (PT, CH)
            dy2 = pyp - y2
            l0 = ((y1 - y2) * dx2 + (x2 - x1) * dy2) * inv_d
            l1 = ((y2 - y0) * dx2 + (x0 - x2) * dy2) * inv_d
            l2 = 1.0 - l0 - l1
            inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0) & ok
            # perspective-correct depth: interpolate 1/z
            inv_z = l0 / z0 + l1 / z1 + l2 / z2
            zhit = 1.0 / jnp.maximum(inv_z, EPS)
            zhit = jnp.where(inside, zhit, jnp.inf)
            return jnp.minimum(zbuf, jnp.min(zhit, axis=1, keepdims=True))

        return jax.lax.cond(overlap, hit, lambda z: z, zbuf)

    zbuf = jnp.full((_PT, 1), jnp.inf, jnp.float32)
    zbuf = jax.lax.fori_loop(0, n_chunks, body, zbuf)
    zbuf = jnp.where(jnp.isfinite(zbuf), zbuf, background)
    row = jnp.where(valid_pix, zbuf, background).reshape(1, 1, _PT)
    out_ref[:, :, pl.ds(pl.multiple_of(tile * _PT, _PT), _PT)] = row


def raster_grid_depth_hard(points3d: jnp.ndarray, K: jnp.ndarray,
                           background: float, interpret: bool = False
                           ) -> jnp.ndarray:
    """Rasterize warped grid points (B, H, W, 3) into a hard-z-buffer depth
    map (B, H, W) seen through intrinsics K; uncovered pixels get
    ``background``."""
    B, H, W, _ = points3d.shape
    z = jnp.maximum(points3d[..., 2], EPS)
    proj = points3d / z[..., None]
    pix = (proj @ K.T)[..., :2]
    xs, ys, zs = grid_mesh_triangles(pix.astype(jnp.float32),
                                     z.astype(jnp.float32))

    HW = H * W
    HWpad = _cdiv(HW, _PT) * _PT
    n_tiles = HWpad // _PT
    Tpad = xs.shape[-1]
    n_chunks = Tpad // _CH

    # per-chunk pixel-row bounds for tile culling (int32, (B, 2, n_chunks))
    ymin = jnp.floor(ys.reshape(B, 3, n_chunks, _CH).min(axis=(1, 3)))
    ymax = jnp.ceil(ys.reshape(B, 3, n_chunks, _CH).max(axis=(1, 3)))
    ybounds = jnp.stack([ymin, ymax], axis=1).astype(jnp.int32)

    kernel = functools.partial(_raster_kernel, W=W, HW=HW,
                               background=float(background))
    tri_spec = pl.BlockSpec((1, 3, Tpad), lambda b, t: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_tiles),
        in_specs=[pl.BlockSpec((1, 2, n_chunks), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.SMEM),
                  tri_spec, tri_spec, tri_spec],
        # one resident row-block per batch item; tiles write lane slices
        out_specs=pl.BlockSpec((1, 1, HWpad), lambda b, t: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, HWpad), jnp.float32),
        interpret=interpret,
    )(ybounds, xs, ys, zs)
    return out[:, 0, :HW].reshape(B, H, W)


def splat_depth_soft(points3d: jnp.ndarray, K: jnp.ndarray, min_depth: float,
                     max_depth: float, beta: float = 20.0) -> jnp.ndarray:
    """Softmax-z-buffer bilinear point splatting (differentiable everywhere);
    the soft counterpart used for straight-through gradients."""
    b, h, w, _ = points3d.shape
    z = jnp.maximum(points3d[..., 2], EPS)
    proj = points3d / z[..., None]
    pix = (proj @ K.T)[..., :2]
    px, py = pix[..., 0].reshape(b, -1), pix[..., 1].reshape(b, -1)
    zf = z.reshape(b, -1)

    z_norm = (zf - min_depth) / max(max_depth - min_depth, 1e-6)
    z_norm = z_norm - jax.lax.stop_gradient(z_norm.min(axis=1, keepdims=True))
    wz = jnp.exp(-beta * z_norm)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    out_num = jnp.zeros((b, h * w))
    out_den = jnp.zeros((b, h * w))

    def scat(num, den, xi, yi, wgt):
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = jnp.clip(yi, 0, h - 1).astype(jnp.int32) * w + \
            jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        wgt = wgt * inb
        num = jax.vmap(lambda n, i, v: n.at[i].add(v))(num, idx, wgt * wz * zf)
        den = jax.vmap(lambda d, i, v: d.at[i].add(v))(den, idx, wgt * wz)
        return num, den

    wx = px - x0
    wy = py - y0
    for dx, dy, wgt in ((0, 0, (1 - wx) * (1 - wy)), (1, 0, wx * (1 - wy)),
                        (0, 1, (1 - wx) * wy), (1, 1, wx * wy)):
        out_num, out_den = scat(out_num, out_den, x0 + dx, y0 + dy, wgt)

    depth = out_num / jnp.maximum(out_den, EPS)
    covered = out_den > 1e-4
    depth = jnp.where(covered, depth, max_depth)
    return depth.reshape(b, h, w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def raster_depth_st(points3d, K, min_depth, max_depth, beta,
                    interpret=False):
    """Hard-z-buffer depth forward, soft-splat backward (straight-through).

    Sharp occlusion boundaries in the rendered depth; gradients w.r.t. the
    warped points come from the smooth splatting surrogate, matching how NMR
    pairs hard coverage with approximate gradients."""
    return raster_grid_depth_hard(points3d, K, background=max_depth,
                                  interpret=interpret)


def _st_fwd(points3d, K, min_depth, max_depth, beta, interpret):
    out = raster_grid_depth_hard(points3d, K, background=max_depth,
                                 interpret=interpret)
    return out, (points3d, K)


def _st_bwd(min_depth, max_depth, beta, interpret, res, g):
    points3d, K = res
    _, vjp = jax.vjp(
        lambda p: splat_depth_soft(p, K, min_depth, max_depth, beta),
        points3d)
    (dp,) = vjp(g)
    return dp, jnp.zeros_like(K)


raster_depth_st.defvjp(_st_fwd, _st_bwd)
