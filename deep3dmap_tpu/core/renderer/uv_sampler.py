"""UV-space texture sampling — the TPU-native Pt3dRenderer.sample.

Capability parity with /root/reference/deep3dmap/core/renderer/
renderer_pt3d.py:32-120: unwrap the face texture by rendering the template UV
layout with texture coordinates at the projected vertex positions, masked by
normal-based vertex visibility.

TPU-first re-design: the template UV mesh is FIXED, so its rasterization
(triangle id + barycentric coordinates per texel) is precomputed ONCE on the
host (numpy).  The per-step device work collapses to static-shape gathers and
elementwise math — no runtime rasterizer at all:

    texel color = bilinear(img, Σ_k bary_k * face_project[tri_vert_k])
    texel mask  = any(vertex visible) per triangle   (renderer_pt3d.py:60-78)
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..all3dtrans.rotations import euler_angles_to_matrix
from ...ops.grid_sample import grid_sample_2d


class UVRasterization(NamedTuple):
    tri_id: jnp.ndarray    # (S, S) int32, -1 where empty
    bary: jnp.ndarray      # (S, S, 3) float32
    tri_verts: jnp.ndarray  # (T, 3) int32 vertex ids per triangle


def precompute_uv_rasterization(uvs: np.ndarray, triangles: np.ndarray,
                                tex_size: int) -> UVRasterization:
    """Rasterize template UV triangles onto a tex_size² grid (host, once).

    uvs: (N, 2) in [0, 1]; triangles: (T, 3) int.
    """
    uvs = np.asarray(uvs, np.float64)
    triangles = np.asarray(triangles, np.int64)
    S = tex_size
    tri_id = np.full((S, S), -1, np.int32)
    bary = np.zeros((S, S, 3), np.float32)

    pix = (uvs * (S - 1))
    for t, (a, b, c) in enumerate(triangles):
        pa, pb, pc = pix[a], pix[b], pix[c]
        xmin = max(int(np.floor(min(pa[0], pb[0], pc[0]))), 0)
        xmax = min(int(np.ceil(max(pa[0], pb[0], pc[0]))), S - 1)
        ymin = max(int(np.floor(min(pa[1], pb[1], pc[1]))), 0)
        ymax = min(int(np.ceil(max(pa[1], pb[1], pc[1]))), S - 1)
        if xmax < xmin or ymax < ymin:
            continue
        xs, ys = np.meshgrid(np.arange(xmin, xmax + 1), np.arange(ymin, ymax + 1))

        def cross2(u, v):
            # z-component of the 2D cross product (np.cross on 2-vectors is
            # deprecated since numpy 2.0)
            return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

        d = cross2(pb - pa, pc - pa)
        if abs(d) < 1e-12:
            continue
        p = np.stack([xs, ys], axis=-1).astype(np.float64)
        w0 = cross2(pb - p, pc - p) / d
        w1 = cross2(pc - p, pa - p) / d
        w2 = 1.0 - w0 - w1
        inside = (w0 >= -1e-9) & (w1 >= -1e-9) & (w2 >= -1e-9)
        yy, xx = ys[inside], xs[inside]
        tri_id[yy, xx] = t
        bary[yy, xx] = np.stack([w0[inside], w1[inside], w2[inside]], axis=-1)

    return UVRasterization(tri_id=jnp.asarray(tri_id), bary=jnp.asarray(bary),
                           tri_verts=jnp.asarray(triangles.astype(np.int32)))


def vertex_visibility(normals: jnp.ndarray, angles: jnp.ndarray,
                      lookview: jnp.ndarray) -> jnp.ndarray:
    """(B,) batched: visible where rotated normal · lookview >= 0
    (renderer_pt3d.py:52-57).  normals (N,3), angles (B,3), lookview (3,)."""
    R = euler_angles_to_matrix(angles, "XYZ")  # (B,3,3)
    n_rot = jnp.einsum("nj,bij->bni", normals, R)
    coefs = (n_rot * lookview[None, None]).sum(-1)
    return coefs >= 0  # (B, N)


def sample_uv_texture(rast: UVRasterization, imgs: jnp.ndarray,
                      face_project: jnp.ndarray, ver_visible: jnp.ndarray):
    """Sample per-texel colors from images at projected vertex positions.

    Args:
        rast: precomputed UV rasterization.
        imgs: (B, H, W, C) input images.
        face_project: (B, N, 2) projected vertex positions in [0,1] image
            units (y already flipped as in imgs2mesh.py:117-118).
        ver_visible: (B, N) bool vertex visibility.

    Returns (uvimg (B,S,S,C), uvmask (B,S,S,1)).
    """
    B, H, W, C = imgs.shape
    S = rast.tri_id.shape[0]
    tid = jnp.maximum(rast.tri_id, 0)                       # (S,S)
    tv = rast.tri_verts[tid]                                # (S,S,3) vertex ids
    covered = (rast.tri_id >= 0)

    def per_sample(img, fp, vis):
        v_uv = fp[tv]                                       # (S,S,3,2)
        uv = (rast.bary[..., None] * v_uv).sum(axis=2)      # (S,S,2) in [0,1]
        px = uv[..., 0] * (W - 1)
        py = uv[..., 1] * (H - 1)
        colors = grid_sample_2d(img, px.reshape(-1), py.reshape(-1)).reshape(S, S, C)
        # triangle visible iff any of its vertices visible (renderer_pt3d.py:60-78)
        tri_vis = vis[tv].any(axis=-1)                      # (S,S)
        mask = (tri_vis & covered).astype(img.dtype)[..., None]
        return colors * mask, mask

    import jax
    return jax.vmap(per_sample)(imgs, face_project, ver_visible)
