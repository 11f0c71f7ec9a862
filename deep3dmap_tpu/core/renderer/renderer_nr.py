"""Grid-mesh depth renderer — TPU-native replacement for neural_renderer.

Capability parity with /root/reference/deep3dmap/core/renderer/
renderer_nr.py:12-277 (NrRenderer): pinhole unprojection of depth maps,
rigid view warping (rotation about a canonical center + translation),
depth re-rendering under a new view, normals-from-depth, yaw/view sweeps for
visualization, and view-warped image resampling.

TPU-first re-design of the hot op: the reference rasterizes the warped pixel
grid as a triangle mesh with the NMR CUDA rasterizer (render_depth).  Here
the warped depth is rendered by *softmax-z-buffer point splatting*: each
warped 3D pixel projects into the target view and deposits exp(-beta*z)
weighted depth onto its 4 bilinear-neighbor texels via scatter-add — fully
differentiable, static-shape, O(H*W).  Nearer points dominate as beta grows
(a soft z-buffer).  With ``raster_mode='hard'`` the Pallas hard z-buffer
triangle rasterizer (ops/raster_pallas.py) renders instead: sharp
self-occlusion boundaries forward, soft-splat gradients backward
(straight-through), matching NMR's hard-coverage/approx-gradient pairing.
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ...ops.grid_sample import grid_sample_2d

EPS = 1e-7


def get_grid(b: int, H: int, W: int, normalize: bool = True) -> jnp.ndarray:
    """(b, H, W, 2) pixel grid in (x, y) order (renderer utils get_grid)."""
    if normalize:
        h_range = jnp.linspace(-1, 1, H)
        w_range = jnp.linspace(-1, 1, W)
    else:
        h_range = jnp.arange(0, H, dtype=jnp.float32)
        w_range = jnp.arange(0, W, dtype=jnp.float32)
    hh, ww = jnp.meshgrid(h_range, w_range, indexing="ij")
    grid = jnp.stack([ww, hh], -1)  # flip (h,w) -> (x,y)
    return jnp.broadcast_to(grid[None], (b, H, W, 2))


def get_rotation_matrix(tx, ty, tz) -> jnp.ndarray:
    """Batched R = Rz @ Ry @ Rx from per-axis angles (renderer utils)."""
    zeros = jnp.zeros_like(tx)
    ones = jnp.ones_like(tx)
    m_x = jnp.stack([ones, zeros, zeros,
                     zeros, jnp.cos(tx), -jnp.sin(tx),
                     zeros, jnp.sin(tx), jnp.cos(tx)], -1).reshape(-1, 3, 3)
    m_y = jnp.stack([jnp.cos(ty), zeros, jnp.sin(ty),
                     zeros, ones, zeros,
                     -jnp.sin(ty), zeros, jnp.cos(ty)], -1).reshape(-1, 3, 3)
    m_z = jnp.stack([jnp.cos(tz), -jnp.sin(tz), zeros,
                     jnp.sin(tz), jnp.cos(tz), zeros,
                     zeros, zeros, ones], -1).reshape(-1, 3, 3)
    return m_z @ m_y @ m_x


def get_transform_matrices(view: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """view (B, 6|5|3): rx, ry, rz[, tx, ty[, tz]] -> (R (B,3,3), t (B,1,3))."""
    b = view.shape[0]
    rx, ry, rz = view[:, 0], view[:, 1], view[:, 2]
    if view.shape[1] == 6:
        trans_xyz = view[:, 3:].reshape(b, 1, 3)
    elif view.shape[1] == 5:
        trans_xyz = jnp.concatenate([view[:, 3:].reshape(b, 1, 2),
                                     jnp.zeros((b, 1, 1))], 2)
    else:
        trans_xyz = jnp.zeros((b, 1, 3))
    return get_rotation_matrix(rx, ry, rz), trans_xyz


class NrRenderer:
    """Stateless-config renderer; all methods are pure jnp functions."""

    def __init__(self, cfgs: dict, image_size: int):
        self.image_size = image_size
        self.min_depth = cfgs.get("min_depth", 0.9)
        self.max_depth = cfgs.get("max_depth", 1.1)
        self.rot_center_depth = cfgs.get(
            "rot_center_depth", (self.min_depth + self.max_depth) / 2)
        self.fov = cfgs.get("fov", 10)
        self.splat_beta = cfgs.get("splat_beta", 20.0)
        self.raster_mode = cfgs.get("raster_mode", "splat")  # or "hard"

        fx = (image_size - 1) / 2 / math.tan(self.fov / 2 * math.pi / 180)
        cx = (image_size - 1) / 2
        K = jnp.asarray([[fx, 0.0, cx], [0.0, fx, cx], [0.0, 0.0, 1.0]])
        self.K_origin = K
        self.K = K
        self.inv_K = jnp.linalg.inv(K)

    def downscale_K(self, downscale: float):
        if downscale > 1:
            K = self.K_origin.at[:2].multiply(1.0 / downscale)
            self.K = K
            self.inv_K = jnp.linalg.inv(K)

    # -- geometry ----------------------------------------------------------
    def rotate_pts(self, pts, rot_mat):
        centroid = jnp.asarray([0.0, 0.0, self.rot_center_depth]).reshape(1, 1, 3)
        return (pts - centroid) @ jnp.swapaxes(rot_mat, -1, -2) + centroid

    def translate_pts(self, pts, trans_xyz):
        return pts + trans_xyz

    def depth_to_3d_grid(self, depth):
        """depth (B, H, W) -> camera-space points (B, H, W, 3)."""
        b, h, w = depth.shape
        grid_2d = get_grid(b, h, w, normalize=False)
        grid_3d = jnp.concatenate([grid_2d, jnp.ones((b, h, w, 1))], -1)
        return (grid_3d @ self.inv_K.T) * depth[..., None]

    def grid_3d_to_2d(self, grid_3d):
        """(B,H,W,3) -> normalized [-1,1] pixel coords (B,H,W,2)."""
        b, h, w, _ = grid_3d.shape
        grid_2d = grid_3d / jnp.maximum(grid_3d[..., 2:], EPS)
        grid_2d = (grid_2d @ self.K.T)[..., :2]
        WH = jnp.asarray([w - 1, h - 1], jnp.float32).reshape(1, 1, 1, 2)
        return grid_2d / WH * 2.0 - 1.0

    def get_warped_3d_grid(self, depth, rot_mat, trans_xyz):
        b, h, w = depth.shape
        g = self.depth_to_3d_grid(depth).reshape(b, -1, 3)
        g = self.rotate_pts(g, rot_mat)
        g = self.translate_pts(g, trans_xyz)
        return g.reshape(b, h, w, 3)

    def get_inv_warped_3d_grid(self, depth, rot_mat, trans_xyz):
        b, h, w = depth.shape
        g = self.depth_to_3d_grid(depth).reshape(b, -1, 3)
        g = self.translate_pts(g, -trans_xyz)
        g = self.rotate_pts(g, jnp.swapaxes(rot_mat, -1, -2))
        return g.reshape(b, h, w, 3)

    def get_warped_2d_grid(self, depth, rot_mat, trans_xyz):
        return self.grid_3d_to_2d(self.get_warped_3d_grid(depth, rot_mat, trans_xyz))

    def get_inv_warped_2d_grid(self, depth, rot_mat, trans_xyz):
        return self.grid_3d_to_2d(self.get_inv_warped_3d_grid(depth, rot_mat, trans_xyz))

    # -- splat depth rendering (replaces NMR render_depth) -----------------
    def splat_depth(self, points3d):
        """Render warped 3D pixels (B, H, W, 3) to a target-view depth map via
        softmax-z-buffer bilinear splatting (ops.raster_pallas shares the
        implementation for the straight-through backward)."""
        from ...ops.raster_pallas import splat_depth_soft

        return splat_depth_soft(points3d, self.K, self.min_depth,
                                self.max_depth, self.splat_beta)

    def raster_depth(self, points3d):
        """Hard z-buffer triangle rasterization with straight-through
        gradients (Pallas kernel; interpret mode off-TPU)."""
        from ...ops.raster_pallas import raster_depth_st

        interpret = jax.default_backend() != "tpu"
        return raster_depth_st(points3d, self.K, self.min_depth,
                               self.max_depth, self.splat_beta, interpret)

    def warp_canon_depth(self, canon_depth, rot_mat, trans_xyz):
        """Canonical depth -> depth seen from the transformed view
        (renderer_nr.py:116-125)."""
        warped_pts = self.get_warped_3d_grid(canon_depth, rot_mat, trans_xyz)
        if self.raster_mode == "hard":
            warped_depth = self.raster_depth(warped_pts)
        else:
            warped_depth = self.splat_depth(warped_pts)
        margin = (self.max_depth - self.min_depth) / 2
        return jnp.clip(warped_depth, self.min_depth - margin, self.max_depth + margin)

    # -- normals -----------------------------------------------------------
    def get_normal_from_depth(self, depth):
        b, h, w = depth.shape
        g = self.depth_to_3d_grid(depth)
        tu = g[:, 1:-1, 2:] - g[:, 1:-1, :-2]
        tv = g[:, 2:, 1:-1] - g[:, :-2, 1:-1]
        normal = jnp.cross(tu, tv)
        zero = jnp.broadcast_to(jnp.asarray([0.0, 0, 1]), (b, h - 2, 1, 3))
        normal = jnp.concatenate([zero, normal, zero], 2)
        zero_row = jnp.broadcast_to(jnp.asarray([0.0, 0, 1]), (b, 1, w, 3))
        normal = jnp.concatenate([zero_row, normal, zero_row], 1)
        return normal / (jnp.linalg.norm(normal, axis=-1, keepdims=True) + EPS)

    # -- image warping -----------------------------------------------------
    def _grid_sample_images(self, im, grid2d, mode="bilinear"):
        """im (B, H, W, C); grid2d (B, H, W, 2) in [-1,1]."""
        B, H, W, C = im.shape

        def one(img, g):
            px = (g[..., 0] + 1) * 0.5 * (W - 1)
            py = (g[..., 1] + 1) * 0.5 * (H - 1)
            return grid_sample_2d(img, px.reshape(-1), py.reshape(-1),
                                  mode=mode).reshape(H, W, C)

        return jax.vmap(one)(im, grid2d)

    def render_given_view(self, im, depth, view, mask=None):
        """Resample ``im`` as seen after applying ``view`` to the canonical
        depth (renderer_nr.py:252-277, grid_sample path)."""
        rot_mat, trans_xyz = get_transform_matrices(view)
        recon_depth = self.warp_canon_depth(depth, rot_mat, trans_xyz)
        grid2d = self.get_inv_warped_2d_grid(recon_depth, rot_mat, trans_xyz)
        warped = self._grid_sample_images(im, grid2d)
        if mask is not None:
            warped_mask = self._grid_sample_images(mask, grid2d, mode="nearest")
            return warped, warped_mask
        return warped

    def render_yaw(self, im, depth, v_before=None, maxr: float = 90,
                   nsample: int = 9):
        """Yaw sweep for visualization (renderer_nr.py:141-198, grid_sample
        path).  Returns (B, nsample, H, W, C)."""
        outs = []
        for ri in jnp.linspace(-math.pi / 180 * maxr, math.pi / 180 * maxr, nsample):
            view = jnp.asarray([0.0, ri, 0, 0, 0, 0]).reshape(1, 6)
            view = jnp.broadcast_to(view, (im.shape[0], 6))
            if v_before is not None:
                view = view - v_before
            outs.append(self.render_given_view(im, depth, view))
        return jnp.stack(outs, 1)
