"""Ray sampling: random spherical poses, spheric paths, ray generation.

Parity: /root/reference/deep3dmap/core/renderer/samples/ray_sampler.py:8-104
— identical geometry (look-at rotations from azimuth/elevation/radius ranges,
patch-coord ray generation with rescaled intrinsics, rays packed as
[o(3), d(3), near, far]).
"""
from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ....ops.grid_sample import grid_sample_2d


def look_at_rotation(camera_position: jnp.ndarray, at=(0.0, 0.0, 0.0),
                     up=(0.0, 0.0, 1.0)) -> jnp.ndarray:
    """Batched look-at rotation (world->R columns), pytorch3d convention
    (+z toward `at`)."""
    at = jnp.broadcast_to(jnp.asarray(at, jnp.float32), camera_position.shape)
    up = jnp.broadcast_to(jnp.asarray(up, jnp.float32), camera_position.shape)
    z = at - camera_position
    z = z / (jnp.linalg.norm(z, axis=-1, keepdims=True) + 1e-9)
    x = jnp.cross(up, z)
    x_norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    # degenerate: up parallel to z
    x = jnp.where(x_norm > 1e-5, x / jnp.maximum(x_norm, 1e-9),
                  jnp.broadcast_to(jnp.asarray([1.0, 0, 0]), x.shape))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-1)  # (N, 3, 3)


class RaySampler:
    def __init__(self, near: float, far: float, azim_range: Sequence[float],
                 elev_range: Sequence[float], radius: Sequence[float],
                 look_at_origin: bool = True, ndc: bool = False,
                 intrinsics: Optional[jnp.ndarray] = None):
        self.near = near
        self.far = far
        self.azim_range = azim_range
        self.elev_range = elev_range
        self.radius = radius
        self.look_at_origin = look_at_origin
        self.up = (0.0, 0.0, 1.0)
        self.ndc = ndc
        self.start_intrinsics = intrinsics
        self.intrinsics = intrinsics

    def set_start_intrinsics(self, intrinsics):
        self.start_intrinsics = jnp.asarray(intrinsics)
        self.intrinsics = self.start_intrinsics

    def update_intrinsic(self, scale: float):
        K = jnp.asarray(self.start_intrinsics)
        self.intrinsics = K.at[:2].set(K[:2] * scale)
        return self.intrinsics

    def random_poses(self, rng, nbatch: int) -> jnp.ndarray:
        """(N, 3, 4) camera-to-world [R|t] with eye on a random spherical cap."""
        r1, r2 = jax.random.split(rng)
        raes = jax.random.uniform(r1, (nbatch, 3))
        azims = (raes[:, 0:1] * (self.azim_range[1] - self.azim_range[0])
                 + self.azim_range[0]) * math.pi / 180.0
        elevs = (raes[:, 1:2] * (self.elev_range[1] - self.elev_range[0])
                 + self.elev_range[0]) * math.pi / 180.0
        T = jnp.concatenate([jnp.cos(elevs) * jnp.cos(azims),
                             jnp.cos(elevs) * jnp.sin(azims),
                             jnp.sin(elevs)], -1)
        radius = raes[:, 2:] * (self.radius[1] - self.radius[0]) + self.radius[0]
        T = T * radius
        if self.look_at_origin:
            lookat = jnp.zeros_like(T)
        else:
            xy = jax.random.normal(r2, (nbatch, 2)) * self.radius[0] * 0.01
            lookat = jnp.concatenate([xy, jnp.zeros((nbatch, 1))], -1)
        R = look_at_rotation(T, at=lookat, up=self.up)
        return jnp.concatenate([R, T[..., None]], -1)

    def spheric_poses(self, n: int = 120) -> jnp.ndarray:
        elevs = jnp.full((n, 1), sum(self.elev_range) * 0.5 * math.pi / 180.0)
        azims = jnp.linspace(self.azim_range[0], self.azim_range[1], n)[:, None] * math.pi / 180.0
        radius = sum(self.radius) / len(self.radius)
        t = jnp.concatenate([jnp.cos(elevs) * jnp.cos(azims),
                             jnp.cos(elevs) * jnp.sin(azims),
                             jnp.sin(elevs)], -1) * radius
        R = look_at_rotation(t)
        return jnp.concatenate([R, t[..., None]], -1)

    def get_rays(self, coords: jnp.ndarray, c2ws: jnp.ndarray, img_wh) -> jnp.ndarray:
        """coords (N, h, w, 2) in [-1,1]² (h,w order); c2ws (N, 3, 4).
        Returns rays (N, h, w, 8) = [o, d, near, far]."""
        K = self.intrinsics
        n, h, w, _ = coords.shape
        W, H = img_wh[0], img_wh[1]

        # pixel indices sampled at patch coords (ray_sampler.py:78-85):
        # coords channel 0 ~ x/width, channel 1 ~ y/height
        u = (coords[..., 0] + 1) * 0.5 * (W - 1)
        v = (coords[..., 1] + 1) * 0.5 * (H - 1)

        dirs = jnp.stack([(u - K[0, 2]) / K[0, 0],
                          -(v - K[1, 2]) / K[1, 1],
                          -jnp.ones_like(u)], -1)  # (N,h,w,3)
        rays_d = jnp.einsum("nhwc,ndc->nhwd", dirs, c2ws[:, :3, :3])
        rays_d = rays_d / (jnp.linalg.norm(rays_d, axis=-1, keepdims=True) + 1e-9)
        rays_o = jnp.broadcast_to(c2ws[:, None, None, :3, -1], rays_d.shape)

        near = jnp.full_like(rays_o[..., :1], self.near)
        far = jnp.full_like(rays_o[..., :1], self.far)
        return jnp.concatenate([rays_o, rays_d, near, far], -1)
