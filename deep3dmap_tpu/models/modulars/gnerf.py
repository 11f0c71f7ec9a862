"""GNeRF rendering module: coarse/fine NeRF over sampled patch rays.

Parity: /root/reference/deep3dmap/models/modulars/gnerf.py:10-93 — linear
depth stratification for the coarse pass, inverse-CDF importance sampling for
the fine pass, outputs scaled to [-1, 1] patch images.  TPU-native: the
reference's python chunk loop disappears (static ray batch, one fused
program); noise/perturb via explicit rng keys.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...core.renderer.renderer_nfvr import sample_pdf, volume_render
from ..backbones.nerf import NeRF


class GNeRFRender(nn.Module):
    xyz_freq: int = 10
    dir_freq: int = 4
    fc_depth: int = 8
    fc_dim: int = 256
    skips: tuple = (4,)
    n_samples: int = 64
    n_importance: int = 64
    white_back: bool = False

    @nn.compact
    def __call__(self, rays: jnp.ndarray, rng: Optional[jax.Array] = None,
                 perturb: float = 0.0, noise_std: float = 0.0):
        """rays (N, 8) = [o, d, near, far].  Returns dict with 'coarse'/'fine'
        {'rgb' (N,3) in [-1,1], 'depth' (N,), 'opacity' (N,)}."""
        nerf = NeRF(xyz_freq=self.xyz_freq, dir_freq=self.dir_freq,
                    fc_depth=self.fc_depth, fc_dim=self.fc_dim,
                    skips=tuple(self.skips), name="nerf")

        N = rays.shape[0]
        rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
        near, far = rays[:, 6:7], rays[:, 7:8]
        if rng is None:
            rng = jax.random.PRNGKey(0)
        r_pdf, r_noise_c, r_noise_f, r_perturb = jax.random.split(rng, 4)

        results = {}
        z_steps = jnp.linspace(0, 1, self.n_samples)
        z_vals = near * (1 - z_steps) + far * z_steps  # (N, S)
        if perturb > 0:
            mids = 0.5 * (z_vals[:, 1:] + z_vals[:, :-1])
            upper = jnp.concatenate([mids, z_vals[:, -1:]], -1)
            lower = jnp.concatenate([z_vals[:, :1], mids], -1)
            u = jax.random.uniform(r_perturb, z_vals.shape)
            z_vals = lower + (upper - lower) * u * perturb

        weights = None
        for pass_name in ("coarse", "fine"):
            if pass_name == "fine":
                z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
                new_z = sample_pdf(r_pdf, z_mid, weights[:, 1:-1],
                                   self.n_importance, det=(perturb == 0))
                new_z = jax.lax.stop_gradient(new_z)
                z_vals = jnp.sort(jnp.concatenate([z_vals, new_z], -1), axis=-1)

            xyz = rays_o[:, None] + rays_d[:, None] * z_vals[..., None]  # (N,S,3)
            S = xyz.shape[1]
            dirs = jnp.broadcast_to(rays_d[:, None], (N, S, 3))
            out = nerf(xyz.reshape(-1, 3), dirs.reshape(-1, 3)).reshape(N, S, 4)
            rgbs, sigmas = out[..., :3], out[..., 3]
            noise_rng = r_noise_c if pass_name == "coarse" else r_noise_f
            rgb, depth, weights = volume_render(
                sigmas, rgbs, z_vals, rays_d, far, white_back=self.white_back,
                noise_std=noise_std, rng=noise_rng)
            results[pass_name] = {
                "rgb": rgb * 2.0 - 1.0,
                "depth": jax.lax.stop_gradient(depth),
                "opacity": jax.lax.stop_gradient(weights.sum(-1)),
            }
        return results
