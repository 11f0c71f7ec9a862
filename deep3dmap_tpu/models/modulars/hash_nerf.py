"""Hashgrid-backed NeRF field + proposal sampling (nerfacto parity).

The reference LERF rides nerfstudio's NerfactoModel (/root/reference/
deep3dmap/models/frameworks/lerf.py:23-36): a tinycudann hashgrid density/
color field with proposal-network piecewise sampling.  This is the
TPU-native equivalent: HashGridEncoding (modulars/hashgrid.py) + fused
MLPs on the MXU, a small proposal density field, PDF resampling, and the
interlevel (proposal) loss that keeps the proposal histogram an outer
envelope of the final weights.

All shapes static; everything jits; the hash tables are plain params that
shard over a mesh axis if annotated.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .hashgrid import HashGridEncoding


@jax.custom_jvp
def trunc_exp(x):
    """exp with gradient-clamped input (instant-ngp density activation)."""
    return jnp.exp(x)


@trunc_exp.defjvp
def _trunc_exp_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    y = jnp.exp(x)
    return y, jnp.exp(jnp.clip(x, -15.0, 15.0)) * dx


def posenc(x, n_freqs: int):
    """[sin(2^k x), cos(2^k x)]_k — classic NeRF directional encoding."""
    freqs = 2.0 ** jnp.arange(n_freqs)
    ang = x[..., None, :] * freqs[:, None]
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], -1)
    return enc.reshape(*x.shape[:-1], -1)


class HashNerfField(nn.Module):
    """Density + color field over hashgrid features (nerfacto's main field)."""

    n_levels: int = 8
    features_per_level: int = 4
    log2_hashmap_size: int = 16
    base_res: int = 16
    end_res: int = 256
    hidden: int = 64
    geo_feat_dim: int = 15
    dir_freq: int = 4

    @nn.compact
    def __call__(self, xyz01, dirs):
        """xyz01 (..., 3) in [0,1]; dirs (..., 3) unit.  -> (rgb, sigma)."""
        enc = HashGridEncoding(
            n_levels=self.n_levels, features_per_level=self.features_per_level,
            log2_hashmap_size=self.log2_hashmap_size, base_res=self.base_res,
            end_res=self.end_res, name="grid")(xyz01)
        h = nn.Dense(self.hidden, name="base1")(enc)
        h = nn.relu(h)
        h = nn.Dense(1 + self.geo_feat_dim, name="base2")(h)
        sigma = trunc_exp(h[..., 0])
        feat = h[..., 1:]
        d = posenc(dirs, self.dir_freq)
        c = jnp.concatenate([feat, d], -1)
        c = nn.Dense(self.hidden, name="color1")(c)
        c = nn.relu(c)
        c = nn.Dense(self.hidden, name="color2")(c)
        c = nn.relu(c)
        rgb = jax.nn.sigmoid(nn.Dense(3, name="color3")(c))
        return rgb, sigma


class ProposalDensityField(nn.Module):
    """Small density-only hashgrid field (nerfacto proposal network)."""

    n_levels: int = 5
    features_per_level: int = 2
    log2_hashmap_size: int = 14
    base_res: int = 16
    end_res: int = 64
    hidden: int = 16

    @nn.compact
    def __call__(self, xyz01):
        enc = HashGridEncoding(
            n_levels=self.n_levels, features_per_level=self.features_per_level,
            log2_hashmap_size=self.log2_hashmap_size, base_res=self.base_res,
            end_res=self.end_res, name="grid")(xyz01)
        h = nn.Dense(self.hidden, name="d1")(enc)
        h = nn.relu(h)
        h = nn.Dense(1, name="d2")(h)
        return trunc_exp(h[..., 0])


def weights_from_sigmas(sigmas, z_vals):
    """Standard alpha compositing weights over [N, S] samples (last delta
    closes to a large distance)."""
    deltas = jnp.diff(z_vals, axis=-1)
    deltas = jnp.concatenate([deltas, jnp.full_like(deltas[..., :1], 1e3)], -1)
    alpha = 1.0 - jnp.exp(-sigmas * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], -1)
    return alpha * trans


def interlevel_loss(t_prop, w_prop, t_final, w_final):
    """Nerfacto's proposal (histogram) loss.

    Penalizes final-weight mass that exceeds the proposal histogram's outer
    measure over each final interval — keeps the proposal an envelope of
    the final distribution so PDF sampling stays sharp.
    t_prop (N, P+1), w_prop (N, P), t_final (N, S+1), w_final (N, S).
    """
    cw = jnp.concatenate([jnp.zeros_like(w_prop[..., :1]),
                          jnp.cumsum(w_prop, -1)], -1)     # (N, P+1)

    def cum_at(t_query):
        # piecewise-constant-density cumulative evaluated at t_query
        idx = jnp.clip(
            jax.vmap(jnp.searchsorted)(t_prop, t_query) - 1,
            0, t_prop.shape[-1] - 2)
        t0 = jnp.take_along_axis(t_prop, idx, -1)
        t1 = jnp.take_along_axis(t_prop, idx + 1, -1)
        c0 = jnp.take_along_axis(cw, idx, -1)
        c1 = jnp.take_along_axis(cw, idx + 1, -1)
        f = jnp.clip((t_query - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
        return c0 + (c1 - c0) * f

    # outer measure: use bin-aligned bounds (cheap, conservative)
    w_outer = cum_at(t_final[..., 1:]) - cum_at(t_final[..., :-1])
    excess = jnp.clip(jax.lax.stop_gradient(w_final) - w_outer, 0.0)
    return jnp.mean(excess ** 2 / (jax.lax.stop_gradient(w_final) + 1e-7))
