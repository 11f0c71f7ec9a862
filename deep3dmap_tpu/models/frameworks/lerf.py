"""LERF: language-embedded radiance field.

Capability parity with /root/reference/deep3dmap/models/frameworks/
lerf.py:23-247 (LERFModel on nerfstudio's NerfactoModel) — an RGB radiance
field plus a multi-scale language field supervised by CLIP pyramid
embeddings and DINO features, with multi-scale relevancy maximization at
inference (lerf.py:80-110 get_max_across).

TPU-native: the nerfstudio trainer/pipeline stack is replaced by this
framework + IterBasedRunner; rays come pre-sampled in the batch (the
datamanager equivalent, datasets/lerf_rays.py).  The RGB field is our NeRF
MLP with coarse/fine sampling; the language field samples only the top-K
weighted points per ray (lerf.py:112-116 num_lerf_samples).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from ...core.renderer.renderer_lerf import render_clip, render_mean
from ...core.renderer.renderer_nfvr import sample_pdf, volume_render
from ..backbones.nerf import NeRF
from ..builder import RECONSTRUCTORS
from ..modulars.clip_encoder import CLIPEncoder
from ..modulars.lerf_field import LERFField
from .base import BaseFramework


@RECONSTRUCTORS.register_module(name=["LERF", "LERFModel"])
class LERFModel(BaseFramework):
    def __init__(self, model_cfgs: dict, train_cfg=None, test_cfg=None):
        cfg = dict(model_cfgs)
        self.clip_n_dims = cfg.get("clip_n_dims", 512)
        self.dino_n_dims = cfg.get("dino_n_dims", 384)
        self.n_samples = cfg.get("N_samples", 32)
        self.n_importance = cfg.get("N_importance", 32)
        self.num_lerf_samples = cfg.get("num_lerf_samples", 12)
        self.max_scale = cfg.get("max_scale", 2.0)
        self.n_scales = cfg.get("n_scales", 8)
        self.scene_scale = cfg.get("scene_scale", 4.0)
        self.near = cfg.get("near", 0.5)
        self.far = cfg.get("far", 4.0)
        self.clip_loss_weight = cfg.get("clip_loss_weight", 0.5)
        self.dino_loss_weight = cfg.get("dino_loss_weight", 1.0)

        # RGB field: "hashgrid" = nerfacto parity (hashgrid density/color
        # field + proposal-network sampling + interlevel loss, ref
        # lerf.py:23-36 riding NerfactoModel); "mlp" = classic NeRF MLP
        # with uniform+pdf sampling (lighter, used by small synthetic tests)
        self.rgb_field_type = cfg.get("rgb_field_type", "mlp")
        if self.rgb_field_type == "hashgrid":
            from ..modulars.hash_nerf import HashNerfField, ProposalDensityField
            self.rgb_field = HashNerfField(
                n_levels=cfg.get("rgb_grid_levels", 8),
                features_per_level=cfg.get("rgb_grid_features", 4),
                log2_hashmap_size=cfg.get("rgb_grid_log2", 16),
                base_res=cfg.get("rgb_grid_base", 16),
                end_res=cfg.get("rgb_grid_end", 256),
                hidden=cfg.get("rgb_hidden", 64))
            self.proposal_field = ProposalDensityField(
                log2_hashmap_size=cfg.get("prop_grid_log2", 14),
                end_res=cfg.get("prop_grid_end", 64))
            self.n_prop_samples = cfg.get("N_proposal", 48)
            self.interlevel_mult = cfg.get("interlevel_loss_mult", 1.0)
        else:
            self.rgb_field = NeRF(fc_depth=cfg.get("fc_depth", 4),
                                  fc_dim=cfg.get("fc_dim", 128))
        self.lerf_field = LERFField(
            grid_layers=tuple(cfg.get("grid_layers", (4, 4))),
            grid_sizes=tuple(cfg.get("grid_sizes", (14, 14))),
            grid_resolutions=tuple(tuple(r) for r in cfg.get("grid_resolutions",
                                                             ((16, 64), (64, 128)))),
            clip_n_dims=self.clip_n_dims, dino_n_dims=self.dino_n_dims,
            hidden=cfg.get("hidden", 128))
        self.image_encoder = CLIPEncoder(embed_dim=self.clip_n_dims,
                                         weights_path=cfg.get("clip_weights"))

    # -- core rendering ------------------------------------------------------
    def _render_rays_hash(self, params, rays_o, rays_d, rng, perturb=1.0):
        """Nerfacto-parity path: proposal-network piecewise sampling into the
        hashgrid field, plus the interlevel loss term (lerf.py:23-36 rides
        NerfactoModel; proposal machinery in modulars/hash_nerf.py)."""
        from ..modulars.hash_nerf import interlevel_loss, weights_from_sigmas

        N = rays_o.shape[0]
        near = jnp.full((N, 1), self.near)
        far = jnp.full((N, 1), self.far)
        r1, r2 = jax.random.split(rng)

        # stratified proposal samples on [near, far]
        P = self.n_prop_samples
        edges = near + (far - near) * jnp.linspace(0, 1, P + 1)
        if perturb > 0:
            u = jax.random.uniform(r2, (N, P))
        else:
            u = jnp.full((N, P), 0.5)
        z_prop = edges[:, :-1] + (edges[:, 1:] - edges[:, :-1]) * u
        xyz_p = rays_o[:, None] + rays_d[:, None] * z_prop[..., None]
        sigma_p = self.proposal_field.apply(
            {"params": params["proposal"]}, self._positions01(xyz_p))
        w_prop = weights_from_sigmas(sigma_p, z_prop)

        # PDF-resample the main field's samples from the proposal histogram
        z_main = sample_pdf(r1, edges, w_prop + 1e-5, self.n_importance,
                            det=(perturb == 0))
        z_all = jnp.sort(z_main, -1)
        xyz = rays_o[:, None] + rays_d[:, None] * z_all[..., None]
        S = xyz.shape[1]
        dirs = jnp.broadcast_to(rays_d[:, None], (N, S, 3))
        rgbs, sigmas = self.rgb_field.apply(
            {"params": params["rgb_field"]}, self._positions01(xyz), dirs)
        rgb, depth, weights = volume_render(sigmas, rgbs, z_all, rays_d, far)

        # final-sample bin edges for the histogram (interlevel) loss
        mid = 0.5 * (z_all[:, :-1] + z_all[:, 1:])
        t_final = jnp.concatenate([z_all[:, :1], mid, z_all[:, -1:]], -1)
        prop_loss = interlevel_loss(edges, w_prop, t_final, weights)
        return rgb, depth, weights, z_all, xyz, {"prop_loss": prop_loss}

    def _render_rays(self, params, rays_o, rays_d, rng, perturb=1.0):
        if self.rgb_field_type == "hashgrid":
            return self._render_rays_hash(params, rays_o, rays_d, rng, perturb)
        N = rays_o.shape[0]
        near = jnp.full((N, 1), self.near)
        far = jnp.full((N, 1), self.far)
        z_steps = jnp.linspace(0, 1, self.n_samples)
        z_vals = near * (1 - z_steps) + far * z_steps
        r1, r2 = jax.random.split(rng)

        def field(z):
            xyz = rays_o[:, None] + rays_d[:, None] * z[..., None]
            S = xyz.shape[1]
            dirs = jnp.broadcast_to(rays_d[:, None], (N, S, 3))
            out = self.rgb_field.apply({"params": params["rgb_field"]},
                                       xyz.reshape(-1, 3), dirs.reshape(-1, 3))
            out = out.reshape(N, S, 4)
            return out[..., :3], out[..., 3], xyz

        rgbs, sigmas, _ = field(z_vals)
        _, _, weights_c = volume_render(sigmas, rgbs, z_vals, rays_d, far)
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])
        new_z = jax.lax.stop_gradient(
            sample_pdf(r1, z_mid, weights_c[:, 1:-1], self.n_importance,
                       det=(perturb == 0)))
        z_all = jnp.sort(jnp.concatenate([z_vals, new_z], -1), -1)
        rgbs, sigmas, xyz = field(z_all)
        rgb, depth, weights = volume_render(sigmas, rgbs, z_all, rays_d, far)
        return rgb, depth, weights, z_all, xyz, {}

    def _lerf_samples(self, weights, z_all, xyz):
        """Top-K weighted samples per ray (lerf.py:112-121)."""
        w_top, ids = jax.lax.top_k(weights, self.num_lerf_samples)
        xyz_top = jnp.take_along_axis(xyz, ids[..., None], axis=1)
        z_top = jnp.take_along_axis(z_all, ids, axis=1)
        return jax.lax.stop_gradient(w_top), xyz_top, z_top

    def _positions01(self, xyz):
        return jnp.clip((xyz + self.scene_scale / 2) / self.scene_scale, 0.0, 1.0)

    # -- framework contract --------------------------------------------------
    def init(self, rng, batch):
        k1, k2, k3 = jax.random.split(rng, 3)
        n = batch["rays_o"].shape[0]
        params = {
            "rgb_field": self.rgb_field.init(
                k1, jnp.zeros((8, 3)), jnp.zeros((8, 3)))["params"],
            "lerf_field": self.lerf_field.init(
                k2, jnp.zeros((8, 4, 3)), jnp.zeros((8, 4, 1)))["params"],
        }
        if self.rgb_field_type == "hashgrid":
            params["proposal"] = self.proposal_field.init(
                k3, jnp.zeros((8, 3)))["params"]
        return params, {}

    def loss_fn(self, params, model_state, batch, rng):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        rgb, depth, weights, z_all, xyz, raux = self._render_rays(
            params, batch["rays_o"], batch["rays_d"], rng)
        rgb_loss = ((rgb - batch["rgb"]) ** 2).mean()

        w_top, xyz_top, z_top = self._lerf_samples(weights, z_all, xyz)
        # physical clip scale per sample (lerf.py:124-128)
        scales = (batch["clip_scales"][:, None] * z_top)[..., None]
        pos01 = self._positions01(jax.lax.stop_gradient(xyz_top))
        field_out = self.lerf_field.apply({"params": params["lerf_field"]},
                                          pos01, scales)
        clip_render = render_clip(field_out["clip"], w_top[..., None])
        dino_render = render_mean(field_out["dino"], w_top[..., None])

        # lerf losses: huber on clip (toward the pyramid embedding), mse dino
        clip_loss = jnp.abs(clip_render - batch["clip"]).mean() * self.clip_loss_weight
        dino_loss = ((dino_render - batch["dino"]) ** 2).mean() * self.dino_loss_weight
        total = rgb_loss + clip_loss + dino_loss
        log_vars = {"rgb_loss": rgb_loss, "clip_loss": clip_loss,
                    "dino_loss": dino_loss}
        if "prop_loss" in raux:
            total = total + self.interlevel_mult * raux["prop_loss"]
            log_vars["prop_loss"] = raux["prop_loss"]
        return total, {"log_vars": log_vars, "model_state": model_state}

    def get_max_across(self, params, weights, hashgrid_feats,
                       preset_scales: Optional[Sequence[float]] = None):
        """Relevancy maximization over scales (lerf.py:80-110)."""
        n_phrases = len(self.image_encoder.positives)
        scales = (jnp.asarray(preset_scales) if preset_scales is not None
                  else jnp.linspace(0.0, self.max_scale, self.n_scales))
        best_sims = [None] * n_phrases
        best_scales = [0.0] * n_phrases
        bound = self.lerf_field.bind({"params": params["lerf_field"]})
        for s in scales:
            sc = jnp.full(hashgrid_feats.shape[:-1] + (1,), s)
            clip_out = bound.clip_from_hashgrid(hashgrid_feats, sc)
            emb = render_clip(clip_out, weights[..., None])
            for i in range(n_phrases):
                probs = self.image_encoder.get_relevancy(emb, i)
                pos = probs[..., 0]
                if best_sims[i] is None or float(pos.max()) > float(best_sims[i].max()):
                    best_sims[i] = pos
                    best_scales[i] = float(s)
        return jnp.stack(best_sims), jnp.asarray(best_scales)

    def forward_test(self, params, model_state, batch):
        rng = jax.random.PRNGKey(0)
        rgb, depth, weights, z_all, xyz, _ = self._render_rays(
            params, batch["rays_o"], batch["rays_d"], rng, perturb=0.0)
        out = {"rgb": rgb, "depth": depth}
        if self.image_encoder.positives:
            w_top, xyz_top, _ = self._lerf_samples(weights, z_all, xyz)
            bound = self.lerf_field.bind({"params": params["lerf_field"]})
            feats = bound.hashgrid_features(self._positions01(xyz_top))
            relevancy, best_scales = self.get_max_across(params, w_top, feats)
            out["raw_relevancy"] = relevancy
            out["best_scales"] = best_scales
        return out, model_state
