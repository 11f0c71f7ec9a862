"""GanNerf (GNeRF): pose-free NeRF with adversarial training.

Capability parity with /root/reference/deep3dmap/models/frameworks/
gnerf.py:33-124 + modulars/gnerf.py.  The reference's ``train_step`` is
truncated mid-function at EOF (gnerf.py:112-124); the per-sequence behavior
is reconstructed from its optimize-sequence names (gnerf.py:101-111), the
samplers, and the GNeRF paper (Meng et al., ICCV'21):

  state 'A'    : [generator, discriminator, inversion_net,
                  train-pose-reg, val-pose-reg]      — adversarial phase
  state 'ABAB' : A-sequences + [train-refine, val-refine] interleaved
  state 'B'    : [train-refine, val-refine]          — photometric refinement

  - generator_trainstep: render patches at random spherical poses, fool D
    (non-saturating loss)
  - discriminator_trainstep: real patches (FlexPatchSampler crops of dataset
    images) vs rendered fakes, softplus GAN loss, DiffAugment inside D
  - inversion_net_trainstep: ViT predicts the pose embedding of rendered
    patches at known random poses (MSE)
  - training/val_pose_regularization: fit learnable per-image pose
    embeddings to the inversion net's predictions on real images
  - training_refine_step: joint photometric refinement of NeRF + train
    poses; val_refine_step: val poses only

TPU-native: every sequence is its own jitted step with optax.masked updates
(see runners/state_machine_runner.py); all "hooks" (noise decrease
modulars/gnerf.py:89-92, sampler scale annealing) are traced functions of the
iteration counter carried in model_state — no host-side mutation.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.renderer.samples.patch_sampler import (
    FlexPatchSampler,
    FullImageSampler,
    RescalePatchSampler,
    sample_image_patches,
)
from ...core.renderer.samples.ray_sampler import RaySampler
from ..builder import RECONSTRUCTORS
from ..modulars.dynamic_patch_discriminator import Discriminator
from ..modulars.embeddings import PoseParameters, pose_to_d9
from ..modulars.gnerf import GNeRFRender
from ..modulars.inversion_net import InversionNet
from .base import BaseFramework


@RECONSTRUCTORS.register_module(name=["GanNerf", "gnerf"])
class GanNerf(BaseFramework):
    is_multi_opt_iters = True

    def __init__(self, model_cfgs: dict, train_cfg=None, test_cfg=None):
        cfg = dict(model_cfgs)
        self.img_wh = tuple(cfg.get("img_wh", (64, 64)))
        self.patch_size = cfg.get("patch_size", 16)
        self.inv_size = cfg.get("inv_size", 16)
        self.pose_mode = cfg.get("pose_mode", "6d")
        min_scale = cfg.get("min_scale",
                            self.patch_size / max(self.img_wh[0], self.img_wh[1]))

        self.dynamic_patch_sampler = FlexPatchSampler(
            random_scale=cfg.get("random_scale", True),
            min_scale=min_scale,
            max_scale=cfg.get("max_scale", 1.0),
            scale_anneal=cfg.get("scale_anneal", 0.0002))
        self.static_patch_sampler = RescalePatchSampler()
        self.full_img_sampler = FullImageSampler()
        self.ray_sampler = RaySampler(
            near=cfg.get("near", 0.5), far=cfg.get("far", 4.0),
            azim_range=cfg.get("azim_range", (0.0, 360.0)),
            elev_range=cfg.get("elev_range", (0.0, 60.0)),
            radius=cfg.get("radius", (1.0, 1.5)),
            look_at_origin=cfg.get("look_at_origin", True),
            ndc=cfg.get("ndc", False))

        self.generator = GNeRFRender(
            xyz_freq=cfg.get("xyz_freq", 10), dir_freq=cfg.get("dir_freq", 4),
            fc_depth=cfg.get("fc_depth", 8), fc_dim=cfg.get("fc_dim", 256),
            n_samples=cfg.get("N_samples", 64),
            n_importance=cfg.get("N_importance", 64),
            white_back=cfg.get("white_back", False))
        self.discriminator = Discriminator(
            conditional=cfg.get("conditional", True),
            policy=cfg.get("policy", ("color", "translation", "cutout")),
            ndf=cfg.get("ndf", 64), imsize=self.patch_size)
        self.inv_net = InversionNet(imsize=self.inv_size, pose_mode=self.pose_mode,
                                    depth=cfg.get("inv_depth", 6))
        self.network_names = ["generator", "discriminator", "inv_net"]

        self.n_train_images = cfg.get("n_train_images", 1)
        self.n_val_images = cfg.get("n_val_images", 1)
        self.train_pose_params = PoseParameters(self.n_train_images, self.pose_mode)
        self.val_pose_params = PoseParameters(self.n_val_images, self.pose_mode)
        self.noise_end_it = cfg.get("noise_end_it", 5000)

    # -- state machine contract (gnerf.py:97-111) ---------------------------
    def set_info_from_datasets(self, datasets):
        self.ray_sampler.set_start_intrinsics(np.asarray(datasets[0].intrinsics))
        self.n_train_images = len(datasets[0])
        self.n_val_images = len(datasets[1]) if len(datasets) > 1 else 1
        self.train_pose_params = PoseParameters(self.n_train_images, self.pose_mode)
        self.val_pose_params = PoseParameters(self.n_val_images, self.pose_mode)

    def setup_optimize_sequences(self, state):
        if state == "A":
            return ["generator_trainstep", "discriminator_trainstep",
                    "inversion_net_trainstep", "training_pose_regularization",
                    "val_pose_regularization"]
        if state == "ABAB":
            return ["generator_trainstep", "discriminator_trainstep",
                    "inversion_net_trainstep", "training_pose_regularization",
                    "val_pose_regularization", "training_refine_step",
                    "val_refine_step"]
        if state == "B":
            return ["training_refine_step", "val_refine_step"]
        raise AssertionError("model state error")

    def optseq2netnames(self, optseq):
        return {
            "generator_trainstep": ["generator"],
            "discriminator_trainstep": ["discriminator"],
            "inversion_net_trainstep": ["inv_net"],
            "training_pose_regularization": ["train_poses"],
            "val_pose_regularization": ["val_poses"],
            "training_refine_step": ["generator", "train_poses"],
            "val_refine_step": ["val_poses"],
        }[optseq]

    # -- helpers ------------------------------------------------------------
    def _noise_std(self, it):
        return jnp.maximum(0.0, 1.0 - it / self.noise_end_it)

    def _render_patches(self, params, rng, poses, coords, it, disc_stats=None):
        rays = self.ray_sampler.get_rays(coords, poses, self.img_wh)
        n, h, w, _ = coords.shape
        flat = rays.reshape(-1, 8)
        out = self.generator.apply({"params": params["generator"]}, flat, rng=rng,
                                   perturb=1.0, noise_std=self._noise_std(it))
        fake_c = out["coarse"]["rgb"].reshape(n, h, w, 3)
        fake_f = out["fine"]["rgb"].reshape(n, h, w, 3)
        return fake_c, fake_f

    def _disc(self, params, mstate, x, scales, rng, train=True):
        out, new_stats = self.discriminator.apply(
            {"params": params["discriminator"], "batch_stats": mstate["disc_stats"]},
            x, y=scales.reshape(-1, 1), rng=rng, train=train, mutable=["batch_stats"])
        return out, new_stats["batch_stats"]

    def _pose_embed_target(self, poses):
        if self.pose_mode == "3d":
            return poses[:, :3, 3]
        return pose_to_d9(poses)

    # -- framework contract --------------------------------------------------
    def init(self, rng, batch):
        B = batch["imgs"].shape[0]
        P = self.patch_size
        r = jax.random.split(rng, 6)
        dummy_rays = jnp.zeros((4, 8)).at[:, 7].set(1.0)
        g_vars = jax.jit(lambda k: self.generator.init(k, dummy_rays))(r[0])
        d_vars = jax.jit(lambda k: self.discriminator.init(
            k, jnp.zeros((1, P, P, 3)), y=jnp.zeros((1, 1)), train=False))(r[1])
        i_vars = jax.jit(lambda k: self.inv_net.init(
            k, jnp.zeros((1, self.inv_size, self.inv_size, 3))))(r[2])
        tp = self.train_pose_params.init(r[3])
        vp = self.val_pose_params.init(r[4])
        params = {
            "generator": g_vars["params"],
            "discriminator": d_vars["params"],
            "inv_net": i_vars["params"],
            "train_poses": tp["params"],
            "val_poses": vp["params"],
        }
        mstate = {
            "disc_stats": d_vars.get("batch_stats", {}),
            "it": jnp.zeros((), jnp.int32),
        }
        return params, mstate

    def loss_fn(self, params, model_state, batch, rng, state: str = "A",
                opt_seq: Optional[str] = None):
        opt_seq = opt_seq or "generator_trainstep"
        it = model_state["it"]
        rngs = jax.random.split(rng if rng is not None else jax.random.PRNGKey(0), 8)
        imgs = batch["imgs"]  # (B, H, W, 3) in [-1, 1]
        B = imgs.shape[0]
        new_state = dict(model_state)
        log = {}

        if opt_seq in ("generator_trainstep", "discriminator_trainstep"):
            coords, scales = self.dynamic_patch_sampler(rngs[0], B, self.patch_size, it)
            poses = self.ray_sampler.random_poses(rngs[1], B)
            _, fake = self._render_patches(params, rngs[2], poses, coords, it)
            if opt_seq == "generator_trainstep":
                d_fake, stats = self._disc(params, model_state, fake, scales, rngs[3])
                loss = jax.nn.softplus(-d_fake).mean()
                new_state["it"] = it + 1
                log["g_loss"] = loss
            else:
                real = sample_image_patches(imgs, coords)
                d_real, stats = self._disc(params, model_state, real, scales, rngs[3])
                d_fake, stats = self._disc(dict(params), {**model_state, "disc_stats": stats},
                                           jax.lax.stop_gradient(fake), scales, rngs[4])
                loss = (jax.nn.softplus(-d_real) + jax.nn.softplus(d_fake)).mean()
                log.update(d_loss=loss, d_real=d_real.mean(), d_fake=d_fake.mean())
            new_state["disc_stats"] = stats

        elif opt_seq == "inversion_net_trainstep":
            coords, scales = self.static_patch_sampler(rngs[0], B, self.inv_size, it)
            poses = self.ray_sampler.random_poses(rngs[1], B)
            _, fake = self._render_patches(params, rngs[2], poses, coords, it)
            pred = self.inv_net.apply({"params": params["inv_net"]},
                                      jax.lax.stop_gradient(fake))
            target = self._pose_embed_target(poses)
            loss = ((pred - target) ** 2).mean()
            log["inv_loss"] = loss

        elif opt_seq in ("training_pose_regularization", "val_pose_regularization"):
            key = "train_poses" if opt_seq.startswith("training") else "val_poses"
            pose_params = (self.train_pose_params if key == "train_poses"
                           else self.val_pose_params)
            src = imgs if key == "train_poses" else batch.get("val_imgs", imgs)
            idx = batch["img_idx"] if key == "train_poses" else batch.get("val_idx", batch["img_idx"])
            coords, _ = self.static_patch_sampler(rngs[0], src.shape[0], self.inv_size, it)
            patches = sample_image_patches(src, coords)
            pred = self.inv_net.apply({"params": params["inv_net"]}, patches)
            embed = params[key]["poses_embed"][idx]
            loss = ((embed - jax.lax.stop_gradient(pred)) ** 2).mean()
            log[f"{key}_reg_loss"] = loss

        elif opt_seq in ("training_refine_step", "val_refine_step"):
            key = "train_poses" if opt_seq.startswith("training") else "val_poses"
            pose_params = (self.train_pose_params if key == "train_poses"
                           else self.val_pose_params)
            src = imgs if key == "train_poses" else batch.get("val_imgs", imgs)
            idx = batch["img_idx"] if key == "train_poses" else batch.get("val_idx", batch["img_idx"])
            poses = pose_params.apply({"params": params[key]}, idx)
            coords, _ = self.dynamic_patch_sampler(rngs[0], src.shape[0],
                                                   self.patch_size, it)
            real = sample_image_patches(src, coords)
            fake_c, fake_f = self._render_patches(params, rngs[2], poses, coords, it)
            loss = (((fake_f - real) ** 2).mean() + ((fake_c - real) ** 2).mean())
            log[f"{key}_refine_loss"] = loss

        else:
            raise ValueError(f"unknown opt_seq {opt_seq}")

        return loss, {"log_vars": log, "model_state": new_state}

    def forward_test(self, params, model_state, batch):
        """Render full validation views at the learned val poses."""
        idx = batch.get("val_idx", batch.get("img_idx"))
        poses = self.val_pose_params.apply({"params": params["val_poses"]}, idx)
        coords, _ = self.full_img_sampler(None, poses.shape[0], self.img_wh)
        rays = self.ray_sampler.get_rays(coords, poses, self.img_wh).reshape(-1, 8)
        out = self.generator.apply({"params": params["generator"]}, rays,
                                   rng=jax.random.PRNGKey(0), perturb=0.0,
                                   noise_std=0.0)
        H, W = self.img_wh[1], self.img_wh[0]
        rgb = out["fine"]["rgb"].reshape(-1, H, W, 3)
        depth = out["fine"]["depth"].reshape(-1, H, W)
        return {"rgb": rgb, "depth": depth}, model_state
