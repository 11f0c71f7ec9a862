"""Gan2Shape: unsupervised 3D shape from a 2D StyleGAN prior.

Capability parity with /root/reference/deep3dmap/models/frameworks/
gan2shape.py:27-979: per-instance fitting of depth/albedo/view/light heads
against a frozen pretrained StyleGAN2 —

  step1 (gan2shape.py:418-516): photometric reconstruction.  Predict
    canonical depth (mean-centered tanh, rescaled, border-clamped), albedo,
    view (6-dof, scaled ranges), light (ambient/diffuse/direction);
    lambertian shading; warp to the input view through the differentiable
    depth renderer; L1 + perceptual + smoothness losses.
  step2 (gan2shape.py:570-587 + 704-737): GAN latent projection.  Sample
    pseudo images under random views/lights from the current canonical
    estimate, project them into the StyleGAN latent space via the encoder
    head (hidden-space offset through the split mapping network,
    gan2shape.py:537-542), reconstruct with the frozen generator; L1 +
    discriminator-feature + latent-norm losses.
  step3 (gan2shape.py:619-694): joint refinement.  step1 on the input plus
    reconstruction of the collected projected samples under their predicted
    views/lights.

TPU-native: all three steps are pure jitted loss functions over a dict of
head params; the frozen GAN lives in model_state; pseudo-sampling uses
explicit rng; the NMR rasterizer is replaced by softmax-z-buffer splatting
(core/renderer/renderer_nr.py).  Per-device instance parallelism (the
reference's one-image-per-rank mode) comes for free: batch the instance
dimension and shard it over the mesh.
"""
from __future__ import annotations

import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.renderer.renderer_nr import NrRenderer, get_transform_matrices
from ..backbones.encoder import Encoder
from ..backbones.encoder_decoder import EDDeconv
from ..builder import RECONSTRUCTORS
from ..losses.perceptual_loss import DiscriminatorLoss, PerceptualLoss
from ..modulars.stylegan2 import Generator, MappingNet, StyleDiscriminator
from .base import BaseFramework


def photometric_loss(pred, target, mask=None):
    """L1 with soft validity mask (reference utils.photometric_loss)."""
    loss = jnp.abs(pred - target)
    if mask is not None:
        loss = loss * mask
        return loss.sum() / jnp.maximum(jnp.broadcast_to(mask, loss.shape).sum(), 1.0)
    return loss.mean()


def smooth_loss(x):
    """Total-variation smoothness (reference utils.smooth_loss).
    x (B, H, W) or (B, H, W, C)."""
    if x.ndim == 3:
        x = x[..., None]
    dx = jnp.abs(x[:, :, 1:] - x[:, :, :-1]).mean()
    dy = jnp.abs(x[:, 1:] - x[:, :-1]).mean()
    return dx + dy


@RECONSTRUCTORS.register_module(name=["Gan2Shape", "gan2shape"])
class Gan2Shape(BaseFramework):
    def __init__(self, model_cfgs: dict, train_cfg=None, test_cfg=None):
        cfg = dict(model_cfgs)
        self.image_size = cfg.get("image_size", 64)
        self.gan_size = cfg.get("gan_size", self.image_size)
        self.z_dim = cfg.get("z_dim", 128)
        self.n_mlp = cfg.get("n_mlp", 8)
        self.channel_multiplier = cfg.get("channel_multiplier", 1)
        self.min_depth = cfg.get("min_depth", 0.9)
        self.max_depth = cfg.get("max_depth", 1.1)
        self.border_depth = cfg.get("border_depth",
                                    0.7 * self.max_depth + 0.3 * self.min_depth)
        self.xyz_rotation_range = cfg.get("xyz_rotation_range", 60)
        self.xy_translation_range = cfg.get("xy_translation_range", 0.1)
        self.z_translation_range = cfg.get("z_translation_range", 0.1)
        self.rand_light = cfg.get("rand_light", [-1, 1, -0.2, 0.8, -0.1, 0.6, -0.6])
        self.lam_perc = cfg.get("lam_perc", 1.0)
        self.lam_smooth = cfg.get("lam_smooth", 0.01)
        self.lam_regular = cfg.get("lam_regular", 0.01)
        self.batchsize = cfg.get("batchsize", 4)
        self.F1_d = cfg.get("F1_d", 2)
        self.view_scale = cfg.get("view_scale", 1.0)
        self.use_mask = cfg.get("use_mask", False)
        # pretrained parsing model for region masks (parity: the reference
        # loads BiSeNet/PSPNet checkpoints and derives category masks,
        # gan2shape.py:313-363); npz from `tools/import_weights.py bisenet`
        self.parsing_ckpt = cfg.get("parsing_ckpt")
        self.category = cfg.get("category", "face")
        self._face_parser = None
        self.mode = "step1"

        self.renderer = NrRenderer(cfg, self.image_size)
        self.depth_head = EDDeconv(cout=1, nf=cfg.get("nf", 16))
        self.albedo_head = EDDeconv(cout=3, nf=cfg.get("nf", 16))
        self.view_head = Encoder(cout=6, nf=cfg.get("nf", 16))
        self.light_head = Encoder(cout=4, nf=cfg.get("nf", 16))
        self.encoder_head = Encoder(cout=self.z_dim, nf=cfg.get("nf", 16),
                                    activation="none")
        self.network_names = ["depth_head", "albedo_head", "view_head",
                              "light_head", "encoder_head"]

        self.generator = Generator(size=self.gan_size, style_dim=self.z_dim,
                                   n_mlp=self.n_mlp,
                                   channel_multiplier=self.channel_multiplier)
        self.discriminator = StyleDiscriminator(size=self.gan_size,
                                                channel_multiplier=self.channel_multiplier)
        self.perceptual = PerceptualLoss()
        self.d_loss = DiscriminatorLoss(ftr_num=cfg.get("ftr_num", 4))
        self.gan_ckpt = cfg.get("gan_ckpt")

        self.depth_rescaler = lambda d: ((1 + d) / 2 * self.max_depth
                                         + (1 - d) / 2 * self.min_depth)

    # -- setup --------------------------------------------------------------
    def parse_mask(self, images):
        """Category region mask from the pretrained parsing model
        (parity: gan2shape.py:313-363 — BiSeNet face parsing for
        face/synface, PSPNet scene parsing for car/cat/church/horse, with
        church using the 150-class ADE model).  images (B,S,S,3) in [-1,1]."""
        if self._face_parser is None:
            if self.category in ("face", "synface"):
                from ..parsing.bisenet_fp import FaceParser
                self._face_parser = FaceParser(self.parsing_ckpt)
            else:
                from ..parsing.pspnet import SceneParser
                n_classes = 150 if self.category == "church" else 21
                self._face_parser = SceneParser(self.parsing_ckpt,
                                                n_classes=n_classes)
        return self._face_parser.parse_mask(images, self.category,
                                            out_size=self.image_size)

    def set_mode(self, mode: str):
        assert mode in ("step1", "step2", "step3")
        self.mode = mode

    def init(self, rng, batch):
        im = batch["input_im"]  # (B, S, S, 3) in [-1, 1]
        ks = jax.random.split(rng, 8)
        params = {
            "depth_head": self.depth_head.init(ks[0], im)["params"],
            "albedo_head": self.albedo_head.init(ks[1], im)["params"],
            "view_head": self.view_head.init(ks[2], im)["params"],
            "light_head": self.light_head.init(ks[3], im)["params"],
            "encoder_head": self.encoder_head.init(ks[4], im)["params"],
        }
        z = jnp.zeros((1, self.z_dim))
        g_vars = jax.jit(lambda k: self.generator.init({"params": k, "noise": k}, z))(ks[5])
        gan_params = g_vars["params"]
        d_params = jax.jit(lambda k: self.discriminator.init(
            k, jnp.zeros((1, self.gan_size, self.gan_size, 3))))(ks[6])["params"]
        if self.gan_ckpt:
            loaded = np.load(self.gan_ckpt, allow_pickle=True)
            gan_params = jax.tree_util.tree_map(jnp.asarray, loaded["g"].item())
            d_params = jax.tree_util.tree_map(jnp.asarray, loaded["d"].item())

        mapping = self.generator.mapping_net()
        center_w = mapping.apply({"params": gan_params["mapping"]}, z)
        center_h = mapping.apply({"params": gan_params["mapping"]}, z,
                                 depth=self.n_mlp - self.F1_d)
        model_state = {
            "gan_params": gan_params,       # frozen
            "disc_params": d_params,        # frozen
            "center_w": center_w,
            "center_h": center_h,
        }
        return params, model_state

    # -- shared pieces -------------------------------------------------------
    def _view_trans(self, view):
        return jnp.concatenate([
            view[:, :3] * math.pi / 180 * self.xyz_rotation_range,
            view[:, 3:5] * self.xy_translation_range,
            view[:, 5:] * self.z_translation_range], 1)

    def _light_terms(self, light):
        light_a = light[:, :1] / 2 + 0.5
        light_b = light[:, 1:2] / 2 + 0.5
        light_d = jnp.concatenate([light[:, 2:], jnp.ones_like(light[:, :1])], 1)
        light_d = light_d / jnp.linalg.norm(light_d, axis=1, keepdims=True)
        return light_a, light_b, light_d

    def _predict_canonical(self, params, im):
        """Shared step1 forward up to the canonical representation."""
        B, S = im.shape[0], self.image_size
        depth_raw = self.depth_head.apply({"params": params["depth_head"]}, im)[..., 0]
        depth = depth_raw - depth_raw.reshape(B, -1).mean(1).reshape(B, 1, 1)
        depth = self.depth_rescaler(jnp.tanh(depth))
        # clamp border depth (gan2shape.py:427-430)
        border = jnp.zeros((1, S, S - 4))
        border = jnp.pad(border, ((0, 0), (0, 0), (2, 2)), constant_values=1.02)
        depth = depth * (1 - border) + border * self.border_depth

        albedo = self.albedo_head.apply({"params": params["albedo_head"]}, im)
        view = self.view_head.apply({"params": params["view_head"]}, im) * self.view_scale
        light = self.light_head.apply({"params": params["light_head"]}, im)
        return depth, albedo, view, light

    def _shade(self, albedo, normal, light_a, light_b, light_d):
        diffuse = jnp.clip((normal * light_d[:, None, None, :]).sum(-1), 0.0, None)
        shading = light_a[:, :, None, None].transpose(0, 2, 3, 1) \
            + light_b[:, :, None, None].transpose(0, 2, 3, 1) * diffuse[..., None]
        texture = (albedo / 2 + 0.5) * shading * 2 - 1
        return texture, diffuse

    # -- step 1 --------------------------------------------------------------
    def forward_step1(self, params, model_state, batch, rng):
        im = batch["input_im"]
        B = im.shape[0]
        depth, albedo, view, light = self._predict_canonical(params, im)
        view_trans = self._view_trans(view)
        rot_mat, trans_xyz = get_transform_matrices(view_trans)
        light_a, light_b, light_d = self._light_terms(light)

        normal = self.renderer.get_normal_from_depth(depth)
        texture, diffuse = self._shade(albedo, normal, light_a, light_b, light_d)

        recon_depth = self.renderer.warp_canon_depth(depth, rot_mat, trans_xyz)
        grid_2d = self.renderer.get_inv_warped_2d_grid(recon_depth, rot_mat, trans_xyz)
        margin = (self.max_depth - self.min_depth) / 2
        recon_mask = jax.lax.stop_gradient(
            (recon_depth < self.max_depth + margin).astype(im.dtype))[..., None]
        if self.use_mask and "input_mask" in batch:
            # parsed region mask gates the photometric terms
            # (gan2shape.py:418-516 step1 with use_mask)
            recon_mask = recon_mask * batch["input_mask"]
        recon_im = jnp.clip(self.renderer._grid_sample_images(texture, grid_2d), -1, 1)

        loss_l1 = photometric_loss(recon_im, im, recon_mask)
        loss_perc = self.perceptual(recon_im * recon_mask, im * recon_mask).mean()
        loss_sm = smooth_loss(depth) + smooth_loss(diffuse)
        total = loss_l1 + self.lam_perc * loss_perc + self.lam_smooth * loss_sm

        outputs = dict(depth=depth, albedo=albedo, view=view, light=light,
                       normal=normal, texture=texture, recon_im=recon_im,
                       recon_depth=recon_depth)
        log = dict(loss_l1=loss_l1, loss_perc=loss_perc, loss_smooth=loss_sm)
        return total, log, outputs

    # -- pseudo sampling (gan2shape.py:704-737) ------------------------------
    def sample_pseudo_imgs(self, rng, canon: Dict, batchsize: int):
        """canon: dict with depth/albedo/normal/light of the CURRENT instance
        (first element used, as the reference samples around instance 0)."""
        b, S = batchsize, self.image_size
        x_min, x_max, y_min, y_max, dmin, dmax, alpha = self.rand_light
        r = jax.random.split(rng, 4)
        dxy = jnp.stack([
            jax.random.uniform(r[0], (b,), minval=x_min, maxval=x_max),
            jax.random.uniform(r[1], (b,), minval=y_min, maxval=y_max)], -1)
        light_d = jnp.concatenate([dxy, jnp.ones((b, 1))], 1)
        light_d = light_d / jnp.linalg.norm(light_d, axis=1, keepdims=True)

        normal0 = canon["normal"][:1]
        light_a, light_b, _ = self._light_terms(canon["light"][:1])
        diffuse = jnp.clip((normal0 * light_d[:, None, None, :]).sum(-1), 0.0, None)
        rand = jax.random.uniform(r[2], (b, 1, 1, 1), minval=dmin, maxval=dmax)
        rand_diffuse = (light_b[0, 0] + rand) * diffuse[..., None]
        shading = light_a[0, 0] + alpha * rand + rand_diffuse
        pseudo = (canon["albedo"][:1] / 2 + 0.5) * shading * 2 - 1  # (b,S,S,3)

        depth = jnp.broadcast_to(canon["depth"][:1], (b, S, S))
        mask = jnp.ones((b, S, S, 1))
        views = jax.random.uniform(r[3], (b, 6), minval=-1.0, maxval=1.0)
        views_trans = self._view_trans(views)
        pseudo_im, mask = self.renderer.render_given_view(pseudo, depth,
                                                          views_trans, mask=mask)
        return jnp.clip(pseudo_im, -1, 1), jax.lax.stop_gradient(mask)

    # -- latent projection (gan2shape.py:537-568) ----------------------------
    def latent_project(self, params, model_state, image, latent_w):
        offset = self.encoder_head.apply({"params": params["encoder_head"]}, image)
        hidden = offset + model_state["center_h"]
        mapping = self.generator.mapping_net()
        w = mapping.apply({"params": model_state["gan_params"]["mapping"]},
                          hidden, skip=self.n_mlp - self.F1_d)
        offset_w = w - model_state["center_w"]
        return offset_w, latent_w + offset_w

    def gan_invert(self, params, model_state, image, latent_w, rng):
        offset, latent = self.latent_project(params, model_state, image, latent_w)
        gan_im = self.generator.apply(
            {"params": model_state["gan_params"]}, latent, input_is_latent=True,
            rngs={"noise": rng})
        if self.gan_size != self.image_size:
            gan_im = jax.image.resize(
                gan_im, (gan_im.shape[0], self.image_size, self.image_size, 3),
                "bilinear")
        return jnp.clip(gan_im, -1, 1), offset

    # -- step 2 --------------------------------------------------------------
    def forward_step2(self, params, model_state, batch, rng):
        r1, r2 = jax.random.split(rng)
        canon = {k: batch[k] for k in ("depth", "albedo", "normal", "light")}
        pseudo_im, mask = jax.lax.stop_gradient(
            self.sample_pseudo_imgs(r1, canon, self.batchsize))
        latent_w = batch["latent_w"]
        proj_im, offset = self.gan_invert(params, model_state, pseudo_im,
                                          latent_w, r2)
        loss_l1 = photometric_loss(proj_im, pseudo_im, mask)

        def disc_features(x):
            if x.shape[1] != self.gan_size:
                x = jax.image.resize(x, (x.shape[0], self.gan_size, self.gan_size, 3),
                                     "bilinear")
            _, feats = self.discriminator.apply(
                {"params": model_state["disc_params"]}, x, return_features=True)
            return feats

        loss_rec = self.d_loss(disc_features, proj_im, pseudo_im, mask=mask)
        loss_norm = jnp.mean(offset ** 2)
        total = loss_l1 + loss_rec + self.lam_regular * loss_norm
        log = dict(loss_l1=loss_l1, loss_rec=loss_rec, loss_latent_norm=loss_norm)
        outputs = dict(proj_im=jax.lax.stop_gradient(proj_im),
                       mask=mask, pseudo_im=pseudo_im)
        return total, log, outputs

    # -- step 3 (gan2shape.py:619-694) ---------------------------------------
    def forward_step3(self, params, model_state, batch, rng):
        total1, log1, out1 = self.forward_step1(params, model_state, batch, rng)
        proj_im = batch["proj_im"]      # (b, S, S, 3) collected samples
        mask = batch["proj_mask"]
        b, S = proj_im.shape[0], self.image_size

        view = self.view_head.apply({"params": params["view_head"]}, proj_im)
        view_trans = self._view_trans(view)
        rot_mat, trans_xyz = get_transform_matrices(view_trans)
        light = self.light_head.apply({"params": params["light_head"]}, proj_im)
        light_a, light_b, light_d = self._light_terms(light)

        normal = jnp.broadcast_to(out1["normal"][:1], (b, S, S, 3))
        albedo = jnp.broadcast_to(out1["albedo"][:1], (b, S, S, 3))
        texture, _ = self._shade(albedo, normal, light_a, light_b, light_d)

        depth = jnp.broadcast_to(out1["depth"][:1], (b, S, S))
        recon_depth = self.renderer.warp_canon_depth(depth, rot_mat, trans_xyz)
        grid_2d = self.renderer.get_inv_warped_2d_grid(recon_depth, rot_mat, trans_xyz)
        margin = (self.max_depth - self.min_depth) / 2
        recon_mask = jax.lax.stop_gradient(
            (recon_depth < self.max_depth + margin).astype(proj_im.dtype))[..., None]
        recon_mask = recon_mask * mask
        recon_im = jnp.clip(self.renderer._grid_sample_images(texture, grid_2d), -1, 1)

        loss_l1 = photometric_loss(recon_im, proj_im, recon_mask)
        loss_perc = self.perceptual(recon_im * recon_mask, proj_im * recon_mask).mean()
        total = total1 + loss_l1 + self.lam_perc * loss_perc
        log = dict(log1, step3_l1=loss_l1, step3_perc=loss_perc)
        return total, log, out1

    # -- framework contract --------------------------------------------------
    def loss_fn(self, params, model_state, batch, rng, mode: Optional[str] = None):
        mode = mode or self.mode
        if rng is None:
            rng = jax.random.PRNGKey(0)
        if mode == "step1":
            total, log, _ = self.forward_step1(params, model_state, batch, rng)
        elif mode == "step2":
            total, log, _ = self.forward_step2(params, model_state, batch, rng)
        elif mode == "step3":
            total, log, _ = self.forward_step3(params, model_state, batch, rng)
        else:
            raise ValueError(mode)
        return total, {"log_vars": log, "model_state": model_state}

    def forward_test(self, params, model_state, batch):
        _, _, out = self.forward_step1(params, model_state, batch,
                                       jax.random.PRNGKey(0))
        return {k: out[k] for k in ("depth", "albedo", "normal", "recon_im",
                                    "recon_depth")}, model_state
