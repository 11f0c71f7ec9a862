"""imgs2mesh: multi-view 3DMM face fitting.

Capability parity with /root/reference/deep3dmap/models/frameworks/
imgs2mesh.py:27-282: per-view Shape3dmmEncoder -> BFM parameter-to-vertex
synthesis -> pose/landmark/point losses in the supervised state, cross-view
consistency losses in the unsupervised state, optional UV texture sampling
losses through the (precomputed-rasterization) UV sampler.

State machine (driven by StateMachineRunner, parity
state_machine_runner.py:95-99): losses keyed exactly as the reference —
'sup'-only states use gt point/pose/landmark/texture losses
(imgs2mesh.py:165-215); any state containing 'unsup' uses cross-view
point/scale/texture consistency (imgs2mesh.py:216-244).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...core.all3dmm.bfm_tools import BFMModel, make_synthetic_bfm, load_bfm_mat, param2points_bfm
from ...core.all3dtrans.rotations import euler_angles_to_matrix
from ...core.renderer.uv_sampler import (
    precompute_uv_rasterization,
    sample_uv_texture,
    vertex_visibility,
)
from ..backbones.shape_encoder import Shape3dmmEncoder
from ..builder import RECONSTRUCTORS
from ..losses.basic import l1_loss
from .base import BaseFramework


@RECONSTRUCTORS.register_module(name=["Imgs2Mesh", "imgs2mesh"])
class Imgs2Mesh(BaseFramework):
    is_multi_opt_iters = False

    def __init__(self, model_cfgs: dict, train_cfg=None, test_cfg=None):
        cfg = dict(model_cfgs)
        self.tuplesize = cfg.get("tuplesize", 3)
        self.image_size = cfg.get("image_size", 256)
        self.texture_size = cfg.get("texture_size", 64)
        self.use_sampling = cfg.get("use_sampling", False)
        self.state = "sup"

        if cfg.get("shape_param_path"):
            self.bfm = load_bfm_mat(cfg["shape_param_path"], cfg["exp_param_path"],
                                    cfg["other_param_path"])
        else:
            self.bfm = cfg.get("bfm") or make_synthetic_bfm(
                n_verts=cfg.get("n_verts", 512))

        self.lookview = jnp.asarray([0.0, 0.0, 1.0])
        if self.use_sampling:
            uvs = cfg.get("template_uvs")
            if uvs is None:
                rs = np.random.RandomState(7)
                uvs = rs.rand(self.bfm.n_verts, 2)
            self.template_uvs = np.asarray(uvs, np.float32)
            normals = cfg.get("template_normals")
            if normals is None:
                mu = np.asarray(self.bfm.mu_shape).reshape(-1, 3)
                normals = mu / (np.linalg.norm(mu, axis=1, keepdims=True) + 1e-9)
            if np.mean(np.asarray(normals)[:, 2]) < 0:
                normals = -np.asarray(normals)
            self.template_normals = jnp.asarray(np.asarray(normals, np.float32))
            self.rast = precompute_uv_rasterization(
                self.template_uvs, np.asarray(self.bfm.triangles), self.texture_size)

        self.net = Shape3dmmEncoder(n_param=self.bfm.n_shape + self.bfm.n_exp)

    # -- state machine glue -------------------------------------------------
    def on_state_switch(self, state: str):
        self.state = state

    # -- forward ------------------------------------------------------------
    def _forward(self, params, batch):
        """imgs (B, V, H, W, 3) -> per-view points/poses (imgs2mesh.py:69-126)."""
        imgs = batch["imgs"]
        B, V = imgs.shape[0], imgs.shape[1]
        outpts, outpose = [], []
        for k in range(V):
            preds = self.net.apply(params, imgs[:, k])
            pts, pose = param2points_bfm(self.bfm, preds)
            pts = jnp.clip(pts, -125000.0, 125000.0)
            outpts.append(pts)
            outpose.append(pose)
        return outpts, outpose

    def _project(self, pts, s, R, T):
        """(s * R @ pts^T + T*image_size)^T (imgs2mesh.py:109,115)."""
        proj = s[:, None, None] * jnp.einsum("bij,bnj->bni", R, pts)
        return proj + T[:, None, :] * self.image_size

    def _uv_sample(self, imgs_k, pts, pose):
        s = pose[:, 0]
        angles = jnp.clip(pose[:, 1:4], -3.1415, 3.1415)
        R = euler_angles_to_matrix(angles, "XYZ")
        T = pose[:, 4:7]
        fp = self._project(pts, s, R, T)[..., :2] / self.image_size
        fp = fp.at[..., 1].set(1.0 - fp[..., 1])
        vis = vertex_visibility(self.template_normals, angles, self.lookview)
        return sample_uv_texture(self.rast, imgs_k, fp, vis)

    # -- losses (parity: imgs2mesh.py:163-247) ------------------------------
    def _losses(self, params, batch, state):
        outpts, outpose = self._forward(params, batch)
        V = len(outpts)
        losses = {}

        if "sup" in state and "unsup" not in state:
            gtaux = batch["gtaux"]    # (B, V, 152)
            gtobj = batch["gtobj"]    # (B, N, 3)
            ptsloss = sum(1e-4 * l1_loss(outpts[k], gtobj) for k in range(V))
            losses["ptsloss"] = ptsloss

            poseloss = 0.0
            lm68loss = 0.0
            kp = self.bfm.keypoints
            for k in range(V):
                s = outpose[k][:, 0]
                T = outpose[k][:, 4:7]
                reflm68 = gtaux[:, k, :136].reshape(-1, 68, 2)
                refs = gtaux[:, k, 136]
                refT = gtaux[:, k, 146:149]
                refAngle = gtaux[:, k, 149:152]
                poseloss += (20.0 * l1_loss(s, refs)
                             + l1_loss(outpose[k][:, 1:4], refAngle)
                             + l1_loss(T[:, :2], refT[:, :2]))
                angles = jnp.clip(outpose[k][:, 1:4], -3.1415, 3.1415)
                R = euler_angles_to_matrix(angles, "XYZ")
                lm68 = self._project(outpts[k], s, R, T)[:, kp, :2]
                lm68loss += 0.02 * l1_loss(lm68, reflm68)
            losses["poseloss"] = poseloss
            losses["lm68loss"] = lm68loss

            if self.use_sampling:
                uvtex = batch["uvtex"]  # (B, S, S, 3)
                texloss = 0.0
                for k in range(V):
                    uvimg, uvmask = self._uv_sample(batch["imgs"][:, k], outpts[k], outpose[k])
                    texloss += 2.0 * (jnp.abs(uvimg - uvtex) * uvmask).mean()
                losses["texloss"] = texloss

        if "unsup" in state:
            pts_c = sum(0.01 * l1_loss(outpts[k], outpts[k + 1]) for k in range(V - 1))
            losses["pts_consistent_loss"] = pts_c
            scale_c = sum(2000.0 * l1_loss(outpose[k][:, 0], outpose[k + 1][:, 0])
                          for k in range(V - 1))
            losses["scale_consistent_loss"] = scale_c
            if self.use_sampling:
                uvs = [self._uv_sample(batch["imgs"][:, k], outpts[k], outpose[k])
                       for k in range(V)]
                tex_c = 0.0
                for k in range(V - 1):
                    m = uvs[k][1] * uvs[k + 1][1]
                    tex_c += 200.0 * (jnp.abs(uvs[k][0] - uvs[k + 1][0]) * m).mean()
                losses["tex_consistent_loss"] = tex_c

        return losses, (outpts, outpose)

    # -- framework contract --------------------------------------------------
    def init(self, rng, batch):
        params = jax.jit(self.net.init)(rng, batch["imgs"][:, 0])
        return params, {}

    def loss_fn(self, params, model_state, batch, rng, state: Optional[str] = None,
                opt_seq: Optional[str] = None):
        state = state if state is not None else self.state
        losses, _ = self._losses(params, batch, state)
        total = sum(losses.values())
        return total, {"log_vars": losses, "model_state": model_state}

    def val_fn(self, params, model_state, batch):
        losses, _ = self._losses(params, batch, self.state)
        return {"log_vars": losses}

    def forward_test(self, params, model_state, batch):
        outpts, outpose = self._forward(params, batch)
        return {"outpts_list": outpts, "outpose_list": outpose}, model_state
