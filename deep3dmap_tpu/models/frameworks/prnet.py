"""PRNet: single-image face UV position-map regression.

Capability parity with the reference's faceimg2uv framework
(/root/reference/deep3dmap/models/frameworks/rgb2uv.py:17-123): ResFCN256
backbone regressing a (R, R, 3) UV position map, weighted-mask L1 loss over
the map plus L1 on the 68 landmark texels, NME evaluation against inverse
crop transforms (core/evaluation/face_eval.py).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..backbones.resfcn256 import ResFCN256
from ..builder import RECONSTRUCTORS
from ..losses.basic import l1_loss, mask_l1_loss
from .base import BaseFramework


def default_uv_kpt_ind(resolution: int = 256, n_kpt: int = 68) -> np.ndarray:
    """Deterministic fallback landmark texel indices (2, 68) when the
    standard uv_kpt_ind.txt asset is not supplied."""
    rs = np.random.RandomState(42)
    xs = rs.randint(resolution // 8, resolution * 7 // 8, n_kpt)
    ys = rs.randint(resolution // 8, resolution * 7 // 8, n_kpt)
    return np.stack([xs, ys]).astype(np.int32)


@RECONSTRUCTORS.register_module(name=["FaceImg2UV", "faceimg2uv"])
class FaceImg2UV(BaseFramework):
    def __init__(self, model_cfgs: dict, train_cfg=None, test_cfg=None, pretrained=None):
        cfg = dict(model_cfgs)
        self.resolution = cfg.get("resolution", 256)
        self.kpt_weight = cfg.get("kpt_weight", 1.0)

        # landmark texel indices: from file (uv_kpt_ind_file), array, or default
        if cfg.get("uv_kpt_ind") is not None:
            self.uv_kpt_ind = np.asarray(cfg["uv_kpt_ind"], np.int32)
        elif cfg.get("uv_kpt_ind_file"):
            self.uv_kpt_ind = np.loadtxt(cfg["uv_kpt_ind_file"]).astype(np.int32)
        else:
            self.uv_kpt_ind = default_uv_kpt_ind(self.resolution)

        # weighted mask (R, R, 1): from arrays/files or uniform
        mask = cfg.get("weight_mask")
        if mask is None and cfg.get("weightmaskfile"):
            import cv2
            m = cv2.imread(cfg["weightmaskfile"]).astype(np.float64)
            if cfg.get("facemaskfile"):
                m = m * cv2.imread(cfg["facemaskfile"]).astype(np.float64)
            m = m / max(m.max(), 1e-12)
            mask = m[..., :1]
        if mask is None:
            mask = np.ones((self.resolution, self.resolution, 1), np.float32)
        self.weight_mask = jnp.asarray(np.asarray(mask, np.float32).reshape(
            self.resolution, self.resolution, -1)[..., :1])

        self.net = ResFCN256(out_ch=3, base=int(cfg.get("base_channels", 16)))

    def _kpts(self, uvpos):
        """uvpos (B, R, R, 3) -> (B, 3, 68) at landmark texels (rgb2uv.py:40)."""
        x_ind, y_ind = self.uv_kpt_ind[0], self.uv_kpt_ind[1]
        k = uvpos[:, y_ind, x_ind, :]  # (B, 68, 3)
        return jnp.transpose(k, (0, 2, 1))

    def init(self, rng, batch):
        params = jax.jit(self.net.init)(rng, batch["faceimg"])
        return params, {}

    def loss_fn(self, params, model_state, batch, rng):
        uvpos = self.net.apply(params, batch["faceimg"])
        loss_uv = mask_l1_loss(uvpos, batch["gt_uvimg"], self.weight_mask[None])
        kpt_pred = self._kpts(uvpos)
        kpt_tgt = self._kpts(batch["gt_uvimg"])
        loss_kpt = l1_loss(kpt_pred, kpt_tgt) * self.kpt_weight
        total = loss_uv + loss_kpt
        return total, {"log_vars": {"loss_uv": loss_uv, "loss_kpt": loss_kpt},
                       "model_state": model_state}

    def val_fn(self, params, model_state, batch):
        uvpos = self.net.apply(params, batch["faceimg"])
        loss_uv = mask_l1_loss(uvpos, batch["gt_uvimg"], self.weight_mask[None])
        return {"log_vars": {"loss_uv": loss_uv}}

    def forward_test(self, params, model_state, batch):
        uvpos = self.net.apply(params, batch["faceimg"])
        return {"uvpos": uvpos, "kpt": self._kpts(uvpos)}, model_state
