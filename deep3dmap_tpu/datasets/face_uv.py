"""Synthetic face-UV dataset for PRNet (300W-LP stand-in) with NME eval.

Parity surface: /root/reference/deep3dmap/datasets/threehundred_wlp.py +
AFLW2000.py:131 (evaluate('nme')).
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.evaluation.face_eval import eval_nme
from .builder import DATASETS


@DATASETS.register_module()
class SyntheticFaceUVDataset:
    def __init__(self, n_samples: int = 16, resolution: int = 64, seed: int = 0,
                 pipeline=None):
        self.n_samples = n_samples
        self.resolution = resolution
        self.seed = seed
        rs = np.random.RandomState(seed + 7)
        S = resolution
        # fixed smooth mapping image -> uv position map so the task is learnable
        self._mix = rs.rand(3, 3).astype(np.float32)
        self._cache: Dict[int, Dict] = {}

    def __len__(self):
        return self.n_samples

    def _make(self, idx):
        rs = np.random.RandomState(self.seed + idx)
        S = self.resolution
        img = rs.rand(S, S, 3).astype(np.float32)
        uv = np.clip(img @ self._mix, 0, 1).astype(np.float32)
        tform = np.eye(3, dtype=np.float32)
        return dict(faceimg=img, gt_uvimg=uv, tform_mat=tform,
                    gt_kpt_proj2d=np.zeros((2, 68), np.float32))

    def __getitem__(self, idx):
        if idx not in self._cache:
            self._cache[idx] = self._make(idx)
        return self._cache[idx]

    def evaluate(self, results, metric="nme", **kwargs):
        """results: dict with 'kpt' list of (B, 3, 68) arrays (tools/test.py
        collection format)."""
        if metric not in ("nme", "rmse"):
            raise KeyError(f"metric {metric} is not supported")
        kpt = np.concatenate(results["kpt"], axis=0)
        n = kpt.shape[0]
        tforms = np.stack([self[i]["tform_mat"] for i in range(min(n, len(self)))])
        # synthetic gt: landmarks from the gt uv map at the framework's
        # default BFM-derived indices (deterministic, matches FaceImg2UV)
        from ..models.frameworks.prnet import uv_kpt_ind_from_bfm
        ind = uv_kpt_ind_from_bfm(None, self.resolution)
        gts = []
        for i in range(min(n, len(self))):
            uv = self[i]["gt_uvimg"]
            k = uv[ind[1], ind[0], :2].T * 255.0  # (2, 68)
            gts.append(k)
        gt = np.stack(gts)
        nme = eval_nme(kpt[:len(gt)], tforms, gt)
        return {"nme": nme}
