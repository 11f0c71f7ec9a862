"""Synthetic multi-view face-tuple dataset for the imgs2mesh path.

Plays the role of the MultiPIE datasets
(/root/reference/deep3dmap/datasets/multipie_3d.py) without the licensed
data: each sample is a V-view tuple of a random identity — ground-truth 3DMM
points (from a shared synthetic BFM), per-view pose aux vectors in the
reference's gtaux layout (lm68[136] + scale[1] + R[9] + T[3] + angles[3] =
152, imgs2mesh.py:104-189), and images deterministically derived from the
latent parameters so the encoder has signal to learn.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from ..core.all3dmm.bfm_tools import BFMModel, make_synthetic_bfm, param2points_bfm
from ..core.all3dtrans.rotations import euler_angles_to_matrix
from .builder import DATASETS


@DATASETS.register_module()
class SyntheticFaceTupleDataset:
    state = "sup"

    def __init__(self, n_samples: int = 8, tuplesize: int = 3, image_size: int = 64,
                 bfm: BFMModel = None, n_verts: int = 512, seed: int = 0,
                 pipeline=None):
        import jax.numpy as jnp

        self.n_samples = n_samples
        self.tuplesize = tuplesize
        self.image_size = image_size
        self.bfm = bfm if bfm is not None else make_synthetic_bfm(n_verts=n_verts)
        self.seed = seed
        rs = np.random.RandomState(seed + 999)
        # fixed random decoder: params -> image (deterministic "rendering")
        n_param = self.bfm.n_shape + self.bfm.n_exp + 7
        self._dec = rs.randn(n_param, image_size * image_size * 3).astype(np.float32) * 0.05
        self._cache: Dict[int, Dict] = {}

    def __len__(self):
        return self.n_samples

    def _make(self, idx: int) -> Dict:
        import jax.numpy as jnp

        rs = np.random.RandomState(self.seed + idx)
        ns, ne = self.bfm.n_shape, self.bfm.n_exp
        V, S = self.tuplesize, self.image_size

        theta = rs.randn(ns + ne).astype(np.float32) * 0.1
        imgs, gtaux_list, poses = [], [], []
        for k in range(V):
            scale = np.float32(1e-3 + rs.rand() * 1e-3)
            angles = rs.uniform(-0.4, 0.4, 3).astype(np.float32)
            T = rs.uniform(0.2, 0.8, 3).astype(np.float32)
            pose = np.concatenate([[scale], angles, T]).astype(np.float32)
            poses.append(pose)
            full = np.concatenate([theta, pose])
            img = np.tanh(full @ self._dec).reshape(S, S, 3) * 0.5 + 0.5
            imgs.append(img.astype(np.float32))

        preds = np.concatenate([theta, poses[0]])[None]
        pts, _ = param2points_bfm(self.bfm, jnp.asarray(preds))
        gtobj = np.asarray(pts[0])

        kp = np.asarray(self.bfm.keypoints)
        for k in range(V):
            pose = poses[k]
            R = np.asarray(euler_angles_to_matrix(jnp.asarray(pose[1:4]), "XYZ"))
            proj = (pose[0] * (gtobj @ R.T) + pose[4:7][None] * S)
            lm68 = proj[kp, :2].astype(np.float32)
            gtaux_list.append(np.concatenate([
                lm68.reshape(-1), [pose[0]], R.reshape(-1), pose[4:7], pose[1:4],
            ]).astype(np.float32))

        return dict(
            imgs=np.stack(imgs),                 # (V, S, S, 3)
            gtobj=gtobj.astype(np.float32),      # (N, 3)
            gtaux=np.stack(gtaux_list),          # (V, 152)
        )

    def __getitem__(self, idx):
        if idx not in self._cache:
            self._cache[idx] = self._make(idx)
        return self._cache[idx]
