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


@DATASETS.register_module()
class MultiPIEFaceTupleDataset:
    """Real MultiPIE multi-view tuples from the data-gen pkl indexes.

    Binds the layout produced by ``tools/data_gen/multipie.py organize``
    (parity: /root/reference/deep3dmap/datasets/multipie_3d.py:57-170
    get_batch_supervise over multipie_uvtex2poseimgs.pkl +
    multipie_imgpath2auxinfo.pkl; config binding
    /root/reference/configs/pt3d_demos/imgs2face_multipie.py data.train_sup):
    each sample is a ``tuplesize`` set of pose views of one capture with the
    registered 3D scan as gtobj and the per-view FAN/weak-perspective aux in
    the reference's 152-float gtaux layout (lm68[136]+s[1]+R[9]+t[3]+ang[3]).

    Args:
        datadir: directory with the two pkl indexes.
        imgdir: image root the pkl paths are relative to.
        objroot: directory with registered scans ``<id>_<sess>_<rec>.obj``.
        tuplesize: views per sample.
        image_size: output image side (resized square).
    """

    state = "sup"

    def __init__(self, datadir: str, imgdir: str, objroot: str,
                 tuplesize: int = 3, image_size: int = 64, seed: int = 0,
                 uvtex_index: str = "multipie_uvtex2poseimgs.pkl",
                 aux_index: str = "multipie_imgpath2auxinfo.pkl",
                 pipeline=None):
        import os.path as osp
        import pickle

        self.imgdir = imgdir
        self.objroot = objroot
        self.tuplesize = tuplesize
        self.image_size = image_size
        self.seed = seed
        with open(osp.join(datadir, uvtex_index), "rb") as f:
            uvtex2poseimgs = pickle.load(f)
        with open(osp.join(datadir, aux_index), "rb") as f:
            self.aux = pickle.load(f)
        # flatten: one entry per uvtex capture with >= tuplesize usable views
        self.entries = []
        for uvtex, pose2imgs in sorted(uvtex2poseimgs.items()):
            paths = [p for ps in pose2imgs.values() for p in ps
                     if self._usable(p)]
            if len(paths) >= tuplesize:
                self.entries.append((uvtex, sorted(paths)))

    def _usable(self, path):
        a = self.aux.get(path)
        return a is not None and not np.isscalar(a.get("lm68"))

    def __len__(self):
        return len(self.entries)

    def _load_image(self, path):
        import cv2
        import os.path as osp

        img = cv2.imread(osp.join(self.imgdir, path))
        if img is None:
            raise FileNotFoundError(osp.join(self.imgdir, path))
        h, w = img.shape[:2]
        img = cv2.resize(img[:, :, ::-1], (self.image_size, self.image_size))
        return img.astype(np.float32) / 255.0, (w, h)

    def __getitem__(self, idx):
        import os.path as osp

        from ..core.all3dtrans.lmk2angle import matrix2angle

        uvtex, paths = self.entries[idx]
        rs = np.random.RandomState(self.seed + idx)
        pick = rs.choice(len(paths), self.tuplesize, replace=False)
        S = self.image_size

        imgs, gtaux = [], []
        for i in pick:
            path = paths[int(i)]
            img, (w, h) = self._load_image(path)
            imgs.append(img)
            a = self.aux[path]
            lm68 = np.asarray(a["lm68"], np.float32)
            # rescale landmarks/translation into resized-image pixels
            sx, sy = S / float(w), S / float(h)
            lm68 = lm68 * np.asarray([[sx, sy]], np.float32)
            s = np.float32(a["s"]) * np.float32(sx)
            R = np.asarray(a["R"], np.float64)
            t = np.asarray(a["t"], np.float64).reshape(-1)[:3]
            t = t * np.asarray([sx, sy, 1.0])
            ang = np.asarray(matrix2angle(R), np.float32)
            gtaux.append(np.concatenate([
                lm68.reshape(-1), [s], R.reshape(-1).astype(np.float32),
                t.astype(np.float32), ang]).astype(np.float32))

        key = osp.basename(uvtex).split(".")[0]
        objp = osp.join(self.objroot, key + ".obj")
        gtobj = _read_obj_verts(objp).astype(np.float32)

        return dict(imgs=np.stack(imgs), gtobj=gtobj,
                    gtaux=np.stack(gtaux))


def _read_obj_verts(objpath: str) -> np.ndarray:
    """Vertex positions from a .obj (multipie_orgnizedata.py:11-24)."""
    verts = []
    with open(objpath) as f:
        for line in f:
            if line.startswith("v "):
                verts.append([float(x) for x in line.split()[1:4]])
    return np.asarray(verts, np.float64)
