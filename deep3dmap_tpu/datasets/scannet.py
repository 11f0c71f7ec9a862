"""ScanNet fragment dataset + distributed evaluation.

Parity: /root/reference/deep3dmap/datasets/scannet.py:40-336 —
fragment-based samples (keyframe windows + metadata pkl from the data-gen
tool, tools/data_gen/scannet.py), per-frame readers, and the ray-distributed
evaluation (:157-290) re-expressed as a host process pool: per scene, render
predicted-mesh depth at GT poses (native C++ rasterizer), compute depth
metrics, and point-sampled F-score against the GT mesh.
"""
from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Dict, List, Optional

import numpy as np

from .builder import DATASETS
from .pipelines.compose import Compose


def _read_matrix(path):
    return np.loadtxt(path).astype(np.float32)


@DATASETS.register_module()
class ScanNetDataset:
    """Expects the standard exported layout:

    datapath/
      scans[_test]/<scene>/color/<i>.jpg  depth/<i>.png  pose/<i>.txt
                           intrinsic/intrinsic_depth.txt
      fragments_<mode>.pkl   (from tools/data_gen/scannet.py)
    """

    def __init__(self, datapath: str, mode: str = "train", nviews: int = 9,
                 n_scales: int = 2, img_size=(640, 480), n_vox: int = 96,
                 voxel_size: float = 0.04, epoch: int = 0, pipeline=None):
        self.datapath = datapath
        self.mode = mode
        self.nviews = nviews
        self.n_scales = n_scales
        self.img_size = tuple(img_size)
        self.n_vox = n_vox
        self.voxel_size = voxel_size
        self.epoch = epoch
        self.pipeline = Compose(pipeline) if pipeline else None

        frag_path = osp.join(datapath, f"fragments_{mode.replace('_debug', '')}.pkl")
        if osp.exists(frag_path):
            with open(frag_path, "rb") as f:
                self.metas: List[Dict] = pickle.load(f)
            if mode.endswith("_debug"):
                self.metas = self.metas[:8]
        else:
            self.metas = []

    def __len__(self):
        return len(self.metas)

    def _scene_dir(self, scene):
        sub = "scans_test" if self.mode.startswith("test") else "scans"
        return osp.join(self.datapath, sub, scene)

    def read_frame(self, scene: str, frame_id: int):
        import cv2

        d = self._scene_dir(scene)
        img = cv2.imread(osp.join(d, "color", f"{frame_id}.jpg"))
        depth = cv2.imread(osp.join(d, "depth", f"{frame_id}.png"),
                           cv2.IMREAD_ANYDEPTH).astype(np.float32) / 1000.0
        pose = _read_matrix(osp.join(d, "pose", f"{frame_id}.txt"))
        intr = _read_matrix(osp.join(d, "intrinsic", "intrinsic_depth.txt"))[:3, :3]
        return img, depth, intr, pose

    def __getitem__(self, idx: int) -> Dict:
        meta = self.metas[idx]
        imgs, depths, intrs, poses = [], [], [], []
        for fid in meta["image_ids"][: self.nviews]:
            img, depth, intr, pose = self.read_frame(meta["scene"], fid)
            imgs.append(img)
            depths.append(depth)
            intrs.append(intr.copy())
            poses.append(pose)
        data = dict(
            imgs=imgs, depth=depths, intrinsics=intrs, extrinsics=poses,
            vol_origin=np.asarray(meta.get("vol_origin", np.zeros(3)), np.float32),
            scene=meta["scene"], fragment=f"{meta['scene']}_{meta.get('fragment_id', idx)}",
            epoch=[self.epoch],
            scene_reset=np.float32(meta.get("scene_reset", idx == 0)),
        )
        if self.pipeline:
            data = self.pipeline(data)
        return data

    # -- evaluation (scannet.py:157-290, process pool instead of ray) --------
    def evaluate(self, outputs, metric: str = "depth_mesh", save_path: Optional[str] = None,
                 n_proc: int = 2, max_depth: float = 10.0, **kwargs):
        from ..core.evaluation import eval_depth, eval_fscore_points
        from ..core.utils.io_ply import read_ply

        results = {}
        scene_names = outputs.get("scene_name", [])
        jobs = []
        for i, scene in enumerate(scene_names):
            jobs.append((scene, outputs["mesh_path"][i], self._scene_dir(scene),
                         max_depth))

        if not jobs:
            return results

        from multiprocessing import get_context

        with get_context("spawn").Pool(min(n_proc, len(jobs))) as pool:
            per_scene = pool.map(_eval_one_scene, jobs)

        agg: Dict[str, List[float]] = {}
        for m in per_scene:
            for k, v in m.items():
                agg.setdefault(k, []).append(v)
        for k, vals in agg.items():
            results[k] = float(np.mean(vals))
        return results


def _eval_one_scene(job):
    """Worker: depth metrics (rendered predicted mesh vs GT depth frames) +
    F-score vs GT mesh points."""
    scene, mesh_path, scene_dir, max_depth = job
    import cv2
    import numpy as np

    from deep3dmap_tpu.core.evaluation import eval_depth, eval_fscore_points
    from deep3dmap_tpu.core.utils.io_ply import read_ply
    from deep3dmap_tpu import native

    verts, faces = read_ply(mesh_path)
    metrics: Dict[str, List[float]] = {}

    pose_dir = osp.join(scene_dir, "pose")
    depth_dir = osp.join(scene_dir, "depth")
    intr = _read_matrix(osp.join(scene_dir, "intrinsic", "intrinsic_depth.txt"))[:3, :3]
    frame_ids = sorted(int(f[:-4]) for f in os.listdir(depth_dir))[::10]

    depth_metrics = []
    for fid in frame_ids:
        gt_depth = cv2.imread(osp.join(depth_dir, f"{fid}.png"),
                              cv2.IMREAD_ANYDEPTH).astype(np.float32) / 1000.0
        pose = _read_matrix(osp.join(pose_dir, f"{fid}.txt"))
        w2c = np.linalg.inv(pose)
        cam = verts @ w2c[:3, :3].T + w2c[:3, 3]
        z = cam[:, 2:3]
        pix = (cam / np.maximum(z, 1e-6)) @ intr.T
        pv = np.concatenate([pix[:, :2], cam[:, 2:3]], 1).astype(np.float32)
        h, w = gt_depth.shape
        rendered = native.render_depth(pv, faces, h, w)
        depth_metrics.append(eval_depth(rendered, gt_depth, max_depth=max_depth))

    out = {}
    if depth_metrics:
        for k in depth_metrics[0]:
            out[k] = float(np.mean([m[k] for m in depth_metrics]))

    gt_mesh = osp.join(scene_dir, f"{scene}_vh_clean_2.ply")
    if osp.exists(gt_mesh):
        gt_verts, _ = read_ply(gt_mesh)
        out.update(eval_fscore_points(verts, gt_verts))
    return out
