"""Synthetic posed-image dataset for NeRF/GNeRF (Blender-dataset analogue).

Parity surface: /root/reference/deep3dmap/datasets/blender.py:11 and
dtu.py:10 — images + intrinsics (+ held-out poses); rendered here by
sphere-tracing the same SDF scenes as the ScanNet-like generator.
"""
from __future__ import annotations

from typing import Dict

import numpy as np

from .builder import DATASETS
from .synthetic import look_at_pose, sphere_trace_depth


@DATASETS.register_module()
class SyntheticNerfDataset:
    name = "synthetic_nerf"

    def __init__(self, n_images: int = 8, img_wh=(64, 64), radius: float = 2.0,
                 elev_deg: float = 30.0, seed: int = 0, split: str = "train",
                 color_mode: str = "shade", pipeline=None):
        """color_mode: 'shade' colors by camera distance (view-DEPENDENT —
        fine for rendering-pipeline tests); 'position' colors each surface
        point by its world position (photo-CONSISTENT across views — required
        for pose-recovery/convergence tests, where view-dependent shading
        would leave poses unconstrained)."""
        self.n_images = n_images
        self.img_wh = tuple(img_wh)
        W, H = self.img_wh
        self.intrinsics = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)

        rs = np.random.RandomState(seed)
        spheres = np.array([[0.0, 0.0, 0.25, 0.35],
                            [0.3, 0.2, 0.1, 0.18]], np.float32)
        elev = np.deg2rad(elev_deg)
        offset = rs.uniform(0, 2 * np.pi) if split == "val" else 0.0
        self.images, self.poses = [], []
        for i in range(n_images):
            a = 2 * np.pi * i / n_images + offset
            eye = np.array([radius * np.cos(a) * np.cos(elev),
                            radius * np.sin(a) * np.cos(elev),
                            radius * np.sin(elev)], np.float32)
            pose = look_at_pose(eye, np.zeros(3, np.float32))
            depth = sphere_trace_depth(self.intrinsics, pose, H, W, spheres,
                                       floor_z=-10.0, max_depth=2 * radius)
            if color_mode == "position":
                # world hit points -> smooth position-keyed albedo
                u, v = np.meshgrid(np.arange(W), np.arange(H))
                K = self.intrinsics
                dirs = np.stack([(u - K[0, 2]) / K[0, 0],
                                 (v - K[1, 2]) / K[1, 1],
                                 np.ones_like(u, np.float32)], -1)
                dirs = dirs @ pose[:3, :3].T
                dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
                pts = pose[:3, 3] + dirs * depth[..., None]
                img = 0.5 + 0.5 * np.sin(
                    pts * np.array([3.0, 4.0, 5.0]) + np.array([0.0, 1.3, 2.1]))
                img = np.where(depth[..., None] > 0, img, 0.0).astype(np.float32)
            else:
                shade = np.where(depth > 0, 1.0 - depth / (2 * radius), 0.0)
                img = np.stack([shade, shade * 0.8, shade * 0.6], -1).astype(np.float32)
            self.images.append(img * 2.0 - 1.0)  # [-1, 1]
            self.poses.append(pose)

    def __len__(self):
        return self.n_images

    def __getitem__(self, idx: int) -> Dict:
        return dict(imgs=self.images[idx], img_idx=np.int32(idx))
