"""Mesh preview rendering (open3d-free).

The reference uses an open3d non-blocking viewer
(/root/reference/deep3dmap/core/visualize/visualize.py:8); open3d is not in
the TPU image, so previews render through the native z-buffer rasterizer to
PNG — usable headless and in CI.
"""
from __future__ import annotations

from typing import Optional

import numpy as np


def save_mesh_preview(verts: np.ndarray, faces: np.ndarray, save_path: str,
                      size: int = 512, elev_deg: float = 30.0,
                      azim_deg: float = 45.0) -> str:
    from ...native import rasterize_mesh

    verts = np.asarray(verts, np.float64)
    if len(verts) == 0:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        plt.text(0.5, 0.5, "empty mesh", ha="center")
        fig.savefig(save_path)
        plt.close(fig)
        return save_path

    center = verts.mean(0)
    v = verts - center
    # rotate by azim around z then elev around x
    a, e = np.deg2rad(azim_deg), np.deg2rad(elev_deg)
    Rz = np.array([[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]])
    Rx = np.array([[1, 0, 0], [0, np.cos(e), -np.sin(e)], [0, np.sin(e), np.cos(e)]])
    v = v @ (Rx @ Rz).T
    extent = np.abs(v).max() + 1e-9
    px = (v[:, 0] / extent * 0.45 + 0.5) * (size - 1)
    py = (v[:, 1] / extent * 0.45 + 0.5) * (size - 1)
    pz = v[:, 2] - v[:, 2].min() + 1.0

    # simple normal-ish shading from depth gradient: color by height
    shade = (v[:, 2] - v[:, 2].min()) / (np.ptp(v[:, 2]) + 1e-9)
    colors = np.stack([0.3 + 0.7 * shade] * 3, -1).astype(np.float32)

    pv = np.stack([px, py, pz], -1).astype(np.float32)
    img, _ = rasterize_mesh(pv, np.asarray(faces, np.int64), colors, size, size)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.imsave(save_path, np.clip(img, 0, 1))
    return save_path
