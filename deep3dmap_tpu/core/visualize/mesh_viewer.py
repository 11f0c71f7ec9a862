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


class LiveMeshViewer:
    """Incremental mesh preview during streaming inference.

    Parity: /root/reference/deep3dmap/core/visualize/visualize.py:8-50 — the
    reference opens a non-blocking open3d window and refreshes the growing
    scene mesh as fragments arrive.  Here: the same non-blocking open3d
    window when open3d is importable; otherwise (headless TPU hosts, CI)
    each refresh writes a PNG snapshot via the native z-buffer rasterizer so
    the stream stays observable without a display.
    """

    def __init__(self, save_dir: Optional[str] = None, window: bool = True,
                 size: int = 512):
        self.save_dir = save_dir
        self.size = size
        self.n_updates = 0
        self._vis = None
        self._o3d = None
        self._geom = None
        if window:
            try:
                import open3d as o3d

                self._o3d = o3d
                self._vis = o3d.visualization.Visualizer()
                self._vis.create_window("deep3dmap_tpu", width=size,
                                        height=size, visible=True)
            except Exception:
                self._vis = None
        if save_dir:
            import os

            os.makedirs(save_dir, exist_ok=True)

    def update(self, verts: np.ndarray, faces: np.ndarray) -> Optional[str]:
        """Refresh with the current full mesh; returns the snapshot path
        when running headless."""
        self.n_updates += 1
        if self._vis is not None:
            o3d = self._o3d
            mesh = o3d.geometry.TriangleMesh(
                o3d.utility.Vector3dVector(np.asarray(verts, np.float64)),
                o3d.utility.Vector3iVector(np.asarray(faces, np.int32)))
            mesh.compute_vertex_normals()
            if self._geom is not None:
                self._vis.remove_geometry(self._geom, reset_bounding_box=False)
            self._vis.add_geometry(mesh, reset_bounding_box=(self.n_updates == 1))
            self._geom = mesh
            self._vis.poll_events()
            self._vis.update_renderer()
            return None
        if self.save_dir:
            import os.path as osp

            path = osp.join(self.save_dir, f"preview_{self.n_updates:04d}.png")
            return save_mesh_preview(np.asarray(verts), np.asarray(faces),
                                     path, size=self.size)
        return None

    def close(self):
        if self._vis is not None:
            self._vis.destroy_window()
            self._vis = None
