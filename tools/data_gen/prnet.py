"""300W-LP -> PRNet training data: cropped face images + UV position maps.

Capability parity with /root/reference/tools/data_gen/prnet.py:1-143
(GeneratePos): for each 300W-LP image + .mat (Pose_Para / Shape_Para /
Exp_Para), synthesize the BFM mesh, project with the 3DDFA weak-perspective
camera, crop around the projected landmarks with a random-perturbed
similarity transform, and rasterize the UV position map (per-UV-texel 3D
position) — saved as ``<name>_inp.jpg`` + ``<name>.npy``, the exact layout
``ThreeHundredWLPDataset`` (datasets/real_files.py) reads.

Also writes ``uv_kpt_ind.txt`` (landmark texel indices) once per run — the
asset the PRNet NME evaluation requires (frameworks/prnet.py).

TPU-irrelevant by design: this is host-side data preparation.  The UV
rasterization uses the native C++ z-buffer (deep3dmap_tpu.native
rasterize_mesh) with a numpy fallback — the reference used its Cython
renderer (renderer_demo/mesh_cython) for the same step.

Without the licensed BFM assets, ``--synthetic-bfm`` exercises the full
pipeline against the deterministic synthetic BFM (tests / smoke runs).
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time
from glob import glob

import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))))


def load_bfm_full(model_path: str, info_path: str):
    """Load the reference's magicbox BFM.mat + BFM_info.mat pair.

    Returns (mu (3N,), w_shape (3N,S), w_exp (3N,E), tri (T,3) int,
    kpt_ind (68,) int, uv_coords (N,2) in [0,1])."""
    import scipy.io as sio

    m = sio.loadmat(model_path)
    info = sio.loadmat(info_path)
    model = m["model"][0, 0] if "model" in m else m
    mu = np.asarray(model["shapeMU"], np.float64).reshape(-1)
    w_shape = np.asarray(model["shapePC"], np.float64)
    w_exp = np.asarray(model["expPC"], np.float64)
    tri = np.asarray(model["tri"], np.int64).T - 1
    kpt = np.asarray(model["kpt_ind"], np.int64).reshape(-1) - 1
    uv = np.asarray(info["uv_coords"], np.float64)
    if uv.shape[0] == 2:
        uv = uv.T
    return mu, w_shape, w_exp, tri, kpt, uv


def synthetic_bfm_full(n_verts: int = 512):
    """Synthetic stand-in with the same tuple layout (tests / smoke)."""
    from deep3dmap_tpu.core.all3dmm.bfm_tools import make_synthetic_bfm
    from deep3dmap_tpu.models.frameworks.prnet import bfm_uv_coords

    bfm = make_synthetic_bfm(n_verts=n_verts)
    mu = np.asarray(bfm.mu_shape).reshape(-1)
    uv01 = bfm_uv_coords(bfm, 1000) / 999.0  # continuous [0,1] uv coords
    return (mu, np.asarray(bfm.w_shape), np.asarray(bfm.w_exp),
            np.asarray(bfm.triangles), np.asarray(bfm.keypoints), uv01)


def angles_to_rotation(angles) -> np.ndarray:
    """3DDFA convention: R = Rx(phi) @ Ry(gamma) @ Rz(theta)."""
    phi, gamma, theta = float(angles[0]), float(angles[1]), float(angles[2])
    rx = np.array([[1, 0, 0],
                   [0, np.cos(phi), -np.sin(phi)],
                   [0, np.sin(phi), np.cos(phi)]])
    ry = np.array([[np.cos(gamma), 0, np.sin(gamma)],
                   [0, 1, 0],
                   [-np.sin(gamma), 0, np.cos(gamma)]])
    rz = np.array([[np.cos(theta), -np.sin(theta), 0],
                   [np.sin(theta), np.cos(theta), 0],
                   [0, 0, 1]])
    return rx @ ry @ rz


def project_3ddfa(vertices: np.ndarray, pose_para: np.ndarray) -> np.ndarray:
    """Weak-perspective projection, 300W-LP Pose_Para layout
    [phi, gamma, theta, tx, ty, tz, scale] (ref renderer_demo
    geometry/camera.py project_3ddfa_128)."""
    s = float(pose_para[-1])
    R = angles_to_rotation(pose_para[:3])
    t = np.asarray(pose_para[3:6], np.float64).reshape(3, 1)
    return s * (R @ vertices) + t


def detect_kpt_box(kpt2d: np.ndarray, rs: np.random.RandomState):
    """Perturbed crop box around projected landmarks (ref prnet.py:46-63)."""
    left, right = kpt2d[0].min(), kpt2d[0].max()
    top, bottom = kpt2d[1].min(), kpt2d[1].max()
    center = np.array([right - (right - left) / 2.0,
                       bottom - (bottom - top) / 2.0])
    old_size = (right - left + bottom - top) / 2
    size = int(old_size * 1.5)
    marg = old_size * 0.1
    center += rs.rand(2) * marg * 2 - marg
    size = size * (rs.rand() * 0.2 + 0.9)
    return center, float(size)


class GeneratePos:
    def __init__(self, resolution_inp: int = 256, resolution: int = 256,
                 model_path: str = "magicbox/face/BFM.mat",
                 info_path: str = "magicbox/face/BFM_info.mat",
                 synthetic: bool = False, seed: int = 0):
        self.resolution_inp = resolution_inp
        self.resolution = resolution
        self.rs = np.random.RandomState(seed)
        if synthetic:
            (self.mu, self.w_shape, self.w_exp, self.tri, self.kpt_ind,
             uv) = synthetic_bfm_full()
        else:
            (self.mu, self.w_shape, self.w_exp, self.tri, self.kpt_ind,
             uv) = load_bfm_full(model_path, info_path)
        # uv-space rasterization geometry (ref prnet.py:35-39)
        n = len(self.mu) // 3
        pv = np.zeros((3, n))
        pv[:2] = (uv * (self.resolution - 1)).T
        pv[1] = self.resolution - 1 - pv[1]
        self.uv_vertices = pv

    def write_uv_kpt_ind(self, save_folder: str):
        ind = np.rint(self.uv_vertices[:2, self.kpt_ind]).astype(np.int64)
        np.savetxt(osp.join(save_folder, "uv_kpt_ind.txt"), ind, fmt="%d")

    def generate_vertices(self, shape_para, exp_para) -> np.ndarray:
        """(3, N) — mu + W alpha + W_exp beta (raw 300W-LP parameters)."""
        s = np.asarray(shape_para, np.float64).reshape(-1)[:self.w_shape.shape[1]]
        e = np.asarray(exp_para, np.float64).reshape(-1)[:self.w_exp.shape[1]]
        v = self.mu + self.w_shape[:, :len(s)] @ s + self.w_exp[:, :len(e)] @ e
        return v.reshape(-1, 3).T

    def process_arrays(self, image: np.ndarray, pose_para, shape_para,
                       exp_para):
        """Core pipeline on arrays -> (cropped_img [0,1], uv_pos (R,R,3))."""
        import cv2

        from deep3dmap_tpu import native

        h = image.shape[0]
        vertices = self.generate_vertices(shape_para, exp_para)
        projected = project_3ddfa(vertices, np.asarray(pose_para).reshape(-1))
        projected[1] = h - 1 - projected[1]

        kpt = projected[:, self.kpt_ind]
        center, size = detect_kpt_box(kpt, self.rs)

        # similarity crop: the 3 src->dst points are axis-aligned, so the
        # transform is pure scale+translation (ref estimate_transform)
        a = (self.resolution_inp - 1) / size
        tx = -a * (center[0] - size / 2)
        ty = -a * (center[1] - size / 2)
        M = np.array([[a, 0, tx], [0, a, ty]], np.float64)
        cropped = cv2.warpAffine(image, M, (self.resolution_inp,
                                            self.resolution_inp))

        verts = projected.copy()
        verts[0] = a * verts[0] + tx
        verts[1] = a * verts[1] + ty
        verts[2] = projected[2] * a
        verts[2] -= verts[2].min()

        # UV position map: rasterize in UV space with image-space positions
        # as the per-vertex attribute (ref prnet.py:110 render_colors)
        uv_pos, _ = native.rasterize_mesh(
            self.uv_vertices.T.astype(np.float32), self.tri.astype(np.int64),
            verts.T.astype(np.float32), self.resolution, self.resolution)
        return cropped, np.asarray(uv_pos, np.float32)

    def process(self, image_path: str, save_folder: str):
        import cv2
        import scipy.io as sio

        image = cv2.imread(image_path)[:, :, ::-1] / 255.0
        info = sio.loadmat(image_path.replace("jpg", "mat"))
        cropped, uv_pos = self.process_arrays(
            image, info["Pose_Para"].T.astype(np.float32).reshape(-1),
            info["Shape_Para"], info["Exp_Para"])
        name = osp.basename(image_path)
        out = osp.join(save_folder, name)
        cv2.imwrite(out.replace(".jpg", "_inp.jpg"),
                    np.rint(cropped[:, :, ::-1] * 255))
        np.save(out.replace(".jpg", ".npy"), uv_pos)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--inputDir", default="Data/300W_LP")
    ap.add_argument("-o", "--outputDir", default="Data/300W_LP_256")
    ap.add_argument("--resolution", type=int, default=256)
    ap.add_argument("--bfm", default="magicbox/face/BFM.mat")
    ap.add_argument("--bfm-info", default="magicbox/face/BFM_info.mat")
    ap.add_argument("--synthetic-bfm", action="store_true",
                    help="use the deterministic synthetic BFM (smoke runs)")
    args = ap.parse_args()

    os.makedirs(args.outputDir, exist_ok=True)
    gp = GeneratePos(args.resolution, args.resolution, args.bfm,
                     args.bfm_info, synthetic=args.synthetic_bfm)
    gp.write_uv_kpt_ind(args.outputDir)

    paths = sorted(glob(osp.join(args.inputDir, "*.jpg")))
    st = time.time()
    names = []
    for i, p in enumerate(paths):
        if i % 1000 == 0:
            print(f"processed {i}/{len(paths)}; "
                  f"time: {(time.time() - st) / 60:.1f}min")
        gp.process(p, args.outputDir)
        names.append(osp.basename(p))
    with open(osp.join(args.outputDir, "list.txt"), "w") as f:
        f.write("\n".join(names) + "\n")


if __name__ == "__main__":
    main()
