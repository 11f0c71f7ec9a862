"""Native host ops: builds on first import, falls back to numpy.

The reference keeps its host-side hot loops in C++/Cython
(/root/reference/deep3dmap/core/renderer/renderer_demo/mesh_cython/).  Here
the C++ extension is compiled on demand with the system toolchain; every
entry point has a numpy fallback so the package works without a compiler.
"""
from __future__ import annotations

import os
import os.path as osp
import subprocess
import sys
import sysconfig

import numpy as np

_native = None


def _build():
    src_dir = osp.dirname(osp.abspath(__file__))
    src = osp.join(src_dir, "csrc", "native.cpp")
    out = osp.join(src_dir, "_native" + (sysconfig.get_config_var("EXT_SUFFIX") or ".so"))
    if osp.exists(out) and os.path.getmtime(out) >= os.path.getmtime(src):
        return out
    py_inc = sysconfig.get_path("include")
    np_inc = np.get_include()
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{py_inc}", f"-I{np_inc}", src, "-o", out]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def _load():
    global _native
    if _native is not None:
        return _native
    try:
        _build()
        sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
        import _native as mod  # noqa: F401

        _native = mod
    except Exception:
        _native = False
    return _native


def available() -> bool:
    return bool(_load())


def rasterize_mesh(verts, faces, colors, h: int, w: int):
    """Z-buffer rasterization; verts in pixel coords (x, y, z)."""
    mod = _load()
    verts = np.ascontiguousarray(verts, np.float32)
    faces = np.ascontiguousarray(faces, np.int64)
    colors = np.ascontiguousarray(colors, np.float32)
    if mod:
        return mod.rasterize_mesh(verts, faces, colors, h, w)
    # numpy fallback (slow): per-face bounding-box barycentric fill
    C = colors.shape[1]
    img = np.zeros((h, w, C), np.float32)
    dep = np.zeros((h, w), np.float32)
    zbuf = np.full((h, w), np.inf, np.float32)
    for f in faces:
        p = verts[f]
        xmin = max(int(np.floor(p[:, 0].min())), 0)
        xmax = min(int(np.ceil(p[:, 0].max())), w - 1)
        ymin = max(int(np.floor(p[:, 1].min())), 0)
        ymax = min(int(np.ceil(p[:, 1].max())), h - 1)
        if xmin > xmax or ymin > ymax:
            continue
        denom = ((p[1, 0] - p[0, 0]) * (p[2, 1] - p[0, 1])
                 - (p[2, 0] - p[0, 0]) * (p[1, 1] - p[0, 1]))
        if abs(denom) < 1e-12:
            continue
        xs, ys = np.meshgrid(np.arange(xmin, xmax + 1), np.arange(ymin, ymax + 1))
        w1 = ((xs - p[0, 0]) * (p[2, 1] - p[0, 1]) - (p[2, 0] - p[0, 0]) * (ys - p[0, 1])) / denom
        w2 = ((p[1, 0] - p[0, 0]) * (ys - p[0, 1]) - (xs - p[0, 0]) * (p[1, 1] - p[0, 1])) / denom
        w0 = 1 - w1 - w2
        inside = (w0 >= -1e-9) & (w1 >= -1e-9) & (w2 >= -1e-9)
        z = w0 * p[0, 2] + w1 * p[1, 2] + w2 * p[2, 2]
        for yy, xx, zz, a, b, c in zip(ys[inside], xs[inside], z[inside],
                                       w0[inside], w1[inside], w2[inside]):
            if zz < zbuf[yy, xx]:
                zbuf[yy, xx] = zz
                dep[yy, xx] = zz
                img[yy, xx] = a * colors[f[0]] + b * colors[f[1]] + c * colors[f[2]]
    return img, dep


def render_depth(verts, faces, h: int, w: int):
    _, dep = rasterize_mesh(verts, faces,
                            np.zeros((len(verts), 1), np.float32), h, w)
    return dep


def marching_tets(vol, level: float = 0.0):
    mod = _load()
    vol = np.ascontiguousarray(vol, np.float32)
    if mod:
        return mod.marching_tets(vol, float(level))
    from ..core.utils.marching_cubes import marching_tetrahedra

    return marching_tetrahedra(vol, level=level)
