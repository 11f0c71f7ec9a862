"""Native C++ extension tests (and agreement with numpy/python paths)."""
import numpy as np
import pytest

from deep3dmap_tpu import native
from deep3dmap_tpu.core.utils.marching_cubes import marching_tetrahedra


def _sphere(n=20, r=0.35):
    g = np.linspace(-0.5, 0.5, n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (np.sqrt(x * x + y * y + z * z) - r).astype(np.float32)


def test_native_builds():
    assert native.available(), "C++ extension failed to build"


def test_marching_tets_matches_python():
    vol = _sphere()
    v_c, f_c = native.marching_tets(vol, 0.0)
    v_py, f_py = marching_tetrahedra(vol, 0.0)
    assert abs(len(v_c) - len(v_py)) < max(len(v_py) // 10, 8)
    # same surface: radii statistics agree
    c = (vol.shape[0] - 1) / 2
    r_c = np.linalg.norm(v_c - c, axis=1)
    r_py = np.linalg.norm(v_py - c, axis=1)
    np.testing.assert_allclose(r_c.mean(), r_py.mean(), rtol=0.02)


def test_rasterize_triangle():
    verts = np.array([[2, 2, 1.0], [14, 2, 1.0], [2, 14, 1.0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    colors = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    img, dep = native.rasterize_mesh(verts, faces, colors, 16, 16)
    assert img.shape == (16, 16, 3)
    assert dep[3, 3] == pytest.approx(1.0)
    assert dep[15, 15] == 0.0  # outside
    # color at vertex 0 corner ~ red
    assert img[2, 2, 0] > 0.8


def test_rasterize_zbuffer_order():
    # two overlapping triangles; nearer (smaller z) must win
    verts = np.array([[0, 0, 2.0], [15, 0, 2.0], [0, 15, 2.0],
                      [0, 0, 1.0], [15, 0, 1.0], [0, 15, 1.0]], np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    colors = np.array([[1, 0, 0]] * 3 + [[0, 1, 0]] * 3, np.float32)
    img, dep = native.rasterize_mesh(verts, faces, colors, 16, 16)
    assert img[2, 2, 1] > 0.9 and img[2, 2, 0] < 0.1  # green in front
    assert dep[2, 2] == pytest.approx(1.0)


def test_render_depth_consistency():
    verts = np.array([[0, 0, 3.0], [15, 0, 3.0], [0, 15, 3.0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    dep = native.render_depth(verts, faces, 16, 16)
    assert dep[1, 1] == pytest.approx(3.0)


def test_native_speedup_on_large_volume():
    """The point of the C++ path: meshing large scene volumes."""
    import time

    vol = _sphere(64)
    t0 = time.perf_counter()
    v, f = native.marching_tets(vol, 0.0)
    t_c = time.perf_counter() - t0
    assert len(v) > 1000
    if native.available():
        t0 = time.perf_counter()
        marching_tetrahedra(vol, 0.0)
        t_py = time.perf_counter() - t0
        assert t_c < t_py  # C++ beats the vectorized-numpy path
