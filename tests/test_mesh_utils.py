"""Marching tetrahedra, PLY IO, scene assembly tests."""
import numpy as np

from deep3dmap_tpu.core.utils.marching_cubes import marching_tetrahedra, tsdf_to_mesh
from deep3dmap_tpu.core.utils.io_ply import write_ply, read_ply
from deep3dmap_tpu.core.utils.scene_assembler import SceneAssembler


def _sphere_sdf(n=24, r=0.35):
    g = np.linspace(-0.5, 0.5, n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return np.sqrt(x * x + y * y + z * z) - r


def test_marching_tetrahedra_sphere():
    vol = _sphere_sdf(24, 0.35)
    verts, faces = marching_tetrahedra(vol)
    assert len(verts) > 100 and len(faces) > 100
    # vertex radii close to the sphere radius (in voxel units: r=0.35/dx)
    dx = 1.0 / 23
    center = 11.5
    radii = np.linalg.norm(verts - center, axis=1) * dx
    np.testing.assert_allclose(radii.mean(), 0.35, atol=0.02)
    assert radii.std() < 0.02
    assert faces.max() < len(verts)


def test_marching_tetrahedra_empty():
    verts, faces = marching_tetrahedra(np.ones((8, 8, 8)))
    assert len(verts) == 0 and len(faces) == 0


def test_tsdf_to_mesh_world_coords():
    vol = _sphere_sdf(16, 0.3)
    verts, _ = tsdf_to_mesh(vol, origin=np.array([10.0, 20.0, 30.0]), voxel_size=0.1)
    assert verts[:, 0].min() >= 10.0 and verts[:, 0].max() <= 10.0 + 1.6


def test_ply_roundtrip(tmp_path):
    verts = np.random.rand(10, 3).astype(np.float32)
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
    p = str(tmp_path / "mesh.ply")
    write_ply(p, verts, faces)
    v2, f2 = read_ply(p)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_scene_assembler_growth_and_substitution(tmp_path):
    sa = SceneAssembler(voxel_size=0.1, save_dir=str(tmp_path))
    win = -np.ones((8, 8, 8), np.float32)  # inside
    win[0], win[-1] = 1, 1  # boundary outside -> closed surface
    win[:, 0], win[:, -1] = 1, 1
    win[:, :, 0], win[:, :, -1] = 1, 1
    sa.update("sceneA", win, np.zeros(3))
    # second fragment offset: the scene volume must grow
    sa.update("sceneA", win, np.array([0.4, 0.0, 0.0]))
    vol = sa.scenes["sceneA"]
    assert vol.tsdf.shape[0] == 12  # 8 + 4 voxels growth
    verts, faces = sa.get_mesh("sceneA")
    assert len(verts) > 0

    # scene change finalizes + saves previous
    finalized = sa.update("sceneB", win, np.zeros(3))
    assert finalized == "sceneA"
    assert (tmp_path / "sceneA.ply").exists()
