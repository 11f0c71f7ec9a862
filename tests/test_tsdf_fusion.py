"""TSDF fusion tests: geometric correctness of the dense integrate."""
import numpy as np

import jax.numpy as jnp

from deep3dmap_tpu.core.tsdf.fusion import (
    TSDFParams,
    tsdf_fuse_frames,
    tsdf_integrate,
    tsdf_pyramid_from_depths,
)
from deep3dmap_tpu.datasets.synthetic import look_at_pose, sphere_trace_depth


def _flat_wall_setup(dim=16, voxel_size=0.1):
    """Camera at origin looking +z at a wall at z = wall_z."""
    H = W = 32
    intr = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)  # camera at origin, +z forward
    wall_z = dim * voxel_size * 0.6
    depth = np.full((H, W), wall_z, np.float32)
    origin = np.array([-dim * voxel_size / 2, -dim * voxel_size / 2, 0.0], np.float32)
    return intr, pose, depth, origin, wall_z


def test_integrate_wall_sign_and_truncation():
    dim, vs = 16, 0.1
    intr, pose, depth, origin, wall_z = _flat_wall_setup(dim, vs)
    params = TSDFParams(dim=(dim, dim, dim), voxel_size=vs, margin=3)
    tsdf = jnp.ones(params.dim)
    weight = jnp.zeros(params.dim)
    tsdf, weight = tsdf_integrate(tsdf, weight, jnp.asarray(depth), jnp.asarray(intr),
                                  jnp.asarray(pose), jnp.asarray(origin), params)
    tsdf = np.asarray(tsdf)
    weight = np.asarray(weight)

    zs = origin[2] + np.arange(dim) * vs
    mid = dim // 2
    seen = weight[mid, mid] > 0
    assert seen.any()
    for k in range(dim):
        if not seen[k]:
            continue
        expected = min((wall_z - zs[k]) / params.sdf_trunc, 1.0)
        if wall_z - zs[k] < -params.sdf_trunc:
            # beyond truncation behind the surface: stays at init 1
            assert tsdf[mid, mid, k] == 1.0
        else:
            np.testing.assert_allclose(tsdf[mid, mid, k], expected, atol=0.2)

    # front voxels (far in front of wall) are free space = 1
    assert tsdf[mid, mid, 1] == 1.0 or abs(tsdf[mid, mid, 1] - 1.0) < 1e-5


def test_fuse_frames_weight_accumulates():
    dim, vs = 12, 0.1
    intr, pose, depth, origin, _ = _flat_wall_setup(dim, vs)
    params = TSDFParams(dim=(dim, dim, dim), voxel_size=vs)
    d = jnp.asarray(np.stack([depth] * 3))
    k = jnp.asarray(np.stack([intr] * 3))
    p = jnp.asarray(np.stack([pose] * 3))
    tsdf, weight = tsdf_fuse_frames(d, k, p, jnp.asarray(origin), params)
    w = np.asarray(weight)
    assert w.max() == 3.0  # three identical observations


def test_pyramid_from_synthetic_scene():
    n_vox, vs = 16, 0.1
    extent = n_vox * vs
    center = np.array([extent / 2, extent / 2, extent * 0.4], np.float32)
    spheres = np.array([[*center, extent * 0.2]], np.float32)
    intr = np.array([[32, 0, 16], [0, 32, 16], [0, 0, 1]], np.float32)
    poses, depths = [], []
    for a in np.linspace(0, np.pi, 5):
        eye = center + np.array([np.cos(a), np.sin(a), 0.4]) * extent
        pose = look_at_pose(eye, center)
        poses.append(pose)
        depths.append(sphere_trace_depth(intr, pose, 32, 32, spheres, 0.05 * extent,
                                         max_depth=3 * extent))
    tsdf_list, occ_list = tsdf_pyramid_from_depths(
        np.stack(depths), np.stack([intr] * 5), np.stack(poses),
        np.zeros(3, np.float32), n_vox, vs, n_levels=3)
    assert [t.shape[0] for t in tsdf_list] == [16, 8, 4]
    # the sphere surface must produce occupied voxels at every level
    for occ in occ_list:
        assert np.asarray(occ).sum() > 0
    # occupied voxels should be near the sphere surface
    occ0 = np.asarray(occ_list[0])
    idx = np.argwhere(occ0)
    world = idx * vs
    dist_sphere = np.abs(np.linalg.norm(world - center, axis=1) - extent * 0.2)
    dist_floor = np.abs(world[:, 2] - 0.05 * extent)
    dist = np.minimum(dist_sphere, dist_floor)
    assert np.median(dist) < 3 * vs
