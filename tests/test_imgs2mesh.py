"""imgs2mesh (3DMM fitting) framework tests, incl. the state machine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.core.all3dmm.bfm_tools import make_synthetic_bfm, param2points_bfm
from deep3dmap_tpu.core.all3dtrans.rotations import (
    euler_angles_to_matrix,
    matrix_to_euler_angles,
)
from deep3dmap_tpu.core.renderer.uv_sampler import (
    precompute_uv_rasterization,
    sample_uv_texture,
    vertex_visibility,
)
from deep3dmap_tpu.datasets.builder import NumpyLoader
from deep3dmap_tpu.datasets.face_tuple import SyntheticFaceTupleDataset
from deep3dmap_tpu.models.frameworks.imgs2mesh import Imgs2Mesh
from deep3dmap_tpu.parallel import make_mesh
from deep3dmap_tpu.runners import StateMachineRunner


def test_euler_roundtrip(rng):
    angles = jnp.asarray(rng.uniform(-1.2, 1.2, (5, 3)).astype(np.float32))
    R = euler_angles_to_matrix(angles, "XYZ")
    # rotation matrices: orthonormal, det 1
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.stack([np.eye(3)] * 5), atol=1e-5)
    back = matrix_to_euler_angles(R, "XYZ")
    np.testing.assert_allclose(np.asarray(back), np.asarray(angles), atol=1e-5)


def test_param2points_shapes():
    bfm = make_synthetic_bfm(n_verts=128)
    preds = jnp.zeros((2, bfm.n_shape + bfm.n_exp + 7))
    pts, pose = param2points_bfm(bfm, preds)
    assert pts.shape == (2, 128, 3)
    assert pose.shape == (2, 7)
    # zero params -> mean shape
    np.testing.assert_allclose(np.asarray(pts[0]).reshape(-1),
                               np.asarray(bfm.mu_shape).reshape(-1), rtol=1e-5)


def test_uv_rasterization_coverage():
    # one big triangle covering most of the unit square
    uvs = np.array([[0.05, 0.05], [0.95, 0.05], [0.05, 0.95]], np.float32)
    tris = np.array([[0, 1, 2]])
    rast = precompute_uv_rasterization(uvs, tris, 32)
    covered = np.asarray(rast.tri_id) >= 0
    assert 0.2 < covered.mean() < 0.7  # roughly half the square
    bary = np.asarray(rast.bary)[covered]
    np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-5)


def test_uv_sampling_constant_image():
    uvs = np.array([[0.1, 0.1], [0.9, 0.1], [0.1, 0.9]], np.float32)
    tris = np.array([[0, 1, 2]])
    rast = precompute_uv_rasterization(uvs, tris, 16)
    img = jnp.full((1, 8, 8, 3), 0.5)
    fp = jnp.asarray(np.array([[[0.2, 0.2], [0.8, 0.2], [0.2, 0.8]]], np.float32))
    vis = jnp.ones((1, 3), bool)
    uvimg, uvmask = sample_uv_texture(rast, img, fp, vis)
    m = np.asarray(uvmask)[0, ..., 0] > 0
    assert m.any()
    np.testing.assert_allclose(np.asarray(uvimg)[0][m], 0.5, atol=1e-5)
    # invisible vertices -> empty mask
    _, uvmask0 = sample_uv_texture(rast, img, fp, jnp.zeros((1, 3), bool))
    assert float(uvmask0.sum()) == 0.0


def test_imgs2mesh_sup_and_unsup_losses():
    bfm = make_synthetic_bfm(n_verts=128)
    ds = SyntheticFaceTupleDataset(n_samples=2, tuplesize=2, image_size=32, bfm=bfm)
    loader = NumpyLoader(ds, batch_size=2, shuffle=False)
    batch = next(iter(loader))
    fw = Imgs2Mesh(dict(tuplesize=2, image_size=32, bfm=bfm, use_sampling=False))
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)

    loss_sup, aux = fw.loss_fn(params, mstate, batch, None, state="sup")
    assert np.isfinite(float(loss_sup))
    assert set(aux["log_vars"]) == {"ptsloss", "poseloss", "lm68loss"}

    loss_unsup, aux2 = fw.loss_fn(params, mstate, batch, None, state="sup_unsup")
    assert set(aux2["log_vars"]) == {"pts_consistent_loss", "scale_consistent_loss"}


@pytest.mark.slow
def test_imgs2mesh_state_machine_training(tmp_path):
    bfm = make_synthetic_bfm(n_verts=64)
    ds = SyntheticFaceTupleDataset(n_samples=4, tuplesize=2, image_size=32, bfm=bfm)
    loader = NumpyLoader(ds, batch_size=2, shuffle=False)
    fw = Imgs2Mesh(dict(tuplesize=2, image_size=32, bfm=bfm))
    runner = StateMachineRunner(
        fw, work_dir=str(tmp_path), mesh=make_mesh(), max_epochs=4,
        state_seq=["sup", "sup_unsup"], state_steps=[0, 2])
    batch = next(iter(loader))
    runner.setup(batch, optimizer=dict(type="Adam", lr=1e-4), iters_per_epoch=len(loader))
    runner.run([loader], [("train", 1)])
    assert runner.epoch == 4
    assert runner.cur_state == "sup_unsup"


def test_imgs2mesh_sampling_path():
    bfm = make_synthetic_bfm(n_verts=64)
    ds = SyntheticFaceTupleDataset(n_samples=1, tuplesize=2, image_size=32, bfm=bfm)
    loader = NumpyLoader(ds, batch_size=1, shuffle=False)
    batch = next(iter(loader))
    batch["uvtex"] = np.zeros((1, 16, 16, 3), np.float32)
    fw = Imgs2Mesh(dict(tuplesize=2, image_size=32, bfm=bfm, use_sampling=True,
                        texture_size=16))
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    loss, aux = fw.loss_fn(params, mstate, batch, None, state="sup")
    assert "texloss" in aux["log_vars"]
    assert np.isfinite(float(loss))
