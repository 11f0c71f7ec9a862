"""Gan2Shape framework + renderer + runner tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.core.renderer.renderer_nr import (
    NrRenderer,
    get_rotation_matrix,
    get_transform_matrices,
)
from deep3dmap_tpu.datasets.gan_faces import SyntheticGanFaceDataset
from deep3dmap_tpu.models.frameworks.gan2shape import (
    Gan2Shape,
    photometric_loss,
    smooth_loss,
)
from deep3dmap_tpu.parallel import make_mesh
from deep3dmap_tpu.runners.gan2shape_runner import Gan2ShapeRunner

CFG = dict(image_size=32, gan_size=32, z_dim=32, n_mlp=4, nf=8, batchsize=2,
           channel_multiplier=1)


def test_rotation_matrix_orthonormal(rng):
    a = jnp.asarray(rng.uniform(-1, 1, (4,)), jnp.float32)
    R = get_rotation_matrix(a, a * 0.5, a * 0.2)
    eye = jnp.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(np.asarray(eye), np.stack([np.eye(3)] * 4), atol=1e-5)


def test_renderer_identity_view():
    """Zero view transform: warped depth ≈ canonical depth (interior)."""
    r = NrRenderer(dict(min_depth=0.9, max_depth=1.1), image_size=32)
    depth = jnp.full((1, 32, 32), 1.0)
    view = jnp.zeros((1, 6))
    rot, t = get_transform_matrices(view)
    warped = r.warp_canon_depth(depth, rot, t)
    inner = np.asarray(warped)[0, 8:-8, 8:-8]
    np.testing.assert_allclose(inner, 1.0, atol=0.02)


def test_renderer_translation_moves_image():
    r = NrRenderer(dict(min_depth=0.9, max_depth=1.1), image_size=32)
    im = jnp.zeros((1, 32, 32, 3)).at[:, 12:20, 12:20].set(1.0)
    depth = jnp.full((1, 32, 32), 1.0)
    view = jnp.zeros((1, 6)).at[0, 3].set(0.05)  # x translation
    out = r.render_given_view(im, depth, view)
    assert float(jnp.abs(out - im).max()) > 0.1  # image changed
    assert np.isfinite(np.asarray(out)).all()


def test_normals_flat_plane():
    r = NrRenderer(dict(min_depth=0.9, max_depth=1.1), image_size=16)
    n = r.get_normal_from_depth(jnp.full((1, 16, 16), 1.0))
    # flat fronto-parallel depth -> normals close to +z in the interior
    inner = np.asarray(n)[0, 4:-4, 4:-4]
    assert np.abs(inner[..., 2]).mean() > 0.9


def test_loss_utils():
    x = jnp.ones((1, 4, 4, 3))
    assert float(photometric_loss(x, x)) == 0.0
    assert float(smooth_loss(jnp.ones((1, 8, 8)))) == 0.0
    ramp = jnp.broadcast_to(jnp.linspace(0, 1, 8)[None, None, :], (1, 8, 8))
    assert float(smooth_loss(ramp)) > 0


@pytest.fixture(scope="module")
def g2s():
    fw = Gan2Shape(CFG)
    ds = SyntheticGanFaceDataset(n_samples=2, image_size=32, z_dim=32)
    batch = ds.setup_input(0)
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    return fw, ds, batch, params, mstate


def test_step1_loss_and_outputs(g2s):
    fw, ds, batch, params, mstate = g2s
    total, log, out = fw.forward_step1(params, mstate, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    assert out["depth"].shape == (1, 32, 32)
    d = np.asarray(out["depth"])
    assert d.min() >= fw.min_depth - 0.11 and d.max() <= fw.max_depth + 0.11


@pytest.mark.slow
def test_step2_loss(g2s):
    fw, ds, batch, params, mstate = g2s
    canon = {"depth": jnp.full((1, 32, 32), 1.0),
             "albedo": jnp.zeros((1, 32, 32, 3)),
             "normal": jnp.concatenate([jnp.zeros((1, 32, 32, 2)),
                                        jnp.ones((1, 32, 32, 1))], -1),
             "light": jnp.zeros((1, 4))}
    b2 = {**batch, **canon}
    total, log, out = fw.forward_step2(params, mstate, b2, jax.random.PRNGKey(2))
    assert np.isfinite(float(total))
    assert out["proj_im"].shape == (fw.batchsize, 32, 32, 3)
    # gradients flow into the encoder head
    g = jax.grad(lambda p: fw.forward_step2(p, mstate, b2, jax.random.PRNGKey(2))[0])(params)
    gsum = sum(float(jnp.abs(x).sum())
               for x in jax.tree_util.tree_leaves(g["encoder_head"]))
    assert gsum > 0


def test_step3_loss(g2s):
    fw, ds, batch, params, mstate = g2s
    b3 = {**batch,
          "proj_im": np.zeros((2, 32, 32, 3), np.float32),
          "proj_mask": np.ones((2, 32, 32, 1), np.float32)}
    total, log, _ = fw.forward_step3(params, mstate, b3, jax.random.PRNGKey(3))
    assert np.isfinite(float(total))
    assert "step3_l1" in log


@pytest.mark.slow
def test_gan2shape_runner_full_loop(tmp_path):
    fw = Gan2Shape(CFG)
    ds = SyntheticGanFaceDataset(n_samples=2, image_size=32, z_dim=32)
    runner = Gan2ShapeRunner(fw, work_dir=str(tmp_path), mesh=make_mesh(),
                             max_epochs=1, stage_iters=(2, 2, 2), num_stage=1)
    runner.setup(ds.setup_input(0), optimizer=dict(type="Adam", lr=1e-4))
    runner.run(ds)
    assert runner.epoch == 1
    runner.log_buffer.average()
    assert any(k.startswith("s3_") for k in runner.log_buffer.output)
