"""PRNet framework + loss + evaluation metric tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.core.evaluation import eval_depth, eval_fscore_points, eval_nme
from deep3dmap_tpu.models.frameworks.prnet import FaceImg2UV
from deep3dmap_tpu.models.losses import l1_loss, mask_l1_loss, smooth_l1_loss


RES = 64


def _batch(rs, B=2):
    img = rs.rand(B, RES, RES, 3).astype(np.float32)
    # gt uv map = smooth function of the image (learnable mapping)
    uv = np.stack([img[..., 0], img[..., 1] * 0.5 + 0.2, img[..., 2]], axis=-1)
    return {"faceimg": img, "gt_uvimg": uv.astype(np.float32)}


@pytest.fixture(scope="module")
def prnet():
    return FaceImg2UV(dict(resolution=RES, base_channels=8))


def test_prnet_shapes_and_loss(prnet, rng):
    batch = _batch(rng)
    params, mstate = prnet.init(jax.random.PRNGKey(0), batch)
    loss, aux = prnet.loss_fn(params, mstate, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    out, _ = prnet.forward_test(params, mstate, batch)
    assert out["uvpos"].shape == (2, RES, RES, 3)
    assert out["kpt"].shape == (2, 3, 68)


@pytest.mark.slow
def test_prnet_learns(prnet, rng):
    import optax

    batch = _batch(rng, B=2)
    params, mstate = prnet.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        (loss, aux), g = jax.value_and_grad(prnet.loss_fn, has_aux=True)(
            params, {}, batch, jax.random.PRNGKey(0))
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for _ in range(30):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8


def test_losses_math():
    p = jnp.asarray([1.0, 2.0, 3.0])
    t = jnp.asarray([1.5, 2.0, 5.0])
    np.testing.assert_allclose(float(l1_loss(p, t)), (0.5 + 0 + 2) / 3, rtol=1e-6)
    np.testing.assert_allclose(float(l1_loss(p, t, reduction="sum")), 2.5, rtol=1e-6)
    # smooth l1: |d|<1 -> 0.5 d^2, else |d| - 0.5
    np.testing.assert_allclose(float(smooth_l1_loss(p, t)),
                               (0.5 * 0.25 + 0 + 1.5) / 3, rtol=1e-6)
    mask = jnp.asarray([0.0, 1.0, 1.0])
    np.testing.assert_allclose(float(mask_l1_loss(p, t, mask)), 2.0 / 2.0, rtol=1e-6)


def test_eval_depth_perfect_and_offset():
    gt = np.full((10, 10), 2.0)
    m = eval_depth(gt.copy(), gt)
    assert m["AbsRel"] == 0 and m["RMSE"] == 0 and m["r1"] == 1.0
    pred = gt * 1.3
    m2 = eval_depth(pred, gt)
    assert m2["r1"] == 0.0 and m2["r2"] == 1.0  # 1.3 < 1.5625
    np.testing.assert_allclose(m2["AbsRel"], 0.3, rtol=1e-6)


def test_eval_fscore_identity_and_shifted(rng):
    pts = rng.rand(500, 3).astype(np.float64)
    m = eval_fscore_points(pts, pts, threshold=0.05, down_sample=0)
    assert m["fscore"] == 1.0
    m2 = eval_fscore_points(pts + 0.2, pts, threshold=0.05, down_sample=0)
    assert m2["fscore"] < 0.2


def test_eval_nme_zero_for_perfect():
    rs = np.random.RandomState(0)
    kpt2d = rs.rand(2, 2, 68) * 100  # original-image space
    tform = np.stack([np.eye(3)] * 2)
    # kpt in uv units: original * tform / 255
    kpt_uv = np.concatenate([kpt2d / 255.0, np.zeros((2, 1, 68))], axis=1)
    nme = eval_nme(kpt_uv, tform, kpt2d)
    assert nme < 1e-6

    nme2 = eval_nme(kpt_uv + 0.05, tform, kpt2d)
    assert nme2 > nme
