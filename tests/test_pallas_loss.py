"""Fused Pallas loss kernel vs the reference jnp implementation.

Runs in pallas interpret mode on the CPU test mesh; compiles natively on TPU.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon
from deep3dmap_tpu.ops.pallas_loss import fused_tsdf_occ_loss


def _ref_loss(tsdf, occ, tsdf_t, occ_t, mask, pos_weight):
    fw = NeuralRecon.__new__(NeuralRecon)
    fw.pos_weight = pos_weight
    return fw.compute_level_loss(tsdf[..., None], occ[..., None], tsdf_t,
                                 occ_t, mask)


@pytest.fixture
def data(rng):
    shape = (2, 12, 12, 12)
    tsdf = rng.uniform(-1, 1, shape).astype(np.float32)
    occ = rng.randn(*shape).astype(np.float32)
    tsdf_t = rng.uniform(-1, 1, shape).astype(np.float32)
    occ_t = (rng.rand(*shape) > 0.7).astype(np.float32)
    mask = (rng.rand(*shape) > 0.3).astype(np.float32)
    return tuple(jnp.asarray(a) for a in (tsdf, occ, tsdf_t, occ_t, mask))


def test_fused_loss_matches_reference(data):
    tsdf, occ, tsdf_t, occ_t, mask = data
    total, occ_l, tsdf_l = fused_tsdf_occ_loss(tsdf, occ, tsdf_t, occ_t, mask,
                                               1.5, True)
    ref_total, ref_occ, ref_tsdf = _ref_loss(tsdf, occ, tsdf_t, occ_t, mask, 1.5)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)
    np.testing.assert_allclose(float(occ_l), float(ref_occ), rtol=1e-5)
    np.testing.assert_allclose(float(tsdf_l), float(ref_tsdf), rtol=1e-5)


def test_fused_loss_gradients_match(data):
    tsdf, occ, tsdf_t, occ_t, mask = data

    def fused(t, o):
        return fused_tsdf_occ_loss(t, o, tsdf_t, occ_t, mask, 1.5, True)[0]

    def ref(t, o):
        return _ref_loss(t, o, tsdf_t, occ_t, mask, 1.5)[0]

    gt_f, go_f = jax.grad(fused, argnums=(0, 1))(tsdf, occ)
    gt_r, go_r = jax.grad(ref, argnums=(0, 1))(tsdf, occ)
    np.testing.assert_allclose(np.asarray(go_f), np.asarray(go_r),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(np.asarray(gt_f), np.asarray(gt_r),
                               rtol=1e-4, atol=1e-7)


def test_fused_loss_empty_target(data):
    tsdf, occ, tsdf_t, _, mask = data
    occ_t = jnp.zeros_like(tsdf_t)
    total, _, _ = fused_tsdf_occ_loss(tsdf, occ, tsdf_t, occ_t, mask, 1.5, True)
    assert float(total) == 0.0  # no positive voxels -> zero loss (reference)


def test_fused_loss_nonaligned_size(rng):
    # 1000 elements: exercises block padding
    shape = (10, 10, 10)
    args = tuple(jnp.asarray(rng.rand(*shape).astype(np.float32)) for _ in range(5))
    tsdf, occ, tsdf_t, occ_t, mask = args
    occ_t = (occ_t > 0.5).astype(jnp.float32)
    mask = jnp.ones_like(mask)
    total, _, _ = fused_tsdf_occ_loss(tsdf, occ, tsdf_t, occ_t, mask, 1.0, True)
    ref_total, _, _ = _ref_loss(tsdf, occ, tsdf_t, occ_t, mask, 1.0)
    np.testing.assert_allclose(float(total), float(ref_total), rtol=1e-5)
