"""FAN face-alignment: network shapes, crop/transform geometry, decode."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.models.face_alignment import (
    FAN, FaceAlignment, crop_face, draw_gaussian, get_preds_from_heatmaps,
    transform_point)


def test_transform_point_roundtrip():
    center, scale, res = [50.0, 60.0], 0.8, 64.0
    p = np.array([20.0, 30.0])
    q = transform_point(p, center, scale, res)
    back = transform_point(q, center, scale, res, invert=True)
    np.testing.assert_allclose(back, p, atol=1e-8)


def test_crop_face_shape_and_padding():
    img = np.ones((40, 40, 3), np.float32)
    out = crop_face(img, center=[5.0, 5.0], scale=0.5, resolution=32)
    assert out.shape == (32, 32, 3)
    # crop extends past the border -> zero padding present
    assert out.min() == 0.0 and out.max() == 1.0


def test_draw_gaussian_peak():
    hm = np.zeros((64, 64))
    draw_gaussian(hm, [20, 30], sigma=2.0)
    assert hm[30, 20] == pytest.approx(1.0)
    assert hm[30, 26] < hm[30, 22]
    # off-canvas point: no crash, no write
    hm2 = np.zeros((64, 64))
    draw_gaussian(hm2, [-50, -50], sigma=1.0)
    assert hm2.sum() == 0.0


def test_heatmap_decode_subpixel():
    hm = np.zeros((1, 64, 64, 2), np.float32)
    hm[0, 30, 20, 0] = 1.0
    hm[0, 30, 21, 0] = 0.6  # pull +x
    hm[0, 10, 40, 1] = 1.0
    hm[0, 9, 40, 1] = 0.7  # pull -y
    preds, orig = get_preds_from_heatmaps(hm)
    np.testing.assert_allclose(preds[0, 0], [20.75, 30.5])
    np.testing.assert_allclose(preds[0, 1], [40.5, 10.25])


@pytest.mark.slow
def test_fan_network_and_api():
    net = FAN(n_modules=2, n_landmarks=5, features=32, hg_depth=2)
    x = jnp.zeros((1, 64, 64, 3))
    params = net.init(jax.random.PRNGKey(0), x)
    out = jax.jit(net.apply)(params, x)
    assert out.shape == (1, 2, 16, 16, 5)
    assert np.isfinite(np.asarray(out)).all()

    fa = FaceAlignment(n_modules=1, n_landmarks=5, resolution=64)
    img = (np.random.RandomState(0).rand(80, 80, 3) * 255).astype(np.uint8)
    lms = fa.get_landmarks_from_image(img, [[10, 10, 70, 70]])
    assert len(lms) == 1 and lms[0].shape == (5, 2)
    assert np.isfinite(lms[0]).all()
