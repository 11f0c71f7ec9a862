"""Config-referenced pipeline transforms: GAN/face/formatting family."""
import numpy as np
import pytest

from deep3dmap_tpu.datasets.builder import PIPELINES
from deep3dmap_tpu.datasets.pipelines.compose import Compose


def _build(cfg):
    return PIPELINES.build(cfg) if hasattr(PIPELINES, "build") else None


def test_normalize_for_gan():
    t = PIPELINES.get("NormalizeForGAN")(keys=("img",))
    out = t({"img": np.full((4, 4, 3), 0.5, np.float32)})
    np.testing.assert_allclose(out["img"], 0.0)
    # bare-array call (torchvision-style)
    np.testing.assert_allclose(t(np.ones((2, 2, 3))), 1.0)


def test_blend_a_to_rgb():
    t = PIPELINES.get("BlendAToRGB")()
    rgba = np.zeros((2, 2, 4), np.float32)
    rgba[..., 3] = 0.0  # fully transparent -> white
    out = t({"img": rgba})
    np.testing.assert_allclose(out["img"], 1.0)
    rgb = np.full((2, 2, 3), 0.3, np.float32)
    np.testing.assert_allclose(t({"img": rgb})["img"], 0.3)


def test_face_landmark_crop_roundtrip():
    rs = np.random.RandomState(0)
    img = rs.rand(64, 64, 3).astype(np.float32)
    # landmarks clustered in a known box
    lm = np.stack([rs.uniform(20, 40, 68), rs.uniform(25, 45, 68)], 0)  # (2,68)
    t = PIPELINES.get("FaceLandmarkCrop")(resolution_inp=32, scale=1.5)
    out = t({"pt3d_68": lm.T.copy(), "img": img})
    assert out["faceimg"].shape == (32, 32, 3)
    assert out["tform_mat"].shape == (3, 3)
    # transform maps the crop-box corner into crop space correctly: center
    # of the landmark box lands near the crop center
    c = np.array([(lm[0].min() + lm[0].max()) / 2,
                  (lm[1].min() + lm[1].max()) / 2, 1.0])
    cc = out["tform_mat"] @ c
    assert abs(cc[0] - 15.5) < 1.0 and abs(cc[1] - 15.5) < 1.0


def test_face_landmark_crop_bbox_input():
    t = PIPELINES.get("FaceLandmarkCrop")(resolution_inp=16)
    img = np.ones((32, 32, 3), np.float32)
    out = t({"pt3d_68": np.array([5.0, 25.0, 5.0, 25.0]), "img": img})
    assert out["faceimg"].shape == (16, 16, 3)


def test_get_keys_from_dict_and_bundle():
    g = PIPELINES.get("GetKeysFromDict")(in_dict_key="mat", out_keys=("pts3d",))
    out = g({"mat": {"pts3d": np.ones(3), "junk": 0}})
    assert "pts3d" in out

    b = PIPELINES.get("FaceFormatBundle")(imglike_keys=("img",),
                                          common_keys=("tform_mat",))
    out = b({"img": np.zeros((8, 8)), "tform_mat": np.eye(3)})
    assert out["img"].shape == (8, 8, 1)
    assert out["img_pad_shape"] == (8, 8, 1)
    assert out["tform_mat"].dtype == np.float32


def test_random_crop_and_photometric():
    rc = PIPELINES.get("RandomCrop")(size=(8, 8), keys=("img",), seed=0)
    out = rc({"img": np.zeros((16, 16, 3))})
    assert out["img"].shape == (8, 8, 3)
    pm = PIPELINES.get("PhotoMetricDistortion")(keys=("img",), seed=0)
    img = np.full((8, 8, 3), 128.0, np.float32)
    out = pm({"img": img.copy()})
    assert out["img"].shape == (8, 8, 3)
    assert np.isfinite(out["img"]).all()


def test_compose_chain():
    pipeline = Compose([
        dict(type="NormalizeForGAN", keys=("img",)),
        dict(type="ToTensor", keys=("img",)),
        dict(type="Collect", keys=("img",)),
    ])
    out = pipeline({"img": np.full((4, 4, 3), 1.0), "junk": 1})
    assert set(out) == {"img"}
    np.testing.assert_allclose(out["img"], 1.0)
