"""mmdet-legacy pipeline families: AutoAugment geometric/photometric
transforms + MultiScaleFlipAug TTA (parity surface:
/root/reference/deep3dmap/datasets/pipelines/{auto_augment,test_time_aug}.py).
"""
import numpy as np
import pytest

from deep3dmap_tpu.datasets.pipelines import (
    AutoAugment,
    BrightnessTransform,
    ColorTransform,
    ContrastTransform,
    EqualizeTransform,
    MultiScaleFlipAug,
    Rotate,
    Shear,
    Translate,
)


def _sample(w=32, h=24):
    rs = np.random.RandomState(0)
    img = (rs.rand(h, w, 3) * 255).astype(np.uint8)
    return dict(img=img,
                gt_bboxes=np.array([[4.0, 4.0, 12.0, 16.0],
                                    [20.0, 8.0, 30.0, 20.0]], np.float32),
                gt_labels=np.array([1, 2]),
                gt_semantic_seg=np.full((h, w), 255, np.uint8))


def test_translate_moves_boxes():
    np.random.seed(0)
    t = Translate(level=4, prob=1.0, direction="horizontal",
                  max_translate_offset=10.0, random_negative_prob=0.0)
    r = t(_sample())
    # offset = 4/10 * 10 = 4 px right
    np.testing.assert_allclose(r["gt_bboxes"][0],
                               [8.0, 4.0, 16.0, 16.0], atol=1e-4)
    assert r["img"].shape == (24, 32, 3)


def test_translate_drops_offscreen_boxes():
    np.random.seed(0)
    t = Translate(level=10, prob=1.0, direction="horizontal",
                  max_translate_offset=40.0, random_negative_prob=0.0,
                  min_size=1)
    r = t(_sample())
    assert len(r["gt_bboxes"]) < 2
    assert len(r["gt_labels"]) == len(r["gt_bboxes"])


def test_rotate_preserves_shapes_and_labels():
    np.random.seed(0)
    t = Rotate(level=5, prob=1.0, max_rotate_angle=30)
    r = t(_sample())
    assert r["img"].shape == (24, 32, 3)
    assert r["gt_semantic_seg"].shape == (24, 32)
    assert len(r["gt_bboxes"]) == len(r["gt_labels"])
    # rotation must enlarge (or keep) the axis-aligned box of box 0
    assert (r["gt_bboxes"][:, 2] >= r["gt_bboxes"][:, 0]).all()


def test_shear_changes_image():
    np.random.seed(0)
    s = _sample()
    before = s["img"].copy()
    r = Shear(level=6, prob=1.0)(s)
    assert not np.array_equal(r["img"], before)


def test_photometric_transforms():
    np.random.seed(0)
    s = _sample()
    for cls in (ColorTransform, BrightnessTransform, ContrastTransform):
        r = cls(level=8, prob=1.0)(dict(s, img=s["img"].copy()))
        assert r["img"].shape == s["img"].shape
        assert r["img"].dtype == s["img"].dtype
    r = EqualizeTransform(prob=1.0)(dict(s, img=s["img"].copy()))
    assert r["img"].shape == s["img"].shape
    # equalization flattens the histogram: more distinct gray levels used
    assert len(np.unique(r["img"])) >= len(np.unique(s["img"])) * 0.5


def test_brightness_scales_values():
    np.random.seed(0)
    img = np.full((8, 8, 3), 100, np.uint8)
    r = BrightnessTransform(level=10, prob=1.0)(dict(img=img))
    np.testing.assert_array_equal(r["img"], np.full((8, 8, 3), 190, np.uint8))


def test_auto_augment_picks_a_policy():
    np.random.seed(0)
    aug = AutoAugment(policies=[
        [dict(type="Translate", level=4, prob=1.0,
              max_translate_offset=10.0, random_negative_prob=0.0)],
        [dict(type="BrightnessTransform", level=10, prob=1.0)],
    ])
    r = aug(_sample())
    assert r["img"].shape == (24, 32, 3)


def test_multi_scale_flip_aug_fans_out():
    tta = MultiScaleFlipAug(
        transforms=[dict(type="Resize", size=(16, 16))],
        img_scale=[(16, 16), (32, 32)], flip=True)
    r = tta(dict(img=np.zeros((24, 32, 3), np.float32)))
    # 2 scales x (no-flip + horizontal) = 4 copies
    assert len(r["img"]) == 4
    assert r["flip"] == [False, True, False, True]
    assert r["scale"] == [(16, 16), (16, 16), (32, 32), (32, 32)]
    assert all(im.shape == (16, 16, 3) for im in r["img"])


def test_instaboost_requires_package():
    from deep3dmap_tpu.datasets.pipelines.test_time_aug import InstaBoost
    try:
        import instaboostfast  # noqa: F401
        has = True
    except ImportError:
        has = False
    if not has:
        with pytest.raises(ImportError, match="instaboostfast"):
            InstaBoost()
