"""CustomDataset + mask structures (reference custom.py / mask_structures.py)."""
import numpy as np
import pytest

from deep3dmap_tpu.datasets import CustomDataset
from deep3dmap_tpu.utils import fileio
from deep3dmap_tpu.utils.mask_structures import BitmapMasks, PolygonMasks


@pytest.fixture
def ann_file(tmp_path):
    infos = [
        dict(filename="a.jpg", width=640, height=480,
             ann=dict(bboxes=np.array([[10, 10, 100, 100]], np.float32),
                      labels=np.array([0]))),
        dict(filename="b.jpg", width=480, height=640,
             ann=dict(bboxes=np.array([[5, 5, 50, 50], [60, 60, 120, 120]],
                                      np.float32),
                      labels=np.array([0, 1]))),
        dict(filename="empty.jpg", width=640, height=480,
             ann=dict(bboxes=np.zeros((0, 4), np.float32),
                      labels=np.zeros((0,), np.int64))),
    ]
    path = str(tmp_path / "ann.pkl")
    fileio.dump(infos, path)
    return path


def test_custom_dataset_load_filter_flag(ann_file):
    ds = CustomDataset(ann_file, pipeline=None)
    # empty-gt image filtered out in train mode
    assert len(ds) == 2
    # flag: a.jpg wide (1), b.jpg tall (0)
    np.testing.assert_array_equal(ds.flag, [1, 0])
    item = ds[0]
    assert item["img_info"]["filename"] == "a.jpg"
    assert item["ann_info"]["bboxes"].shape == (1, 4)
    assert ds.get_cat_ids(1) == [0, 1]


def test_custom_dataset_test_mode_keeps_all(ann_file):
    ds = CustomDataset(ann_file, pipeline=None, test_mode=True)
    assert len(ds) == 3
    assert "ann_info" not in ds[0]


def test_custom_dataset_evaluate_perfect(ann_file):
    ds = CustomDataset(ann_file, pipeline=None, classes=("c0", "c1"))
    # perfect detections: per-image, per-class (k,5) arrays
    results = []
    for i in range(len(ds)):
        ann = ds.get_ann_info(i)
        per_class = []
        for c in range(2):
            sel = ann["labels"] == c
            boxes = ann["bboxes"][sel]
            per_class.append(
                np.concatenate([boxes, np.ones((len(boxes), 1))], 1)
                if len(boxes) else np.zeros((0, 5)))
        results.append(per_class)
    ev = ds.evaluate(results, metric="mAP", iou_thr=0.5)
    assert ev["mAP"] == pytest.approx(1.0, abs=1e-6)
    ev_r = ds.evaluate([np.vstack([c for c in r]) for r in results],
                       metric="recall", proposal_nums=(10,))
    assert list(ev_r.values())[0] == pytest.approx(1.0)


def test_custom_dataset_bad_metric(ann_file):
    ds = CustomDataset(ann_file, pipeline=None)
    with pytest.raises(KeyError):
        ds.evaluate([], metric="nonsense")


def test_bitmap_masks_geometry():
    m = np.zeros((2, 8, 8), np.uint8)
    m[0, 2:4, 2:4] = 1
    m[1, 0:2, 6:8] = 1
    bm = BitmapMasks(m, 8, 8)
    assert len(bm) == 2
    np.testing.assert_array_equal(bm.areas, [4, 4])
    # resize x2 keeps area ratio
    big = bm.resize((16, 16))
    np.testing.assert_array_equal(big.areas, [16, 16])
    # horizontal flip moves the corner mask
    fl = bm.flip("horizontal")
    assert fl.masks[1, 0, 0] == 1 and fl.masks[1, 0, 7] == 0
    # crop
    cr = bm.crop(np.array([2, 2, 4, 4]))
    assert cr.height == 2 and cr.width == 2
    assert cr.masks[0].sum() == 4
    # pad
    pd = bm.pad((10, 10), 0)
    assert pd.masks.shape == (2, 10, 10)
    assert pd.areas.tolist() == [4, 4]
    # get_bboxes tight
    np.testing.assert_array_equal(bm.get_bboxes()[0], [2, 2, 4, 4])
    # translate by 2 px right
    tr = bm.translate((8, 8), 2, "horizontal")
    np.testing.assert_array_equal(tr.get_bboxes()[0], [4, 2, 6, 4])
    # rotate 90 degrees keeps area approximately
    rot = bm.rotate((8, 8), 90)
    assert abs(int(rot.areas[0]) - 4) <= 2
    # indexing returns BitmapMasks
    one = bm[0]
    assert isinstance(one, BitmapMasks) and len(one) == 1


def test_polygon_masks_roundtrip():
    # unit square polygon 2..6
    poly = [[np.array([2, 2, 6, 2, 6, 6, 2, 6], np.float32)]]
    pm = PolygonMasks(poly, 8, 8)
    assert len(pm) == 1
    assert pm.areas[0] == pytest.approx(16.0)
    # rasterization matches the square
    nd = pm.to_ndarray()
    assert nd.shape == (1, 8, 8)
    assert nd[0, 3, 3] == 1 and nd[0, 0, 0] == 0
    assert abs(int(nd.sum()) - 16) <= 4
    # scaling doubles coordinates
    pm2 = pm.resize((16, 16))
    assert pm2.areas[0] == pytest.approx(64.0)
    # flip
    fl = pm.flip("horizontal")
    xs = fl.masks[0][0][0::2]
    np.testing.assert_allclose(np.sort(xs), [2, 2, 6, 6])
    # crop shifts coords
    cr = pm.crop(np.array([2, 2, 8, 8]))
    assert cr.masks[0][0][0::2].min() == 0
    # bboxes
    np.testing.assert_allclose(pm.get_bboxes()[0], [2, 2, 6, 6])
    # to_bitmap
    bm = pm.to_bitmap()
    assert isinstance(bm, BitmapMasks)
    # random constructor works
    assert len(PolygonMasks.random(2, 16, 16)) == 2
    assert len(BitmapMasks.random(2, 16, 16)) == 2
