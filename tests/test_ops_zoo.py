"""JAX-native op zoo vs numpy brute-force references (reference csrc zoo)."""
import numpy as np
import pytest

from deep3dmap_tpu import ops


def _np_iou(a, b):
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    a1 = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    a2 = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(a1[:, None] + a2[None] - inter, 1e-6)


def _rand_boxes(rs, n, size=100.0):
    xy = rs.rand(n, 2) * size
    wh = rs.rand(n, 2) * 30 + 1
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


def test_bbox_overlaps_matches_numpy(rng):
    a = _rand_boxes(rng, 7)
    b = _rand_boxes(rng, 5)
    got = np.asarray(ops.bbox_overlaps(a, b))
    np.testing.assert_allclose(got, _np_iou(a, b), atol=1e-5)


def _np_greedy_nms(boxes, scores, thr):
    order = np.argsort(-scores, kind="stable")
    ious = _np_iou(boxes, boxes)
    alive = np.ones(len(boxes), bool)
    keep = []
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        alive &= ious[i] <= thr
        alive[i] = False
    return np.asarray(keep)


def test_nms_matches_greedy(rng):
    boxes = _rand_boxes(rng, 40)
    scores = rng.rand(40).astype(np.float32)
    dets, keep = ops.nms(boxes, scores, 0.5)
    ref = _np_greedy_nms(boxes, scores, 0.5)
    np.testing.assert_array_equal(np.sort(keep), np.sort(ref))
    assert dets.shape == (len(ref), 5)
    assert np.all(np.diff(dets[:, 4]) <= 1e-6)  # descending scores


def test_soft_nms_decays_overlapping(rng):
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float32)
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    dets, inds = ops.soft_nms(boxes, scores, iou_threshold=0.3,
                              method="linear", min_score=1e-3)
    assert 0 in inds and 2 in inds
    # the overlapping box's score decays below its original
    row = dets[np.where(inds == 1)[0]]
    if len(row):
        assert row[0, 4] < 0.8


def test_batched_nms_separates_classes():
    boxes = np.array([[0, 0, 10, 10], [0, 0, 10, 10]], np.float32)
    scores = np.array([0.9, 0.8], np.float32)
    idxs = np.array([0, 1])
    dets, keep = ops.batched_nms(boxes, scores, idxs, 0.5)
    assert len(keep) == 2  # same box, different class -> both survive


def test_nms_match_groups(rng):
    boxes = _rand_boxes(rng, 20)
    scores = rng.rand(20).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], 1)
    groups = ops.nms_match(dets, 0.5)
    flat = np.concatenate(groups)
    assert sorted(flat.tolist()) == list(range(20))


def test_box_iou_rotated_axis_aligned_matches(rng):
    # zero-angle rotated IoU must equal the axis-aligned IoU
    a = _rand_boxes(rng, 5)
    b = _rand_boxes(rng, 4)
    def to_rot(x):
        return np.stack([(x[:, 0] + x[:, 2]) / 2, (x[:, 1] + x[:, 3]) / 2,
                         x[:, 2] - x[:, 0], x[:, 3] - x[:, 1],
                         np.zeros(len(x))], 1).astype(np.float32)
    got = np.asarray(ops.box_iou_rotated(to_rot(a), to_rot(b)))
    np.testing.assert_allclose(got, _np_iou(a, b), atol=1e-3)


def test_box_iou_rotated_90deg():
    # square rotated by 90° over itself -> IoU 1
    box = np.array([[5, 5, 4, 4, 0]], np.float32)
    rot = np.array([[5, 5, 4, 4, np.pi / 2]], np.float32)
    got = float(np.asarray(ops.box_iou_rotated(box, rot))[0, 0])
    assert abs(got - 1.0) < 1e-3
    # 2:1 rectangle rotated 90°: inter = 2*2=4? w=4,h=2 -> overlap 2x2=4,
    # union = 8+8-4 = 12
    box = np.array([[0, 0, 4, 2, 0]], np.float32)
    rot = np.array([[0, 0, 4, 2, np.pi / 2]], np.float32)
    got = float(np.asarray(ops.box_iou_rotated(box, rot))[0, 0])
    assert abs(got - 4.0 / 12.0) < 1e-3


def test_nms_rotated_suppresses():
    boxes = np.array([[5, 5, 4, 4, 0.0], [5, 5, 4, 4, 0.05],
                      [50, 50, 4, 4, 1.0]], np.float32)
    scores = np.array([0.9, 0.85, 0.5], np.float32)
    dets, keep = ops.nms_rotated(boxes, scores, 0.5)
    assert list(keep) == [0, 2]


def test_focal_losses(rng):
    pred = rng.randn(6, 4).astype(np.float32)
    tgt = rng.randint(0, 4, size=6)
    l_sig = float(ops.sigmoid_focal_loss(pred, tgt))
    l_soft = float(ops.softmax_focal_loss(pred, tgt))
    assert np.isfinite(l_sig) and l_sig > 0
    assert np.isfinite(l_soft) and l_soft > 0
    # perfect prediction -> tiny loss
    big = np.full((2, 4), -20.0, np.float32)
    big[np.arange(2), [1, 2]] = 20.0
    assert float(ops.sigmoid_focal_loss(big, np.array([1, 2]))) < 1e-4
    assert float(ops.softmax_focal_loss(big, np.array([1, 2]))) < 1e-6
    # differentiable
    import jax
    g = jax.grad(lambda p: ops.sigmoid_focal_loss(p, tgt))(pred)
    assert np.all(np.isfinite(np.asarray(g)))


def test_knn_and_three_nn(rng):
    xyz = rng.randn(2, 32, 3).astype(np.float32)
    q = rng.randn(2, 8, 3).astype(np.float32)
    dist, idx = ops.knn(4, xyz, q)
    d2 = ((q[:, :, None] - xyz[:, None]) ** 2).sum(-1)
    ref_idx = np.argsort(d2, -1)[..., :4]
    ref_d = np.sqrt(np.take_along_axis(d2, ref_idx, -1))
    np.testing.assert_allclose(np.asarray(dist), ref_d, atol=1e-4)
    np.testing.assert_allclose(
        np.sort(np.asarray(idx), -1), np.sort(ref_idx, -1))
    d3, i3 = ops.three_nn(q, xyz)
    assert d3.shape == (2, 8, 3) and i3.shape == (2, 8, 3)


def test_ball_query_radius(rng):
    xyz = rng.rand(1, 64, 3).astype(np.float32)
    q = xyz[:, :4]
    idx = np.asarray(ops.ball_query(0.2, 8, xyz, q))
    d2 = ((q[:, :, None] - xyz[:, None]) ** 2).sum(-1)
    for m in range(4):
        for k in range(8):
            assert d2[0, m, idx[0, m, k]] < 0.2 * 0.2 + 1e-6


def test_furthest_point_sample_spread(rng):
    # FPS on a line must pick the two endpoints first
    xyz = np.zeros((1, 10, 3), np.float32)
    xyz[0, :, 0] = np.arange(10)
    idx = np.asarray(ops.furthest_point_sample(xyz, 3))[0]
    assert idx[0] == 0 and idx[1] == 9
    assert idx[2] in (4, 5)


def test_gather_group_points(rng):
    pts = rng.randn(2, 5, 16).astype(np.float32)
    idx = rng.randint(0, 16, size=(2, 6)).astype(np.int32)
    g = np.asarray(ops.gather_points(pts, idx))
    for b in range(2):
        np.testing.assert_allclose(g[b], pts[b][:, idx[b]])
    gidx = rng.randint(0, 16, size=(2, 6, 3)).astype(np.int32)
    gg = np.asarray(ops.group_points(pts, gidx))
    assert gg.shape == (2, 5, 6, 3)
    np.testing.assert_allclose(gg[0, :, 2, 1], pts[0][:, gidx[0, 2, 1]])


def test_three_interpolate(rng):
    known = rng.randn(1, 4, 3).astype(np.float32)
    unknown = known[:, [0, 1, 2, 3, 0]] + 1e-5  # near-coincident
    feats = rng.randn(1, 7, 4).astype(np.float32)
    idx, w = ops.three_interpolate_weights(unknown, known)
    out = np.asarray(ops.three_interpolate(feats, idx, w))
    # interpolation at (nearly) the known points reproduces their features
    np.testing.assert_allclose(out[0, :, 0], feats[0, :, 0], atol=1e-3)
    np.testing.assert_allclose(out[0, :, 3], feats[0, :, 3], atol=1e-3)


def test_roi_align_constant_field(rng):
    # On a constant feature map every RoI bin must equal the constant.
    feat = np.full((1, 3, 16, 16), 2.5, np.float32)
    rois = np.array([[0, 2, 2, 10, 10]], np.float32)
    out = np.asarray(ops.roi_align(feat, rois, 4))
    assert out.shape == (1, 3, 4, 4)
    np.testing.assert_allclose(out, 2.5, atol=1e-5)


def test_roi_align_linear_ramp():
    # bilinear sampling of a linear ramp is exact
    H = W = 16
    ramp = np.tile(np.arange(W, dtype=np.float32), (H, 1))[None, None]
    rois = np.array([[0, 4, 4, 12, 12]], np.float32)
    out = np.asarray(ops.roi_align(ramp, rois, 4, aligned=True))
    # bin centers along x: 4 + (i+0.5)*2 - 0.5 (aligned offset)
    expect = 4 + (np.arange(4) + 0.5) * 2 - 0.5
    np.testing.assert_allclose(out[0, 0, 2], expect, atol=1e-4)


def test_roi_pool_max():
    feat = np.zeros((1, 1, 8, 8), np.float32)
    feat[0, 0, 3, 3] = 7.0
    rois = np.array([[0, 0, 0, 7, 7]], np.float32)
    out = np.asarray(ops.roi_pool(feat, rois, 2))
    assert out.max() == pytest.approx(7.0, abs=1e-5)


def test_roi_align_rotated_zero_angle_matches(rng):
    feat = rng.randn(1, 2, 16, 16).astype(np.float32)
    rois = np.array([[0, 8, 8, 8, 8]], np.float32)  # cx,cy,w,h
    rot = np.concatenate([rois, np.zeros((1, 1), np.float32)], 1)
    aa = np.array([[0, 4, 4, 12, 12]], np.float32)
    out_rot = np.asarray(ops.roi_align_rotated(feat, rot, 4))
    out_aa = np.asarray(ops.roi_align(feat, aa, 4))
    np.testing.assert_allclose(out_rot, out_aa, atol=1e-4)


def test_voxelize_roundtrip(rng):
    pts = (rng.rand(200, 4) * np.array([4, 4, 4, 1])).astype(np.float32)
    voxels, coors, npts = ops.voxelize_host(
        pts, voxel_size=(1, 1, 1), coors_range=(0, 0, 0, 4, 4, 4),
        max_points=16, max_voxels=128)
    assert (coors >= 0).all() and (coors < 4).all()
    assert npts.sum() <= 200
    # every stored point falls in its voxel (coors are zyx)
    for v in range(len(coors)):
        for p in range(npts[v]):
            cell = np.floor(voxels[v, p, :3]).astype(int)
            np.testing.assert_array_equal(cell[::-1], coors[v])
    # voxel ids unique
    lin = coors[:, 0] * 16 + coors[:, 1] * 4 + coors[:, 2]
    assert len(np.unique(lin)) == len(lin)


def test_dynamic_scatter_mean_max(rng):
    feats = np.array([[1.0, 2.0], [3.0, 4.0], [10.0, 20.0]], np.float32)
    coors = np.array([[0, 0, 0], [0, 0, 0], [1, 1, 1]], np.int32)
    red, out_coors, counts = ops.dynamic_scatter(feats, coors, "mean",
                                                 max_voxels=8)
    red = np.asarray(red)
    counts = np.asarray(counts)
    assert counts[0] == 2 and counts[1] == 1
    np.testing.assert_allclose(red[0], [2.0, 3.0])
    np.testing.assert_allclose(red[1], [10.0, 20.0])
    red_max, _, _ = ops.dynamic_scatter(feats, coors, "max", max_voxels=8)
    np.testing.assert_allclose(np.asarray(red_max)[0], [3.0, 4.0])


def test_points_in_boxes():
    pts = np.array([[[0.0, 0.0, 0.5], [5.0, 5.0, 0.5], [0.9, 0.0, 0.5]]])
    boxes = np.array([[[0, 0, 0, 2, 2, 1, 0.0],
                       [5, 5, 0, 1, 1, 1, np.pi / 4]]], np.float32)
    idx = np.asarray(ops.points_in_boxes(pts, boxes))
    assert idx[0, 0] == 0 and idx[0, 1] == 1 and idx[0, 2] == 0
    # outside everything
    pts2 = np.array([[[9.0, 9.0, 9.0]]], np.float32)
    assert np.asarray(ops.points_in_boxes(pts2, boxes))[0, 0] == -1
