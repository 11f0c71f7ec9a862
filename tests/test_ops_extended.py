"""Golden-value tests for the extended op families (deform / vision / box3d
/ host post-processing), mirroring the reference CUDA kernels' semantics
(SURVEY.md §2.6 op zoo)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deep3dmap_tpu import ops


# ---------------------------------------------------------------------------
# deform family
# ---------------------------------------------------------------------------

def test_deform_conv_zero_offset_matches_dense_conv():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 4, 8, 8), jnp.float32)
    w = jnp.asarray(rng.randn(6, 4, 3, 3), jnp.float32)
    off = jnp.zeros((2, 2 * 9, 8, 8), jnp.float32)
    out = ops.deform_conv2d(x, off, w, stride=1, padding=1)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_deform_conv_integer_offset_shifts_input():
    # a (dy=0, dx=1) offset on every tap equals convolving x shifted left
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 1, 6, 6), jnp.float32)
    w = jnp.ones((1, 1, 1, 1), jnp.float32)
    off = jnp.zeros((1, 2, 6, 6), jnp.float32).at[:, 1].set(1.0)
    out = ops.deform_conv2d(x, off, w, stride=1, padding=0)
    np.testing.assert_allclose(out[0, 0, :, :-1], x[0, 0, :, 1:], rtol=1e-5)
    # rightmost column samples outside -> 0
    np.testing.assert_allclose(out[0, 0, :, -1], 0.0, atol=1e-6)


def test_modulated_deform_conv_mask_scales_output():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 3, 5, 5), jnp.float32)
    w = jnp.asarray(rng.randn(2, 3, 3, 3), jnp.float32)
    off = jnp.zeros((1, 18, 5, 5), jnp.float32)
    full = jnp.ones((1, 9, 5, 5), jnp.float32)
    half = 0.5 * full
    o1 = ops.modulated_deform_conv2d(x, off, full, w, padding=1)
    o2 = ops.modulated_deform_conv2d(x, off, half, w, padding=1)
    np.testing.assert_allclose(o2, 0.5 * o1, rtol=1e-4, atol=1e-5)


def test_deform_roi_pool_constant_field():
    x = jnp.full((1, 2, 8, 8), 3.0)
    rois = jnp.asarray([[0, 1.0, 1.0, 5.0, 5.0]], jnp.float32)
    out = ops.deform_roi_pool(x, rois, None, output_size=(2, 2))
    assert out.shape == (1, 2, 2, 2)
    np.testing.assert_allclose(out, 3.0, rtol=1e-5)


def test_ms_deform_attn_shapes_and_center_sampling():
    N, nh, C = 1, 2, 4
    H, W = 4, 4
    value = jnp.asarray(np.random.RandomState(3).randn(N, H * W, nh, C),
                        jnp.float32)
    shapes = np.array([[H, W]])
    starts = np.array([0])
    Lq, P = 3, 2
    loc = jnp.full((N, Lq, nh, 1, P, 2), 0.5, jnp.float32)
    wts = jnp.full((N, Lq, nh, 1, P), 0.5, jnp.float32)
    out = ops.ms_deform_attn(value, shapes, starts, loc, wts)
    assert out.shape == (N, Lq, nh * C)
    # all queries sample the same center location -> identical rows
    np.testing.assert_allclose(out[0, 0], out[0, 1], rtol=1e-5)


# ---------------------------------------------------------------------------
# vision family
# ---------------------------------------------------------------------------

def test_carafe_identity_kernel_is_nearest_upsample():
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 3, 4, 4), jnp.float32)
    k, s = 3, 2
    masks = jnp.zeros((1, k * k, 8, 8), jnp.float32).at[:, k * k // 2].set(1.0)
    out = ops.carafe(x, masks, kernel_size=k, group_size=1, scale_factor=s)
    ref = jnp.repeat(jnp.repeat(x, s, -2), s, -1)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_masked_conv2d_zeroes_unmasked():
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.randn(1, 2, 6, 6), jnp.float32)
    w = jnp.asarray(rng.randn(3, 2, 3, 3), jnp.float32)
    mask = jnp.zeros((1, 6, 6)).at[:, :3].set(1.0)
    out = ops.masked_conv2d(x, mask, w)
    assert np.all(np.asarray(out[:, :, 3:]) == 0)
    dense = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    np.testing.assert_allclose(out[:, :, :3], dense[:, :, :3], rtol=1e-4)


def test_correlation_identity_displacement():
    rng = np.random.RandomState(6)
    x = jnp.asarray(rng.randn(1, 4, 5, 5), jnp.float32)
    out = ops.correlation(x, x, kernel_size=1, max_displacement=1)
    assert out.shape == (1, 3, 3, 5, 5)
    # center displacement = per-pixel squared norm over channels
    np.testing.assert_allclose(out[0, 1, 1], (x[0] ** 2).sum(0), rtol=1e-4)


def test_tin_shift_gathers_with_zero_pad():
    x = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
    shift = jnp.asarray([[1, -1], [0, 2]], jnp.int32)  # 2 groups of 2 ch
    out = ops.tin_shift(x, shift)
    # batch 0 group 0 shifted +1: frame t reads t-1, frame 0 zero
    np.testing.assert_allclose(out[0, 1, 0], x[0, 0, 0])
    np.testing.assert_allclose(out[0, 0, 0], 0.0)
    # batch 0 group 1 shifted -1: frame t reads t+1, last frame zero
    np.testing.assert_allclose(out[0, 0, 2], x[0, 1, 2])
    np.testing.assert_allclose(out[0, 3, 2], 0.0)


def test_psamask_collect_distribute_transpose():
    rng = np.random.RandomState(7)
    H = W = 4
    mh = mw = 3
    m = jnp.asarray(rng.rand(1, mh * mw, H, W), jnp.float32)
    col = ops.psamask(m, "collect", mh, mw)
    dis = ops.psamask(m, "distribute", mh, mw)
    assert col.shape == (1, H * W, H, W)
    c = np.asarray(col).reshape(H * W, H * W)
    d = np.asarray(dis).reshape(H * W, H * W)
    np.testing.assert_allclose(d, c.T, rtol=1e-6)
    # center relation of pixel (1,1): mask channel center
    np.testing.assert_allclose(c[1 * W + 1, 1 * W + 1],
                               m[0, (mh * mw) // 2, 1, 1], rtol=1e-6)


def test_border_align_constant_feature():
    C = 2
    x = jnp.stack([jnp.full((8, 8), float(i + 1))
                   for i in range(4 * C)])[None]  # (1, 4C, 8, 8)
    boxes = jnp.asarray([[[1.0, 1.0, 5.0, 5.0]]], jnp.float32)
    out = ops.border_align(x, boxes, pool_size=4)
    assert out.shape == (1, C, 1, 4)
    # border e of channel c pools input channel e*C + c (constant value)
    for e in range(4):
        for c in range(C):
            np.testing.assert_allclose(out[0, c, 0, e], e * C + c + 1,
                                       rtol=1e-5)


def test_corner_pool_directions():
    x = jnp.zeros((1, 1, 4, 4)).at[0, 0, 2, 1].set(5.0)
    top = np.asarray(ops.corner_pool(x, "top"))
    assert top[0, 0, 0, 1] == 5.0 and top[0, 0, 3, 1] == 0.0
    bot = np.asarray(ops.corner_pool(x, "bottom"))
    assert bot[0, 0, 3, 1] == 5.0 and bot[0, 0, 1, 1] == 0.0
    left = np.asarray(ops.corner_pool(x, "left"))
    assert left[0, 0, 2, 0] == 5.0
    right = np.asarray(ops.corner_pool(x, "right"))
    assert right[0, 0, 2, 3] == 5.0


# ---------------------------------------------------------------------------
# box3d family
# ---------------------------------------------------------------------------

def test_boxes_iou3d_identical_and_disjoint():
    a = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0],
                     [10, 10, 10, 2, 2, 2, 0.3]], jnp.float32)
    iou = np.asarray(ops.boxes_iou3d(a, a))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-3)
    assert iou[0, 1] < 1e-5


def test_boxes_iou3d_half_z_overlap():
    a = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
    b = jnp.asarray([[0, 0, 1, 2, 2, 2, 0.0]], jnp.float32)
    iou = float(ops.boxes_iou3d(a, b)[0, 0])
    # inter = 4*1, union = 8+8-4 -> 1/3
    assert abs(iou - 1 / 3) < 1e-3


def test_nms3d_suppresses_rotated_duplicates():
    boxes = np.array([[0, 0, 0, 2, 2, 2, 0.0],
                      [0.1, 0, 0, 2, 2, 2, 0.05],
                      [5, 5, 0, 2, 2, 2, 1.0]], np.float32)
    keep = ops.nms3d(boxes, np.array([0.9, 0.8, 0.7], np.float32), 0.3)
    assert list(keep) == [0, 2]
    keep_n = ops.nms3d_normal(boxes, np.array([0.9, 0.8, 0.7], np.float32),
                              0.3)
    assert list(keep_n) == [0, 2]


def test_roiaware_pool3d_max_and_avg():
    rois = jnp.asarray([[0, 0, 0, 2, 2, 2, 0.0]], jnp.float32)
    pts = jnp.asarray([[-0.5, -0.5, -0.5], [0.5, 0.5, 0.5], [9, 9, 9]],
                      jnp.float32)
    feats = jnp.asarray([[1.0], [3.0], [100.0]], jnp.float32)
    out = ops.roiaware_pool3d(rois, pts, feats, out_size=(2, 2, 2),
                              mode="max")
    assert out.shape == (1, 2, 2, 2, 1)
    o = np.asarray(out)[0, ..., 0]
    assert o[0, 0, 0] == 1.0 and o[1, 1, 1] == 3.0
    assert o.max() <= 3.0  # outside point never pooled
    avg = np.asarray(ops.roiaware_pool3d(rois, pts, feats, out_size=(2, 2, 2),
                                         mode="avg"))[0, ..., 0]
    assert avg[0, 0, 0] == 1.0 and avg.sum() == 4.0


def test_roipoint_pool3d_pads_and_flags():
    pts = jnp.asarray([[[0.1, 0, 0], [0.2, 0, 0], [9, 9, 9]]], jnp.float32)
    feats = jnp.asarray([[[1.0], [2.0], [3.0]]], jnp.float32)
    boxes = jnp.asarray([[[0, 0, 0, 1, 1, 1, 0.0],
                          [50, 50, 50, 1, 1, 1, 0.0]]], jnp.float32)
    pooled, empty = ops.roipoint_pool3d(pts, feats, boxes,
                                        num_sampled_points=4)
    assert pooled.shape == (1, 2, 4, 4)
    assert not bool(empty[0, 0]) and bool(empty[0, 1])
    got = np.asarray(pooled[0, 0])
    np.testing.assert_allclose(got[2], got[0])  # wrap-around padding
    np.testing.assert_allclose(np.asarray(pooled[0, 1]), 0.0)


# ---------------------------------------------------------------------------
# host family
# ---------------------------------------------------------------------------

def test_pixel_group_grows_region_by_embedding():
    H = W = 5
    score = np.full((H, W), 0.8, np.float32)
    mask = np.ones((H, W), bool)
    emb = np.zeros((H, W, 2), np.float32)
    emb[:, 3:] = 10.0  # far embedding on the right: never joined
    label = np.zeros((H, W), np.int32)
    label[2, 1] = 1
    contour = np.zeros((H, W), np.uint8)
    contour[2, 1] = 1
    out = ops.pixel_group(score, mask, emb, label, contour, 2, 0.5)
    assert len(out) == 2
    conf, count = out[1][0], out[1][1]
    assert abs(conf - 0.8) < 1e-5
    assert count == 15  # the 5x3 left block joins, right block stays out
    xs = np.array(out[1][2::2])
    assert xs.max() <= 2


def test_contour_expand_fills_largest_kernel():
    H = W = 6
    big = np.zeros((H, W), np.uint8)
    big[1:5, 1:5] = 1
    small = np.zeros((H, W), np.uint8)
    small[2:4, 2:4] = 1
    kernel_mask = np.stack([big, small])  # K=2, index 0 = largest
    label = (small > 0).astype(np.int32)  # one region, id 1
    out = np.array(ops.contour_expand(kernel_mask, label, 1, 2))
    assert out.shape == (H, W)
    assert (out[1:5, 1:5] == 1).all()
    assert out.sum() == 16  # nothing outside the big kernel


def test_contour_expand_drops_small_regions():
    label = np.zeros((4, 4), np.int32)
    label[0, 0] = 1
    kernels = np.ones((2, 4, 4), np.uint8)
    out = np.array(ops.contour_expand(kernels, label, 5, 2))
    assert out.sum() == 0


# ---------------------------------------------------------------------------
# SyncBatchNorm
# ---------------------------------------------------------------------------

def test_sync_batchnorm_cross_device_stats():
    from functools import partial

    from deep3dmap_tpu.models.modulars import SyncBatchNorm

    n_dev = jax.local_device_count()
    if n_dev < 2:
        pytest.skip("needs multi-device mesh")
    rng = np.random.RandomState(8)
    x = jnp.asarray(rng.randn(n_dev, 4, 3), jnp.float32)
    bn = SyncBatchNorm(axis_name="data", use_running_average=False)
    params = bn.init(jax.random.PRNGKey(0), x[0])

    @partial(jax.pmap, axis_name="data")
    def run(xs):
        out, _ = bn.apply(params, xs, mutable=["batch_stats"])
        return out

    out = np.asarray(run(x)).reshape(-1, 3)
    # normalized over the GLOBAL batch: zero mean, unit variance per feature
    np.testing.assert_allclose(out.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(out.std(0), 1.0, atol=1e-2)
