"""mAP / proposal-recall evaluation + lmk2angle + ResNetV1 backbone."""
import numpy as np
import pytest

from deep3dmap_tpu.core.evaluation import (average_precision, bbox_overlaps_np,
                                           eval_map, eval_recalls,
                                           tpfp_default)
from deep3dmap_tpu.core.all3dtrans import (P2sRt,
                                           estimate_affine_matrix_3d22d,
                                           face_orientation, matrix2angle,
                                           project_param)
from deep3dmap_tpu.core.all3dtrans.rotations import euler_angles_to_matrix


def test_bbox_overlaps_identity():
    b = np.array([[0, 0, 10, 10], [5, 5, 15, 15]], float)
    ious = bbox_overlaps_np(b, b)
    assert np.allclose(np.diag(ious), 1.0)
    # 5x5 overlap / (100+100-25)
    assert np.isclose(ious[0, 1], 25 / 175)


def test_average_precision_perfect():
    rec = np.linspace(0.1, 1.0, 10)
    prec = np.ones(10)
    assert np.isclose(average_precision(rec, prec, "area"), 1.0)
    assert average_precision(rec, prec, "11points") > 0.99


def test_tpfp_and_eval_map():
    gt = np.array([[0, 0, 10, 10], [20, 20, 30, 30]], float)
    # one good det per GT + one false positive
    dets = np.array([
        [0, 0, 10, 10, 0.9],
        [20, 20, 30, 30, 0.8],
        [50, 50, 60, 60, 0.7],
    ])
    tp, fp = tpfp_default(dets, gt)
    assert tp.sum() == 2 and fp.sum() == 1

    det_results = [[dets]]  # 1 image, 1 class
    annotations = [{"bboxes": gt, "labels": np.zeros(2, int)}]
    mean_ap, per_cls = eval_map(det_results, annotations, iou_thr=0.5)
    assert per_cls[0]["num_gts"] == 2
    assert np.isclose(per_cls[0]["recall"], 1.0)
    assert mean_ap > 0.95


def test_eval_map_duplicate_det_is_fp():
    gt = np.array([[0, 0, 10, 10]], float)
    dets = np.array([[0, 0, 10, 10, 0.9], [1, 1, 10, 10, 0.85]])
    tp, fp = tpfp_default(dets, gt)
    assert tp.sum() == 1 and fp.sum() == 1


def test_eval_recalls_grid():
    gt = [np.array([[0, 0, 10, 10]], float)]
    props = [np.array([[0, 0, 10, 10, 0.9], [40, 40, 50, 50, 0.8]])]
    recalls = eval_recalls(gt, props, proposal_nums=[1, 2],
                           iou_thrs=[0.5, 0.9])
    assert recalls.shape == (2, 2)
    assert np.allclose(recalls, 1.0)  # top-1 proposal already covers the GT

    # proposals sorted so the good one is second: recall@1 should drop
    props2 = [np.array([[40, 40, 50, 50, 0.9], [0, 0, 10, 10, 0.8]])]
    recalls2 = eval_recalls(gt, props2, proposal_nums=[1, 2], iou_thrs=0.5)
    assert recalls2[0, 0] == 0.0 and recalls2[1, 0] == 1.0


def test_affine_camera_roundtrip():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(12, 3)) * 50
    angles = np.array([0.1, -0.2, 0.3])
    R_true = np.asarray(euler_angles_to_matrix(angles))
    s_true, t_true = 2.0, np.array([5.0, -3.0])
    x = s_true * (X @ R_true.T)[:, :2] + t_true
    P = estimate_affine_matrix_3d22d(X, x)
    s, R, t = P2sRt(P)
    assert np.isclose(s, s_true, rtol=1e-3)
    assert np.allclose(R[:2], R_true[:2], atol=1e-4)
    pitch, yaw, roll = matrix2angle(R)
    p_t, y_t, r_t = matrix2angle(R_true)
    assert np.allclose([pitch, yaw, roll], [p_t, y_t, r_t], atol=0.1)


def test_face_orientation_frontal():
    # symmetric frontal 5-point layout -> near-zero yaw/roll
    lm = [30, 40, 70, 40, 50, 60, 35, 80, 65, 80]
    (roll, pitch, yaw), nose = face_orientation(lm)
    assert abs(yaw) < 15 and abs(roll) < 15
    assert nose == (100, 120)


def test_project_param_shapes():
    rng = np.random.default_rng(1)
    template = rng.normal(size=(68, 3)) * 80
    angles = np.array([0.05, 0.1, -0.05])
    R_true = np.asarray(euler_angles_to_matrix(angles))
    proj = 1.5 * (template @ R_true.T)[:, :2] + np.array([10.0, 20.0])
    lmk = proj.copy()
    lmk[:, 1] = 224 - lmk[:, 1]
    s, R, t = project_param(lmk, template)
    assert np.isclose(s, 1.5, rtol=1e-2)
    assert R.shape == (3, 3)


@pytest.mark.slow
def test_resnet_v1_backbone():
    import jax
    import jax.numpy as jnp
    from deep3dmap_tpu.models.backbones import ResNetV1

    model = ResNetV1(layers=(1, 1, 1, 1, 1), num_classes=7, stem_ch=8)
    x = jnp.zeros((2, 64, 64, 3))
    params = model.init(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(params, x)
    assert out.shape == (2, 7)
    assert np.isfinite(np.asarray(out)).all()
