"""3D box ops: BEV/3D rotated IoU, 3D NMS, RoI-aware and RoI-point pooling.

Parity targets: /root/reference/deep3dmap/core/ops/csrc/pytorch/
{iou3d.cpp, roiaware_pool3d.cpp, roipoint_pool3d.cpp} and their cuda/
kernels.  Box convention (N, 7) = [cx, cy, cz, dx, dy, dz, yaw] (center +
extents + rotation around z), matching the reference's points_in_boxes
family.  The CUDA polygon-clipping IoU is reused from the 2D rotated-IoU
implementation (ops/bbox.py); the pooling kernels' per-voxel scatter loops
become fixed-capacity mask-and-reduce passes (static shapes for XLA).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bbox import box_iou_rotated


def _to_bev(boxes):
    """(N, 7) 3D boxes -> (N, 5) rotated BEV rects (cx, cy, dx, dy, yaw)."""
    return jnp.stack([boxes[:, 0], boxes[:, 1], boxes[:, 3], boxes[:, 4],
                      boxes[:, 6]], -1)


def boxes_iou_bev(boxes_a, boxes_b):
    """Rotated bird's-eye-view IoU matrix (iou3d.cpp boxes_iou_bev)."""
    return box_iou_rotated(_to_bev(jnp.asarray(boxes_a)),
                           _to_bev(jnp.asarray(boxes_b)))


def boxes_overlap_bev(boxes_a, boxes_b):
    """Raw BEV intersection areas (iou3d.cpp boxes_overlap_bev)."""
    a = jnp.asarray(boxes_a, jnp.float32)
    b = jnp.asarray(boxes_b, jnp.float32)
    iou = box_iou_rotated(_to_bev(a), _to_bev(b))
    area_a = (a[:, 3] * a[:, 4])[:, None]
    area_b = (b[:, 3] * b[:, 4])[None, :]
    # iou = inter / (A + B - inter)  =>  inter = iou (A + B) / (1 + iou)
    return iou * (area_a + area_b) / (1.0 + iou)


def boxes_iou3d(boxes_a, boxes_b):
    """Full 3D IoU (iou3d_utils boxes_iou3d_gpu): BEV overlap x z-extent
    overlap over the union volume."""
    a = jnp.asarray(boxes_a, jnp.float32)
    b = jnp.asarray(boxes_b, jnp.float32)
    inter_bev = boxes_overlap_bev(a, b)
    za1, za2 = a[:, 2] - a[:, 5] / 2, a[:, 2] + a[:, 5] / 2
    zb1, zb2 = b[:, 2] - b[:, 5] / 2, b[:, 2] + b[:, 5] / 2
    zo = jnp.maximum(jnp.minimum(za2[:, None], zb2[None, :]) -
                     jnp.maximum(za1[:, None], zb1[None, :]), 0.0)
    inter = inter_bev * zo
    vol_a = (a[:, 3] * a[:, 4] * a[:, 5])[:, None]
    vol_b = (b[:, 3] * b[:, 4] * b[:, 5])[None, :]
    return inter / jnp.maximum(vol_a + vol_b - inter, 1e-8)


def _greedy_nms(ious: np.ndarray, scores: np.ndarray, thr: float):
    order = np.argsort(-scores, kind="stable")
    alive = np.ones(len(scores), bool)
    keep = []
    for i in order:
        if not alive[i]:
            continue
        keep.append(int(i))
        alive &= ious[i] <= thr
    return np.array(keep, np.int64)


def nms3d(boxes, scores, iou_threshold: float):
    """Greedy NMS on rotated BEV IoU (iou3d.cpp nms_gpu). Host-side greedy
    pass over a device-computed IoU matrix, like ops.bbox.nms_rotated."""
    ious = np.asarray(boxes_iou_bev(boxes, boxes))
    return _greedy_nms(ious, np.asarray(scores, np.float32), iou_threshold)


def nms3d_normal(boxes, scores, iou_threshold: float):
    """iou3d.cpp nms_normal_gpu: axis-aligned BEV IoU (rotation ignored)."""
    b = np.asarray(boxes, np.float32)
    x1, y1 = b[:, 0] - b[:, 3] / 2, b[:, 1] - b[:, 4] / 2
    x2, y2 = b[:, 0] + b[:, 3] / 2, b[:, 1] + b[:, 4] / 2
    xx1 = np.maximum(x1[:, None], x1[None, :])
    yy1 = np.maximum(y1[:, None], y1[None, :])
    xx2 = np.minimum(x2[:, None], x2[None, :])
    yy2 = np.minimum(y2[:, None], y2[None, :])
    inter = np.clip(xx2 - xx1, 0, None) * np.clip(yy2 - yy1, 0, None)
    area = (x2 - x1) * (y2 - y1)
    ious = inter / np.maximum(area[:, None] + area[None, :] - inter, 1e-8)
    return _greedy_nms(ious, np.asarray(scores, np.float32), iou_threshold)


def _canonical(points, box):
    """points (N, 3) into the canonical frame of one box (7,)."""
    shifted = points - box[:3]
    c, s = jnp.cos(-box[6]), jnp.sin(-box[6])
    x = shifted[:, 0] * c - shifted[:, 1] * s
    y = shifted[:, 0] * s + shifted[:, 1] * c
    return jnp.stack([x, y, shifted[:, 2]], -1)


@partial(jax.jit, static_argnames=("out_size", "max_pts_per_voxel", "mode"))
def roiaware_pool3d(rois, pts, pts_feature, out_size=(4, 4, 4),
                    max_pts_per_voxel: int = 128, mode: str = "max"):
    """RoI-aware pooling (roiaware_pool3d.cpp): bin each box's interior
    points into an (ox, oy, oz) voxel grid and max/avg-pool their features.

    rois (R, 7); pts (N, 3); pts_feature (N, C) -> (R, ox, oy, oz, C).
    The CUDA kernel scatters point indices into per-voxel lists capped at
    max_pts_per_voxel then reduces; here each (box, voxel) reduces over a
    masked segment-sum/max keyed by the point's voxel id — same cap-free
    result for mean/max (the cap only changes which ties drop, and XLA's
    full reduction is cheaper than emulating the list)."""
    ox, oy, oz = out_size
    nvox = ox * oy * oz

    def one(roi):
        local = _canonical(pts, roi)                        # (N, 3)
        half = roi[3:6] / 2
        inside = jnp.all(jnp.abs(local) < half, -1)
        cell = roi[3:6] / jnp.array([ox, oy, oz], jnp.float32)
        ijk = jnp.floor((local + half) / cell).astype(jnp.int32)
        ijk = jnp.clip(ijk, 0, jnp.array([ox - 1, oy - 1, oz - 1]))
        vid = jnp.where(inside,
                        (ijk[:, 0] * oy + ijk[:, 1]) * oz + ijk[:, 2], nvox)
        if mode == "max":
            pooled = jax.ops.segment_max(pts_feature, vid,
                                         num_segments=nvox + 1)
            cnt = jax.ops.segment_sum(jnp.ones_like(vid, jnp.float32), vid,
                                      num_segments=nvox + 1)
            pooled = jnp.where(cnt[:, None] > 0, pooled, 0.0)
        else:
            tot = jax.ops.segment_sum(pts_feature, vid, num_segments=nvox + 1)
            cnt = jax.ops.segment_sum(jnp.ones_like(vid, jnp.float32), vid,
                                      num_segments=nvox + 1)
            pooled = tot / jnp.maximum(cnt[:, None], 1.0)
        return pooled[:nvox].reshape(ox, oy, oz, -1)

    return jax.vmap(one)(rois)


@partial(jax.jit, static_argnames=("num_sampled_points",))
def roipoint_pool3d(points, point_features, boxes3d,
                    num_sampled_points: int = 512):
    """RoI point pooling (roipoint_pool3d.cpp): per box, select the first
    num_sampled_points interior points (xyz ++ features), repeating the
    first hit to pad short boxes — the CUDA kernel's wrap-around fill.

    points (B, N, 3); point_features (B, N, C); boxes3d (B, T, 7)
    -> pooled (B, T, S, 3+C), empty_flag (B, T) bool."""
    S = num_sampled_points

    def per_batch(pts, feats, bxs):
        def per_box(box):
            local = _canonical(pts, box)
            inside = jnp.all(jnp.abs(local) < box[3:6] / 2, -1)
            n = pts.shape[0]
            order = jnp.where(inside, jnp.arange(n), n + jnp.arange(n))
            k = min(S, n)
            neg, sel = jax.lax.top_k(-order, k)
            got = (-neg) < n
            sel = jnp.where(got, sel, sel[:1])
            if k < S:  # fewer cloud points than samples: wrap-around pad
                reps = -(-S // k)
                sel = jnp.tile(sel, reps)[:S]
            merged = jnp.concatenate([pts, feats], -1)[sel]
            empty = ~inside.any()
            return jnp.where(empty, 0.0, merged), empty

        return jax.vmap(per_box)(bxs)

    return jax.vmap(per_batch)(points, point_features, boxes3d)
