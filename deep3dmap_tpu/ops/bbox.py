"""Box ops: IoU overlaps and (soft-)NMS, XLA-native with static shapes.

Parity targets: /root/reference/deep3dmap/core/ops/csrc/pytorch/
{bbox_overlaps.cpp, nms.cpp, box_iou_rotated.cpp} — the reference vendors
these as CUDA kernels behind ``deep3dmap._ext``; here each is a pure-JAX
function with fixed output shapes so it jits onto TPU:

- ``bbox_overlaps``: pairwise IoU/IoF as one broadcasted min/max block (VPU
  friendly, no loops).
- ``nms``: greedy suppression as a ``lax.fori_loop`` over a *score-sorted,
  fixed-size* candidate set returning a keep MASK (not a dynamic index list)
  — the TPU idiom for data-dependent selection.  ``nms(..., return_inds=True)``
  host-side converts the mask to indices for API parity.
- ``soft_nms``: linear/gaussian score decay, same masked-loop structure.
- ``nms_match``: host-side grouping helper (matches nms.cpp:nms_match).
- ``box_iou_rotated``: exact rotated-rect IoU by polygon clipping
  (Sutherland–Hodgman with a fixed 8-vertex buffer, fully vectorized over
  pairs — no Python loops over boxes).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def bbox_overlaps(bboxes1, bboxes2, mode: str = "iou",
                  aligned: bool = False, offset: int = 0, eps: float = 1e-6):
    """Pairwise (or aligned) IoU / IoF between xyxy boxes."""
    assert mode in ("iou", "iof")
    b1 = jnp.asarray(bboxes1, jnp.float32)
    b2 = jnp.asarray(bboxes2, jnp.float32)
    area1 = (b1[..., 2] - b1[..., 0] + offset) * (b1[..., 3] - b1[..., 1] + offset)
    area2 = (b2[..., 2] - b2[..., 0] + offset) * (b2[..., 3] - b2[..., 1] + offset)
    if not aligned:
        b1 = b1[:, None, :]
        b2 = b2[None, :, :]
        area1 = area1[:, None]
        area2 = area2[None, :]
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt + offset, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter if mode == "iou" else area1
    return inter / jnp.maximum(union, eps)


@partial(jax.jit, static_argnames=("offset",))
def _nms_mask(boxes, scores, iou_threshold, offset=0):
    order = jnp.argsort(-scores)
    boxes = boxes[order]
    ious = bbox_overlaps(boxes, boxes, offset=offset)
    n = boxes.shape[0]

    def body(i, keep):
        # suppress j>i iff i is kept and IoU(i,j) > thr
        sup = (ious[i] > iou_threshold) & keep[i] & (jnp.arange(n) > i)
        return keep & ~sup

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones((n,), bool))
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)
    return keep


def nms(boxes, scores, iou_threshold: float, offset: int = 0):
    """Greedy NMS.  Returns ``(dets, keep_inds)`` like the reference wrapper
    (nms.cpp / mmcv nms): ``dets = [x1,y1,x2,y2,score]`` of survivors in
    descending score order.  The inner mask computation is jitted/TPU-safe;
    the final index extraction is host-side (dynamic shape)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    keep = np.asarray(_nms_mask(boxes, scores, iou_threshold, offset=offset))
    inds = np.where(keep)[0]
    inds = inds[np.argsort(-np.asarray(scores)[inds], kind="stable")]
    dets = np.concatenate(
        [np.asarray(boxes)[inds], np.asarray(scores)[inds, None]], axis=1)
    return dets, inds


def batched_nms(boxes, scores, idxs, iou_threshold: float,
                class_agnostic: bool = False):
    """Per-class NMS via the coordinate-offset trick (mmcv batched_nms)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    if class_agnostic:
        shifted = boxes
    else:
        max_coord = jnp.max(boxes) + 1
        offsets = jnp.asarray(idxs, jnp.float32) * max_coord
        shifted = boxes + offsets[:, None]
    dets, keep = nms(shifted, scores, iou_threshold)
    real = np.concatenate(
        [np.asarray(boxes)[keep], np.asarray(dets)[:, 4:5]], axis=1)
    return real, keep


@partial(jax.jit, static_argnames=("method",))
def _soft_nms_scores(boxes, scores, iou_threshold, sigma, method="linear"):
    n = boxes.shape[0]

    def body(_, state):
        cur_scores, out_scores, done = state
        i = jnp.argmax(jnp.where(done, -jnp.inf, cur_scores))
        best = cur_scores[i]
        ious = bbox_overlaps(boxes[i][None], boxes)[0]
        if method == "linear":
            decay = jnp.where(ious > iou_threshold, 1.0 - ious, 1.0)
        else:  # gaussian
            decay = jnp.exp(-(ious * ious) / sigma)
        decay = jnp.where(done | (jnp.arange(n) == i), 1.0, decay)
        cur_scores = cur_scores * decay
        out_scores = out_scores.at[i].set(best)
        done = done.at[i].set(True)
        return cur_scores, out_scores, done

    _, out_scores, _ = jax.lax.fori_loop(
        0, n, body, (scores, jnp.zeros_like(scores), jnp.zeros((n,), bool)))
    return out_scores


def soft_nms(boxes, scores, iou_threshold: float = 0.3, sigma: float = 0.5,
             min_score: float = 1e-3, method: str = "linear"):
    """Soft-NMS (linear / gaussian decay).  Returns (dets, inds) of boxes
    whose decayed score stays above ``min_score``, sorted by decayed score."""
    assert method in ("linear", "gaussian")
    boxes = jnp.asarray(boxes, jnp.float32)
    scores = jnp.asarray(scores, jnp.float32)
    new_scores = np.asarray(
        _soft_nms_scores(boxes, scores, iou_threshold, sigma, method=method))
    inds = np.argsort(-new_scores, kind="stable")
    inds = inds[new_scores[inds] > min_score]
    dets = np.concatenate(
        [np.asarray(boxes)[inds], new_scores[inds, None]], axis=1)
    return dets, inds


def nms_match(dets, iou_threshold: float):
    """Group boxes into NMS-suppression clusters (nms.cpp nms_match):
    each group is [kept_box, boxes it suppressed...]."""
    dets = np.asarray(dets, np.float32)
    if dets.size == 0:
        return []
    scores = dets[:, 4]
    order = np.argsort(-scores, kind="stable")
    ious = np.asarray(bbox_overlaps(dets[:, :4], dets[:, :4]))
    alive = np.ones(len(dets), bool)
    groups = []
    for i in order:
        if not alive[i]:
            continue
        members = [int(i)]
        alive[i] = False
        for j in order:
            if alive[j] and ious[i, j] > iou_threshold:
                members.append(int(j))
                alive[j] = False
        groups.append(np.asarray(members))
    return groups


# ---------------------------------------------------------------------------
# rotated IoU (box_iou_rotated.cpp) — exact polygon-clipping, vectorized
# ---------------------------------------------------------------------------

def _rect_corners(boxes):
    """(..., 5) cx,cy,w,h,angle(rad) -> (..., 4, 2) corners CCW."""
    cx, cy, w, h, a = (boxes[..., i] for i in range(5))
    cos, sin = jnp.cos(a), jnp.sin(a)
    dx = jnp.stack([w, w, -w, -w], -1) * 0.5
    dy = jnp.stack([-h, h, h, -h], -1) * 0.5
    x = cx[..., None] + dx * cos[..., None] - dy * sin[..., None]
    y = cy[..., None] + dx * sin[..., None] + dy * cos[..., None]
    return jnp.stack([x, y], -1)


def _clip_poly_halfplane(poly, valid, a, b):
    """Clip polygon (fixed 16-vertex buffer) against half-plane: keep points
    P with cross(b-a, P-a) >= 0.  Returns new (poly, valid)."""
    nbuf = poly.shape[0]
    d = (b[0] - a[0]) * (poly[:, 1] - a[1]) - (b[1] - a[1]) * (poly[:, 0] - a[0])
    inside = (d >= 0) & valid
    nxt = jnp.roll(jnp.arange(nbuf), -1)
    # rolled neighbor among VALID points: since valid points are a prefix,
    # neighbor of last valid wraps to 0.
    count = jnp.sum(valid)
    idx = jnp.arange(nbuf)
    nxt = jnp.where(idx == count - 1, 0, nxt)
    d_next = d[nxt]
    inside_next = inside[nxt]
    p = poly
    pn = poly[nxt]
    t = d / jnp.where(jnp.abs(d - d_next) < 1e-12, 1e-12, d - d_next)
    inter = p + t[:, None] * (pn - p)

    # emit per edge (p_i -> p_next), preserving cyclic vertex order:
    # if p_i inside -> emit p_i; if the edge crosses the plane -> emit the
    # intersection right after p_i.
    emit1 = inside & valid
    emit2 = (inside ^ inside_next) & valid & (idx < count)
    per_slot = emit1.astype(jnp.int32) + emit2.astype(jnp.int32)
    start = jnp.cumsum(per_slot) - per_slot  # exclusive prefix sum
    pos1 = start
    pos2 = start + emit1.astype(jnp.int32)
    out = jnp.zeros_like(poly)
    out_valid = jnp.zeros_like(valid)
    out = out.at[jnp.where(emit1, pos1, nbuf)].set(
        jnp.where(emit1[:, None], p, 0.0), mode="drop")
    out_valid = out_valid.at[jnp.where(emit1, pos1, nbuf)].set(
        emit1, mode="drop")
    out = out.at[jnp.where(emit2, pos2, nbuf)].set(
        jnp.where(emit2[:, None], inter, 0.0), mode="drop")
    out_valid = out_valid.at[jnp.where(emit2, pos2, nbuf)].set(
        emit2, mode="drop")
    return out, out_valid


def _poly_area(poly, valid):
    n = poly.shape[0]
    count = jnp.sum(valid)
    idx = jnp.arange(n)
    nxt = jnp.where(idx == count - 1, 0, idx + 1)
    x, y = poly[:, 0], poly[:, 1]
    cross = x * y[nxt % n] - x[nxt % n] * y
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))


def _pair_rotated_iou(box1, box2, mode="iou"):
    c1 = _rect_corners(box1)  # (4,2)
    c2 = _rect_corners(box2)
    nbuf = 16
    poly = jnp.zeros((nbuf, 2)).at[:4].set(c1)
    valid = jnp.zeros((nbuf,), bool).at[:4].set(True)

    def clip_edge(i, state):
        poly, valid = state
        a = c2[i]
        b = c2[(i + 1) % 4]
        return _clip_poly_halfplane(poly, valid, a, b)

    poly, valid = jax.lax.fori_loop(0, 4, clip_edge, (poly, valid))
    inter = _poly_area(poly, valid)
    a1 = box1[2] * box1[3]
    a2 = box2[2] * box2[3]
    union = a1 + a2 - inter if mode == "iou" else a1
    return inter / jnp.maximum(union, 1e-6)


def box_iou_rotated(boxes1, boxes2, mode: str = "iou",
                    aligned: bool = False):
    """Exact rotated IoU between (cx,cy,w,h,angle-rad) boxes
    (box_iou_rotated.cpp).  aligned=False returns the full N×M matrix."""
    b1 = jnp.asarray(boxes1, jnp.float32)
    b2 = jnp.asarray(boxes2, jnp.float32)
    fn = partial(_pair_rotated_iou, mode=mode)
    if aligned:
        return jax.vmap(fn)(b1, b2)
    return jax.vmap(lambda x: jax.vmap(lambda y: fn(x, y))(b2))(b1)


def nms_rotated(boxes, scores, iou_threshold: float):
    """Greedy NMS over rotated boxes (nms_rotated.cpp)."""
    boxes = jnp.asarray(boxes, jnp.float32)
    scores_np = np.asarray(scores, np.float32)
    ious = np.asarray(box_iou_rotated(boxes, boxes))
    order = np.argsort(-scores_np, kind="stable")
    alive = np.ones(len(scores_np), bool)
    keep = []
    for i in order:
        if not alive[i]:
            continue
        keep.append(int(i))
        alive &= ious[i] <= iou_threshold
        alive[i] = False
    inds = np.asarray(keep, np.int64)
    dets = np.concatenate([np.asarray(boxes)[inds],
                           scores_np[inds, None]], axis=1)
    return dets, inds
