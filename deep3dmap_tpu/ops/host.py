"""Host-side post-processing ops: pixel_group (PAN) and contour_expand
(PSENet).

Parity targets: /root/reference/deep3dmap/core/ops/csrc/pytorch/
pixel_group.cpp and contour_expand.cpp — CPU-only BFS region growing used
as text-detection post-processing.  These are inherently sequential
queue/flood-fill algorithms over small label maps, so they stay on host as
numpy (the reference keeps them on CPU too); nothing here touches the
device hot path.

Note: contour_expand.cpp's ``kernel_step`` is computed with a no-op
``for_each`` (the lambda's return value is discarded, contour_expand.cpp:53),
so the C++ actually always reads kernel 0.  We implement the *intended*
PSENet progressive-scale expansion.
"""
from __future__ import annotations

from collections import deque

import numpy as np

__all__ = ["pixel_group", "contour_expand"]

_NEIGH = ((-1, 0), (1, 0), (0, -1), (0, 1))


def pixel_group(score, mask, embedding, kernel_label, kernel_contour,
                kernel_region_num: int, distance_threshold: float):
    """Group text pixels around kernel regions by embedding distance
    (pixel_group.cpp:36-119).

    score (H, W) float; mask (H, W) bool; embedding (H, W, D);
    kernel_label (H, W) int32; kernel_contour (H, W) uint8.
    Returns a list of ``kernel_region_num`` lists:
    [mean_confidence, px0, py0, px1, py1, ...] per region (region 0 =
    background, kept empty like the C++)."""
    score = np.asarray(score, np.float32)
    mask = np.asarray(mask, bool)
    embedding = np.asarray(embedding, np.float32)
    label = np.asarray(kernel_label, np.int32).copy()
    contour = np.asarray(kernel_contour, np.uint8)
    H, W = score.shape
    D = embedding.shape[-1]
    thr2 = distance_threshold * distance_threshold

    # mean embedding per kernel region (vectorized over the label map)
    sums = np.zeros((kernel_region_num, D), np.float64)
    counts = np.zeros(kernel_region_num, np.int64)
    pos = label > 0
    np.add.at(sums, label[pos], embedding[pos])
    np.add.at(counts, label[pos], 1)
    means = sums / np.maximum(counts, 1)[:, None]

    # BFS from kernel contour pixels outward through mask by embedding dist
    q = deque((y, x, label[y, x])
              for y, x in zip(*np.nonzero((label > 0) & (contour > 0))))
    while q:
        y, x, l = q.popleft()
        for dy, dx in _NEIGH:
            ty, tx = y + dy, x + dx
            if not (0 <= ty < H and 0 <= tx < W):
                continue
            if not mask[ty, tx] or label[ty, tx] > 0:
                continue
            d = embedding[ty, tx] - means[l]
            if float(d @ d) >= thr2:
                continue
            label[ty, tx] = l
            q.append((ty, tx, l))

    # estimate_confidence (pixel_group.cpp:6-34): per-region mean score +
    # flat [x, y] coordinate list
    out = [[0.0, 0.0] for _ in range(kernel_region_num)]
    for l in range(1, kernel_region_num):
        ys, xs = np.nonzero(label == l)
        if len(ys) == 0:
            continue
        conf = float(score[ys, xs].mean())
        coords = np.empty(2 * len(ys), np.float32)
        coords[0::2] = xs
        coords[1::2] = ys
        out[l] = [conf, float(len(ys))] + coords.tolist()
    return out


def contour_expand(kernel_mask, internal_kernel_label, min_kernel_area: int,
                   kernel_num: int):
    """PSENet progressive scale expansion (contour_expand.cpp kernel_dilate).

    kernel_mask (K, H, W) uint8 — kernels ordered large (0) -> small (K-1);
    internal_kernel_label (H, W) int32 — CC labels on the smallest kernel.
    Regions smaller than min_kernel_area are dropped.  Returns the expanded
    (H, W) label map as a list of rows (C++ return type)."""
    data = np.asarray(kernel_mask, np.uint8)
    label0 = np.asarray(internal_kernel_label, np.int32)
    K, H, W = data.shape
    assert label0.shape == (H, W)

    areas = np.bincount(label0.ravel(), minlength=kernel_num + 1)
    keep = (areas >= min_kernel_area)
    keep[0] = False
    text = np.where(keep[label0], label0, 0).astype(np.int32)

    q = deque((y, x) for y, x in zip(*np.nonzero(text)))
    for kid in range(min(kernel_num, K) - 2, -1, -1):
        layer = data[kid]
        nxt = deque()
        while q:
            y, x = q.popleft()
            l = text[y, x]
            is_edge = True
            for dy, dx in _NEIGH:
                ty, tx = y + dy, x + dx
                if not (0 <= ty < H and 0 <= tx < W):
                    continue
                if layer[ty, tx] == 0 or text[ty, tx] > 0:
                    continue
                text[ty, tx] = l
                q.append((ty, tx))
                is_edge = False
            if is_edge:
                nxt.append((y, x))
        q = nxt
    return [row.tolist() for row in text]
