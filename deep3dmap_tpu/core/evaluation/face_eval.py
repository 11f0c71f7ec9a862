"""Face landmark NME evaluation.

Parity: /root/reference/deep3dmap/datasets/AFLW2000.py:100-131 — keypoints
read from the predicted UV position map, mapped back through the inverse crop
transform, normalized by sqrt(bbox_w * bbox_h) of the ground truth.
"""
from __future__ import annotations

import numpy as np


def eval_nme(kpt_pred_uv: np.ndarray, tform_mats: np.ndarray,
             gt_kpt_proj2d: np.ndarray, uv_scale: float = 255.0) -> float:
    """
    Args:
        kpt_pred_uv: (N, 3or2, 68) keypoints in normalized uv-map units [0,1].
        tform_mats: (N, 3, 3) crop transforms (original -> crop space).
        gt_kpt_proj2d: (N, 2, 68) ground-truth 2D projections in original
            image space.
    """
    kpt68 = kpt_pred_uv[:, :2, :] * uv_scale
    nmes = []
    for j in range(kpt68.shape[0]):
        cropped = np.vstack([kpt68[j], np.ones((1, 68))])
        origin = np.linalg.inv(tform_mats[j]) @ cropped
        pred2d = origin[:2, :].T  # (68, 2)
        gt2d = gt_kpt_proj2d[j].T  # (68, 2)
        w = abs(gt2d[:, 0].max() - gt2d[:, 0].min())
        h = abs(gt2d[:, 1].max() - gt2d[:, 1].min())
        err = np.sqrt(((gt2d - pred2d) ** 2).sum(axis=1)).mean()
        nmes.append(err / np.sqrt(max(w * h, 1e-12)))
    return float(np.mean(nmes))
