from .back_project import back_project_dense
from .grid_sample import grid_sample_2d, grid_sample_3d
from .raster_pallas import (raster_depth_st, raster_grid_depth_hard,
                            splat_depth_soft)
from .bbox import (batched_nms, bbox_overlaps, box_iou_rotated, nms,
                   nms_match, nms_rotated, soft_nms)
from .focal_loss import sigmoid_focal_loss, softmax_focal_loss
from .points import (ball_query, furthest_point_sample, gather_points,
                     group_points, knn, square_distance, three_interpolate,
                     three_interpolate_weights, three_nn)
from .roi_align import roi_align, roi_align_rotated, roi_pool
from .voxel import (dynamic_scatter, points_in_boxes, voxelize,
                    voxelize_host)
from .deform import (deform_conv2d, deform_roi_pool, modulated_deform_conv2d,
                     ms_deform_attn)
from .vision import (border_align, carafe, carafe_naive, corner_pool,
                     correlation, masked_conv2d, psamask, tin_shift)
from .box3d import (boxes_iou3d, boxes_iou_bev, boxes_overlap_bev, nms3d,
                    nms3d_normal, roiaware_pool3d, roipoint_pool3d)
from .host import contour_expand, pixel_group

__all__ = [
    "back_project_dense",
    "grid_sample_2d",
    "grid_sample_3d",
    "raster_depth_st",
    "raster_grid_depth_hard",
    "splat_depth_soft",
    "bbox_overlaps", "nms", "soft_nms", "batched_nms", "nms_match",
    "nms_rotated", "box_iou_rotated",
    "sigmoid_focal_loss", "softmax_focal_loss",
    "knn", "ball_query", "furthest_point_sample", "gather_points",
    "group_points", "three_nn", "three_interpolate",
    "three_interpolate_weights", "square_distance",
    "roi_align", "roi_align_rotated", "roi_pool",
    "voxelize", "voxelize_host", "dynamic_scatter", "points_in_boxes",
    "deform_conv2d", "modulated_deform_conv2d", "deform_roi_pool",
    "ms_deform_attn",
    "carafe", "carafe_naive", "masked_conv2d", "correlation", "tin_shift",
    "psamask", "border_align", "corner_pool",
    "boxes_iou_bev", "boxes_overlap_bev", "boxes_iou3d", "nms3d",
    "nms3d_normal", "roiaware_pool3d", "roipoint_pool3d",
    "pixel_group", "contour_expand",
]
