"""SfM / pose-estimation layer: features, two-view geometry, triangulation,
Schur-complement bundle adjustment, pose-graph optimization.

North-star extension beyond the reference (SURVEY.md §7 stage 9): the
reference pipelines consume given poses; this layer estimates and refines
them on device and integrates with fragment poses (see
tools/benchmark_ba.py for the BA iters/s report surface).
"""
from .ba import BAProblem, BAResult, lm_solve, lm_solve_sharded, project, \
    reprojection_residuals
from .features import Keypoints, Matches, detect_keypoints, \
    extract_descriptors, harris_response, match_descriptors, match_images
from .pose_graph import PoseGraph, compose_chain, edge_residual, graph_cost, \
    odometry_graph, optimize
from .se3 import se3_compose, se3_exp, se3_inverse, se3_log, se3_retract, \
    so3_exp, so3_log, transform_points
from .triangulate import essential_eight_point, essential_ransac, \
    normalize_points, recover_pose, relative_pose, sampson_distance, \
    triangulate, triangulate_two_view

__all__ = [
    "BAProblem", "BAResult", "lm_solve", "lm_solve_sharded", "project",
    "reprojection_residuals", "Keypoints", "Matches", "detect_keypoints",
    "extract_descriptors", "harris_response", "match_descriptors",
    "match_images", "PoseGraph", "compose_chain", "edge_residual",
    "graph_cost", "odometry_graph", "optimize", "se3_compose", "se3_exp",
    "se3_inverse", "se3_log", "se3_retract", "so3_exp", "so3_log",
    "transform_points", "essential_eight_point", "normalize_points",
    "recover_pose", "relative_pose", "triangulate", "triangulate_two_view",
    "essential_ransac", "sampson_distance",
]
