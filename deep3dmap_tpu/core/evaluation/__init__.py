from .depth_eval import eval_depth
from .mesh_eval import eval_fscore_points, nn_correspondance
from .face_eval import eval_nme

__all__ = ["eval_depth", "eval_fscore_points", "nn_correspondance", "eval_nme"]
