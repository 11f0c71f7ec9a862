from .back_project import back_project_dense
from .grid_sample import grid_sample_2d, grid_sample_3d

__all__ = ["back_project_dense", "grid_sample_2d", "grid_sample_3d"]
