from .back_project import back_project_dense
from .grid_sample import grid_sample_2d, grid_sample_3d
from .raster_pallas import (raster_depth_st, raster_grid_depth_hard,
                            splat_depth_soft)

__all__ = [
    "back_project_dense",
    "grid_sample_2d",
    "grid_sample_3d",
    "raster_depth_st",
    "raster_grid_depth_hard",
    "splat_depth_soft",
]
