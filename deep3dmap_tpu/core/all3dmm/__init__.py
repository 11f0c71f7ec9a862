from .bfm_tools import BFMModel, param2points_bfm, load_bfm_mat, make_synthetic_bfm

__all__ = ["BFMModel", "param2points_bfm", "load_bfm_mat", "make_synthetic_bfm"]
