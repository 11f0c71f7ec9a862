from .rotations import euler_angles_to_matrix, matrix_to_euler_angles
from .lmk2angle import (P2sRt, R2radangle, estimate_affine_matrix_3d22d,
                        face_orientation, is_rotation_matrix, matrix2angle,
                        project_param)

__all__ = [
    "euler_angles_to_matrix",
    "matrix_to_euler_angles",
    "P2sRt",
    "R2radangle",
    "estimate_affine_matrix_3d22d",
    "face_orientation",
    "is_rotation_matrix",
    "matrix2angle",
    "project_param",
]
