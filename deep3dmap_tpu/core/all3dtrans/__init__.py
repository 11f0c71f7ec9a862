from .rotations import euler_angles_to_matrix, matrix_to_euler_angles

__all__ = ["euler_angles_to_matrix", "matrix_to_euler_angles"]
