"""Euler/rotation conversions (pytorch3d "XYZ" convention) in pure jnp.

The reference relies on pytorch3d.transforms.euler_angles_to_matrix /
matrix_to_euler_angles (/root/reference/deep3dmap/models/frameworks/
imgs2mesh.py:24,113,195): R = Rx(ax) @ Ry(ay) @ Rz(az).
"""
from __future__ import annotations

import jax.numpy as jnp


def _axis_rot(angle: jnp.ndarray, axis: str) -> jnp.ndarray:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == "X":
        rows = [one, zero, zero, zero, c, -s, zero, s, c]
    elif axis == "Y":
        rows = [c, zero, s, zero, one, zero, -s, zero, c]
    elif axis == "Z":
        rows = [c, -s, zero, s, c, zero, zero, zero, one]
    else:
        raise ValueError(axis)
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(angles: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """angles (..., 3) -> (..., 3, 3); R = R_c0 @ R_c1 @ R_c2."""
    Rs = [_axis_rot(angles[..., i], axis) for i, axis in enumerate(convention)]
    return Rs[0] @ Rs[1] @ Rs[2]


def matrix_to_euler_angles(R: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Inverse of euler_angles_to_matrix for the XYZ convention."""
    if convention != "XYZ":
        raise NotImplementedError("only XYZ supported")
    # R = Rx Ry Rz; standard extraction
    ay = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    ax = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    az = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.stack([ax, ay, az], axis=-1)
