"""Basel Face Model (3DMM) parameter-to-vertex synthesis.

Parity: /root/reference/deep3dmap/core/all3dmm/bfm_tools.py:4-20
(param2points_bfm): vertices = mu + W_shape (alpha * sigma)
+ W_exp (beta / (1000 * sigma_exp)), with 199 shape and 29 expression
coefficients over 53215 vertices.  Pure jnp; the basis matmuls run on the MXU.

Assets: ``load_bfm_mat`` reads the standard Model_Shape.mat /
Model_Expression.mat / sigma_exp.mat files when available;
``make_synthetic_bfm`` builds a structurally-identical random model for
tests/CI where the (licensed) BFM data cannot ship.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np


class BFMModel(NamedTuple):
    mu_shape: jnp.ndarray    # (3N, 1)
    w_shape: jnp.ndarray     # (3N, n_shape)
    sigma: jnp.ndarray       # (n_shape, 1)
    w_exp: jnp.ndarray       # (3N, n_exp)
    sigma_exp: jnp.ndarray   # (n_exp, 1)
    triangles: jnp.ndarray   # (T, 3) int32
    keypoints: jnp.ndarray   # (68,) int32 landmark vertex indices

    @property
    def n_verts(self):
        return self.mu_shape.shape[0] // 3

    @property
    def n_shape(self):
        return self.w_shape.shape[1]

    @property
    def n_exp(self):
        return self.w_exp.shape[1]


def load_bfm_mat(shape_param_path: str, exp_param_path: str, other_param_path: str) -> BFMModel:
    """Load from the reference's .mat assets (imgs2mesh.py:49-58)."""
    import scipy.io as sio

    shape = sio.loadmat(shape_param_path)
    exp = sio.loadmat(exp_param_path)
    other = sio.loadmat(other_param_path)
    return BFMModel(
        mu_shape=jnp.asarray(shape["mu_shape"], jnp.float32).reshape(-1, 1),
        w_shape=jnp.asarray(shape["w"], jnp.float32),
        sigma=jnp.asarray(shape["sigma"], jnp.float32).reshape(-1, 1),
        w_exp=jnp.asarray(exp["w_exp"], jnp.float32),
        sigma_exp=jnp.asarray(other["sigma_exp"], jnp.float32).reshape(-1, 1),
        triangles=jnp.asarray(shape["tri"], jnp.int32).T - 1,
        keypoints=jnp.asarray(shape["keypoints"][0], jnp.int32),
    )


def make_synthetic_bfm(n_verts: int = 512, n_shape: int = 199, n_exp: int = 29,
                       n_tri: int = 900, seed: int = 0) -> BFMModel:
    """Random but geometrically-plausible model for tests: mean shape on a
    sphere-ish surface, small smooth basis deformations."""
    rs = np.random.RandomState(seed)
    theta = rs.uniform(0, np.pi, n_verts)
    phi = rs.uniform(0, 2 * np.pi, n_verts)
    mu = np.stack([np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi),
                   np.cos(theta)], axis=-1) * 1e5  # BFM-like μm scale
    w_shape = rs.randn(3 * n_verts, n_shape) * 10.0
    w_exp = rs.randn(3 * n_verts, n_exp) * 10.0
    tris = rs.randint(0, n_verts, (n_tri, 3))
    kpts = rs.choice(n_verts, 68, replace=n_verts < 68)
    return BFMModel(
        mu_shape=jnp.asarray(mu.reshape(-1, 1), jnp.float32),
        w_shape=jnp.asarray(w_shape, jnp.float32),
        sigma=jnp.asarray(np.abs(rs.randn(n_shape, 1)) * 1e3, jnp.float32),
        w_exp=jnp.asarray(w_exp, jnp.float32),
        sigma_exp=jnp.asarray(np.abs(rs.randn(n_exp, 1)) + 0.1, jnp.float32),
        triangles=jnp.asarray(tris, jnp.int32),
        keypoints=jnp.asarray(kpts, jnp.int32),
    )


def param2points_bfm(model: BFMModel, preds: jnp.ndarray):
    """preds (B, >=235): [0:n_shape] shape, [n_shape:n_shape+n_exp] expression,
    [n_shape+n_exp : +7] pose (scale, 3 euler angles, 3 translation).

    Returns (face_shape (B, N, 3), pose (B, 7)) — matching the reference's
    [face_shape, preds[:, 228:235]] output.
    """
    ns, ne = model.n_shape, model.n_exp
    alpha = preds[:, :ns, None] * model.sigma[None]                    # (B,ns,1)
    beta = preds[:, ns:ns + ne, None] / (1000.0 * model.sigma_exp[None])
    shape = (jnp.einsum("vs,bsi->bvi", model.w_shape, alpha)
             + jnp.einsum("ve,bei->bvi", model.w_exp, beta)
             + model.mu_shape[None])
    face_shape = shape.reshape(preds.shape[0], -1, 3)
    pose = preds[:, ns + ne:ns + ne + 7]
    return face_shape, pose
