"""Dense 3D convolutional GRU cell.

Re-design of the reference's sparse ConvGRU
(/root/reference/deep3dmap/models/modulars/sparse_cnn.py:199-221) used for
fragment-to-fragment hidden-state fusion (gru_fusion.py:285-288): identical
gating math, dense NDHWC 3D convolutions instead of torchsparse.

    z = sigmoid(Wz * [h, x])
    r = sigmoid(Wr * [h, x])
    q = tanh(Wq * [r ⊙ h, x])
    h' = (1 - z) ⊙ h + z ⊙ q
"""
from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvGRU3D(nn.Module):
    """Dense ConvGRU cell; optionally spatially sharded.

    ``spatial=(mesh, axis)`` (or ``(mesh, axis, batch_axis)``) routes the
    gate convolutions through ``parallel.spatial.conv_gru3d_halo``: the
    hidden/input volumes are sharded on their X axis over ``axis`` and each
    conv exchanges 1-voxel halo slabs with mesh neighbors via ppermute over
    ICI (SURVEY §5.7) — bitwise-equal to the unsharded cell.  The param tree
    is identical either way, so checkpoints are interchangeable.
    """

    hidden_dim: int
    kernel: int = 3
    spatial: Optional[Tuple] = None

    def _halo_active(self):
        if self.spatial is None:
            return False
        mesh, axis = self.spatial[0], self.spatial[1]
        return axis in mesh.axis_names and mesh.shape[axis] > 1

    @nn.compact
    def __call__(self, h, x):
        k = (self.kernel,) * 3
        convzr = nn.Conv(2 * self.hidden_dim, k, name="convzr")
        convq = nn.Conv(self.hidden_dim, k, name="convq")
        if self._halo_active() and not self.is_initializing():
            from ...parallel.spatial import conv_gru3d_halo

            cin = h.shape[-1] + x.shape[-1]
            # bind the conv params without running the dense convs (the
            # dummy results are unused and DCE'd)
            _ = convzr(jnp.zeros((1, 1, 1, 1, cin), h.dtype))
            _ = convq(jnp.zeros((1, 1, 1, 1, cin), h.dtype))
            p = {"convzr": self.variables["params"]["convzr"],
                 "convq": self.variables["params"]["convq"]}
            mesh, axis = self.spatial[0], self.spatial[1]
            batch_axis = self.spatial[2] if len(self.spatial) > 2 else None
            return conv_gru3d_halo(p, h, x, mesh, axis, batch_axis=batch_axis)
        hx = jnp.concatenate([h, x], axis=-1)
        # z and r read the same input: one conv with 2C outputs costs the
        # same MXU time as one gate (the array is N-limited at these widths)
        zr = convzr(hx)
        z = nn.sigmoid(zr[..., :self.hidden_dim])
        r = nn.sigmoid(zr[..., self.hidden_dim:])
        rhx = jnp.concatenate([r * h, x], axis=-1)
        q = nn.tanh(convq(rhx))
        return (1.0 - z) * h + z * q
