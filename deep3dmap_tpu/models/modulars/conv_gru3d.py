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

import flax.linen as nn
import jax.numpy as jnp


class ConvGRU3D(nn.Module):
    hidden_dim: int
    kernel: int = 3

    @nn.compact
    def __call__(self, h, x):
        k = (self.kernel,) * 3
        hx = jnp.concatenate([h, x], axis=-1)
        # z and r read the same input: one conv with 2C outputs costs the
        # same MXU time as one gate (the array is N-limited at these widths)
        zr = nn.Conv(2 * self.hidden_dim, k, name="convzr")(hx)
        z = nn.sigmoid(zr[..., :self.hidden_dim])
        r = nn.sigmoid(zr[..., self.hidden_dim:])
        rhx = jnp.concatenate([r * h, x], axis=-1)
        q = nn.tanh(nn.Conv(self.hidden_dim, k, name="convq")(rhx))
        return (1.0 - z) * h + z * q
