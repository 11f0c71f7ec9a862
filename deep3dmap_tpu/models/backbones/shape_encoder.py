"""3DMM shape/pose encoder.

Parity: /root/reference/deep3dmap/models/backbones/shape_encoder.py:29-60
(Shape3dmmEncoder): feature net -> fc_3dmm (512→512→n_param) and fc_pose
(512→256→7), outputs concatenated [param, pose].
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..builder import BACKBONES
from .vgg import Vgg


@BACKBONES.register_module()
class Shape3dmmEncoder(nn.Module):
    n_param: int = 228  # 199 shape + 29 expression
    feat_dim: int = 512

    @nn.compact
    def __call__(self, img):
        feat = Vgg(feat_dim=self.feat_dim, name="feat_net")(img)
        param = nn.Dense(512, name="fc1")(feat)
        param = nn.relu(param)
        param = nn.Dense(self.n_param, name="fc2",
                         kernel_init=nn.initializers.normal(1e-4))(param)
        pose = nn.Dense(256, name="fc3")(feat)
        pose = nn.relu(pose)
        pose = nn.Dense(7, name="fc4", kernel_init=nn.initializers.normal(1e-4))(pose)
        return jnp.concatenate([param, pose], axis=-1)
