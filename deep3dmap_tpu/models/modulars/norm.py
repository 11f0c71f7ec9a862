"""Cross-device synchronized batch normalization.

Parity target: /root/reference/deep3dmap/core/ops/csrc/pytorch/sync_bn.cpp
(+ cuda/sync_bn_cuda.cu) — the reference hand-rolls a 3-phase CUDA SyncBN
(local mean/var, NCCL allreduce, normalize) plus a SyncBuffersHook.  On TPU
none of that machinery exists as custom code: flax's BatchNorm already
computes batch statistics with ``lax.pmean`` over a named mesh axis when
``axis_name`` is set, so SyncBN collapses to a configuration.  This module
pins that configuration and degrades to plain BatchNorm outside shard_map /
pmap traces (single-device runs), mirroring the reference's CPU fallback.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax


def _axis_bound(axis_name: str) -> bool:
    try:
        jax.lax.axis_index(axis_name)
        return True
    except NameError:
        return False


class SyncBatchNorm(nn.Module):
    """BatchNorm whose statistics are averaged across the ``axis_name``
    mesh axis (the XLA equivalent of the reference's NCCL SyncBN kernel).

    use_running_average=True reproduces eval mode; momentum matches the
    reference default 0.1 (flax convention: momentum here is the decay of
    the running stat, i.e. torch's ``1 - momentum``)."""

    axis_name: str = "data"
    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        ura = nn.merge_param("use_running_average",
                             self.use_running_average, use_running_average)
        axis = self.axis_name if _axis_bound(self.axis_name) else None
        return nn.BatchNorm(use_running_average=ura, momentum=self.momentum,
                            epsilon=self.epsilon, axis_name=axis,
                            name="bn")(x)
