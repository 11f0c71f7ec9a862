"""Functional training state: the pytree carried through the jitted step.

The reference mutates a Runner + model in place; here the whole training
state (params, optimizer state, recurrent model carries such as the global
GRU hidden volumes, RNG key, step counter) is one immutable pytree, donated
into the jitted step — the TPU-native equivalent of
/root/reference/deep3dmap/runners/base_runner.py's runner attributes.
"""
from __future__ import annotations

from typing import Any

import jax
from flax import struct


@struct.dataclass
class TrainState:
    step: int
    params: Any
    opt_state: Any
    model_state: Any  # mutable model carries: GRU global volumes, batch stats...
    rng: Any

    @classmethod
    def create(cls, rng, params, tx, model_state=None):
        return cls(step=0, params=params, opt_state=tx.init(params),
                   model_state=model_state if model_state is not None else {},
                   rng=rng)

    def next_rng(self):
        """Split the carried RNG; returns (new_state, subkey)."""
        rng, sub = jax.random.split(self.rng)
        return self.replace(rng=rng), sub
