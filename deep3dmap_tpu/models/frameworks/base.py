"""Framework base: the pure-function model contract.

Parity with the reference's BaseFramework/CustomFramework contracts
(/root/reference/deep3dmap/models/frameworks/base.py:118-222, custom.py:12):
a framework bundles network definitions with ``init`` / ``loss_fn`` /
``val_fn`` pure functions the runner jits.  ``parse_losses`` mirrors
``_parse_losses`` (base.py:134-172): sum all ``*loss*`` keys into the total
and expose everything as log_vars — but *without* the explicit
dist.all_reduce: under pjit the batch is globally sharded, so a jnp.mean
already is the cross-device mean.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp


def parse_losses(losses: Dict[str, Any]) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    log_vars = {}
    for name, value in losses.items():
        log_vars[name] = jnp.mean(value) if hasattr(value, "mean") or hasattr(value, "shape") else value
    loss = sum(v for k, v in log_vars.items() if "loss" in k)
    log_vars = dict(log_vars)
    return loss, log_vars


class BaseFramework:
    """Subclasses define networks and implement the pure functions."""

    def init(self, rng, batch):
        raise NotImplementedError

    def loss_fn(self, params, model_state, batch, rng):
        raise NotImplementedError

    # optional: val_fn(params, model_state, batch) -> dict(log_vars=...)
