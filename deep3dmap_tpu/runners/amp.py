"""Mixed-precision training helpers (the AMP surface).

Parity target: /root/reference/deep3dmap/engines/optim/optimizer/
amp_optimizer_wrapper.py (dormant engines) — torch autocast + GradScaler.
On TPU the idiomatic policy is **bfloat16 compute, float32 master params**:
bf16 has fp32's exponent range, so no loss-scaling machinery is needed (the
GradScaler half of AMP is intentionally absent; ``loss_scale`` exists for
API parity and for experiments with float16).

Usage — wrap a loss function; params stay fp32, forward runs in bf16::

    amped = amp_loss(loss_fn)                 # drop-in for value_and_grad
    loss, grads = jax.value_and_grad(amped)(params, batch)

Note: round-1 benchmarking showed bf16 slower than fp32 for the small
NeuralRecon convs at 96³ (dominated by HBM-bound gathers, not MXU), so AMP
is opt-in per config (``optimizer_config=dict(amp=True)``), not default.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast only floating-point leaves (ints/bools pass through)."""
    def _c(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_c, tree)


def amp_loss(loss_fn: Callable, compute_dtype=jnp.bfloat16,
             loss_scale: Optional[float] = None) -> Callable:
    """Wrap ``loss_fn(params, *args)`` so the forward pass runs in
    ``compute_dtype`` while gradients flow back to fp32 master params.

    The cast sits *inside* the differentiated function, so XLA fuses the
    down-cast into the first matmul of each op and the up-cast into the
    grad accumulation — no extra HBM traffic beyond the narrower activations.
    """

    @functools.wraps(loss_fn)
    def wrapped(params, *args, **kwargs):
        lp = cast_floating(params, compute_dtype)
        la = cast_floating(args, compute_dtype)
        out = loss_fn(lp, *la, **kwargs)
        # loss itself accumulates in fp32 (sum reductions overflow bf16)
        if isinstance(out, tuple):
            loss, aux = out
            loss = loss.astype(jnp.float32)
            if loss_scale:
                loss = loss * loss_scale
            return loss, aux
        loss = out.astype(jnp.float32)
        return loss * loss_scale if loss_scale else loss

    return wrapped


def unscale_grads(grads, loss_scale: Optional[float]):
    """Undo ``loss_scale`` on gradients (no-op for the bf16 default)."""
    if not loss_scale:
        return grads
    inv = 1.0 / loss_scale
    return jax.tree_util.tree_map(lambda g: g * inv, grads)


def grads_finite(grads) -> jax.Array:
    """True iff every gradient element is finite — the GradScaler skip test
    (only relevant for float16 experiments)."""
    leaves = jax.tree_util.tree_leaves(grads)
    ok = jnp.asarray(True)
    for leaf in leaves:
        ok = ok & jnp.all(jnp.isfinite(leaf))
    return ok
