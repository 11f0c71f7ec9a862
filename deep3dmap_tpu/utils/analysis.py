"""Model complexity analysis: FLOPs/params from the compiled XLA program.

Parity: /root/reference/deep3dmap/core/utils/flops_counter.py:592
(get_model_complexity_info) and engines/analysis/jit_analysis.py:684 — on
TPU the ground truth is the compiler's own cost analysis, not per-module
python hooks.
"""
from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import numpy as np


def count_params(params) -> int:
    return int(sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params)))


def get_model_complexity_info(fn: Callable, *args, static_argnums=()) -> dict:
    """Compile ``fn(*args)`` and read XLA's cost analysis.

    Returns dict(flops=..., bytes_accessed=..., params=None-or-int,
    params_readable=..., flops_readable=...).
    """
    lowered = jax.jit(fn, static_argnums=static_argnums).lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_accessed = float(cost.get("bytes accessed", 0.0))

    def _fmt(x, unit=""):
        for mag, suf in ((1e12, "T"), (1e9, "G"), (1e6, "M"), (1e3, "K")):
            if x >= mag:
                return f"{x / mag:.2f} {suf}{unit}"
        return f"{x:.0f} {unit}"

    out = dict(flops=flops, bytes_accessed=bytes_accessed,
               flops_readable=_fmt(flops, "FLOPs"),
               bytes_readable=_fmt(bytes_accessed, "B"))
    if args and isinstance(args[0], dict):
        out["params"] = count_params(args[0])
        out["params_readable"] = _fmt(out["params"])
    return out
