"""Library inference helpers: single/multi-device test loops.

Parity: /root/reference/deep3dmap/runners/forward_engine.py:16-240
(single_gpu_test / multi_gpu_test / collect_results) — on TPU one jitted
forward over the globally-sharded batch IS the multi-device loop; cross-host
result collection is a process_allgather.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import numpy as np

from ..parallel.mesh import shard_batch


def forward_test_loop(framework, params, model_state, data_loader, mesh,
                      progress: bool = True) -> Dict[str, List[np.ndarray]]:
    """Run ``framework.forward_test`` over a loader; returns stacked host
    results (the single/multi_gpu_test analogue)."""
    fwd = jax.jit(lambda p, s, b: framework.forward_test(p, s, b))
    outputs: Dict[str, List[np.ndarray]] = {}
    for i, batch in enumerate(data_loader):
        out, model_state = fwd(params, model_state, shard_batch(batch, mesh))
        out = jax.device_get(out)
        for k, v in out.items():
            outputs.setdefault(k, []).append(np.asarray(v))
        if progress:
            print(f"\rbatch {i + 1}/{len(data_loader)}", end="", flush=True)
    if progress:
        print()
    return outputs


def collect_results(results, world_size: Optional[int] = None):
    """Gather per-process results to every host (parity:
    tools/test.py:139-212 collect_results_cpu/gpu)."""
    if jax.process_count() <= 1:
        return results
    from jax.experimental import multihost_utils

    return multihost_utils.process_allgather(results)
