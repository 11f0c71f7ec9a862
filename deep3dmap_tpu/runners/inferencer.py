"""BaseInferencer: config + checkpoint -> callable predictor.

Parity: /root/reference/deep3dmap/engines/infer/infer.py:686
(BaseInferencer) — one-line inference API over any registered framework.
"""
from __future__ import annotations

from typing import Any, Optional, Union

import jax

from ..models import build_reconstruction
from ..parallel.mesh import make_mesh, shard_batch
from ..utils.config import Config


class BaseInferencer:
    def __init__(self, config: Union[str, Config, dict],
                 checkpoint: Optional[str] = None, mesh=None, seed: int = 0):
        if isinstance(config, str):
            config = Config.fromfile(config)
        self.cfg = config
        self.mesh = mesh or make_mesh()
        self.framework = build_reconstruction(config["model"])
        self._params = None
        self._mstate = None
        self._ckpt = checkpoint
        self._fwd = None
        self._seed = seed

    def _ensure_init(self, batch):
        if self._params is not None:
            return
        self._params, self._mstate = self.framework.init(
            jax.random.PRNGKey(self._seed), batch)
        if self._ckpt:
            from .checkpoint import load_checkpoint_raw

            restored = load_checkpoint_raw(self._ckpt)
            self._params = restored["params"]
            raw_ms = restored.get("model_state")
            if raw_ms:
                leaves = jax.tree_util.tree_leaves(raw_ms)
                treedef = jax.tree_util.tree_structure(self._mstate)
                if treedef.num_leaves == len(leaves):
                    self._mstate = jax.tree_util.tree_unflatten(treedef, leaves)
        self._fwd = jax.jit(lambda p, s, b: self.framework.forward_test(p, s, b))

    def __call__(self, batch: dict) -> Any:
        batch = shard_batch(batch, self.mesh)
        self._ensure_init(batch)
        out, self._mstate = self._fwd(self._params, self._mstate, batch)
        return jax.device_get(out)
