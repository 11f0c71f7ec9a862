"""Sharded checkpointing on orbax.

Parity surface: /root/reference/deep3dmap/runners/checkpoint.py (save/load
with meta, latest pointer) and base_runner.py:332 (resume restoring
epoch/iter/optimizer).  On TPU the checkpoint is a sharded pytree save of the
whole TrainState (params, opt state, recurrent volumes, RNG, step); restoring
under a different mesh re-shards automatically, replacing the reference's
iter-rescaling hack (base_runner.py:358-367).
"""
from __future__ import annotations

import json
import os
import os.path as osp
import re
import shutil
from typing import Any, Optional

import jax


def _ckpt_dir(work_dir: str) -> str:
    return osp.join(osp.abspath(work_dir), "checkpoints")


def _step_of(state) -> int:
    return int(jax.device_get(state.step))


def save_checkpoint(work_dir: str, state, meta: Optional[dict] = None,
                    max_keep: int = -1) -> str:
    """Save TrainState under ``work_dir/checkpoints/ckpt_<step>``."""
    import orbax.checkpoint as ocp

    root = _ckpt_dir(work_dir)
    os.makedirs(root, exist_ok=True)
    step = _step_of(state)
    path = osp.join(root, f"ckpt_{step}")
    if osp.exists(path):
        shutil.rmtree(path)

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()

    if meta is not None:
        with open(osp.join(path, "meta.json"), "w") as f:
            json.dump(meta, f)
    with open(osp.join(root, "latest"), "w") as f:
        f.write(f"ckpt_{step}")

    if max_keep > 0:
        ckpts = sorted(
            (int(m.group(1)), name) for name in os.listdir(root)
            if (m := re.fullmatch(r"ckpt_(\d+)", name)))
        for _, name in ckpts[:-max_keep]:
            shutil.rmtree(osp.join(root, name), ignore_errors=True)
    return path


def latest_checkpoint(work_dir: str) -> Optional[str]:
    root = _ckpt_dir(work_dir)
    pointer = osp.join(root, "latest")
    if osp.exists(pointer):
        with open(pointer) as f:
            name = f.read().strip()
        path = osp.join(root, name)
        if osp.exists(path):
            return path
    return None


def load_checkpoint(path: str, target: Any) -> Any:
    """Restore a TrainState pytree. ``target`` provides structure/shardings."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target=jax.device_get(target))
    return restored


def load_checkpoint_raw(path: str) -> dict:
    """Structure-free restore: returns the saved pytree as nested dicts of
    numpy arrays.  For inference-time loading where only params/model_state
    are needed (the optimizer chain need not be reconstructed)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path)


def load_meta(path: str) -> dict:
    mpath = osp.join(path, "meta.json")
    if osp.exists(mpath):
        with open(mpath) as f:
            return json.load(f)
    return {}
