"""Push-style async datasets: producer processes + shared-memory slots.

Capability parity with the reference's MultiPIE async datasets
(/root/reference/deep3dmap/datasets/multipie_3d.py:267 FaceTexUVAsyncDataset,
:516 FaceImagesAsyncDataset, :57 get_batch_supervise): N producer processes
prepare batches into a pool of shared-memory float arrays; ``get()`` returns
the next ready batch; a free-slot queue recycles buffers.  This is the
``use_data_loaders=False`` path the StateMachineRunner drives.

Generalization: ``AsyncProducerDataset`` wraps ANY registered dataset cfg —
producers build the dataset in their own process (numpy-only; they pin JAX
to CPU so workers never claim the TPU) and push stacked batches.  Arrays
ride shared memory; only slot indices and shapes cross the result queue.
"""
from __future__ import annotations

import ctypes
import multiprocessing as mp
from typing import Dict, List, Optional, Sequence

import numpy as np

from .builder import DATASETS

_SENTINEL = None


def _producer_loop(dataset_cfg, batch_size, keys, slot_elems, n_slots,
                   arrays, result_q, free_q, seed, epoch_mode):
    """Worker: build the dataset locally, fill free slots with batches."""
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_worker_cache")
    try:  # never let a data worker claim the TPU
        import jax

        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

    from .builder import build_dataset, _stack_samples

    ds = build_dataset(dict(dataset_cfg))
    rs = np.random.RandomState(seed)
    views = {
        k: np.frombuffer(arrays[k].get_obj(), np.float32).reshape(n_slots, -1)
        for k in keys
    }
    order = np.arange(len(ds))
    pos = len(order)  # force an initial shuffle
    while True:
        slot = free_q.get()
        if slot is _SENTINEL:
            break
        if epoch_mode:
            if pos + batch_size > len(order):
                rs.shuffle(order)
                pos = 0
            idxs = order[pos:pos + batch_size]
            pos += batch_size
        else:
            idxs = rs.randint(0, len(ds), batch_size)
        batch = _stack_samples([ds[int(i)] for i in idxs])
        shapes = {}
        for k in keys:
            a = np.ascontiguousarray(batch[k], np.float32).ravel()
            views[k][slot, :a.size] = a
            shapes[k] = np.asarray(batch[k]).shape
        result_q.put((slot, shapes))


@DATASETS.register_module()
class AsyncProducerDataset:
    """Producer-process dataset pool over any registered dataset cfg.

    get() -> dict of float32 numpy arrays (one ready batch)."""

    state = "sup"

    def __init__(self, dataset: dict, batch_size: int = 1, nthread: int = 2,
                 n_slots: int = 4, seed: int = 123, state: Optional[str] = None,
                 epoch_mode: bool = True, keys: Optional[Sequence[str]] = None):
        if state is not None:
            self.state = state
        self.batch_size = batch_size
        self._cfg = dict(dataset)

        # probe one sample in-process for keys/shapes
        from .builder import build_dataset

        probe_ds = build_dataset(dict(dataset))
        self._len = len(probe_ds)
        self.iter_size = max(1, self._len // batch_size)
        probe = probe_ds[0]
        self.keys: List[str] = list(keys) if keys else [
            k for k, v in probe.items()
            if isinstance(v, np.ndarray) or np.isscalar(v)
        ]
        slot_elems = {
            k: int(batch_size * max(1, np.asarray(probe[k]).size))
            for k in self.keys
        }

        ctx = mp.get_context("spawn")
        self._arrays = {
            k: ctx.Array(ctypes.c_float, n_slots * slot_elems[k])
            for k in self.keys
        }
        self._views = {
            k: np.frombuffer(self._arrays[k].get_obj(), np.float32)
            .reshape(n_slots, -1)
            for k in self.keys
        }
        self._result = ctx.Queue()
        self._free = ctx.Queue()
        for i in range(n_slots):
            self._free.put(i)

        self._procs = []
        for i in range(nthread):
            p = ctx.Process(
                target=_producer_loop,
                args=(self._cfg, batch_size, self.keys, slot_elems, n_slots,
                      self._arrays, self._result, self._free, seed + i,
                      epoch_mode),
                daemon=True)
            p.start()
            self._procs.append(p)

    def __len__(self):
        return self._len

    def get(self, timeout: float = 120.0) -> Dict[str, np.ndarray]:
        """Pull the next ready batch (multipie_3d.py:309 get())."""
        slot, shapes = self._result.get(timeout=timeout)
        out = {}
        for k in self.keys:
            size = int(np.prod(shapes[k])) if shapes[k] else 1
            arr = np.array(self._views[k][slot, :size], copy=True)
            out[k] = arr.reshape(shapes[k])
        self._free.put(slot)
        return out

    def __iter__(self):
        for _ in range(self.iter_size):
            yield self.get()

    def close(self):
        for _ in self._procs:
            self._free.put(_SENTINEL)
        for p in self._procs:
            p.join(timeout=10)
            if p.is_alive():
                p.terminate()
        self._procs = []

    def __del__(self):  # best-effort cleanup
        try:
            self.close()
        except Exception:
            pass


@DATASETS.register_module()
class FaceTexUVAsyncDataset(AsyncProducerDataset):
    """Supervised face tex-UV tuples via producers
    (multipie_3d.py:267)."""

    state = "sup"


@DATASETS.register_module()
class FaceImagesAsyncDataset(AsyncProducerDataset):
    """Unsupervised face image tuples via producers
    (multipie_3d.py:516)."""

    state = "sup_unsup"
