"""Dataset/pipeline registries and loader construction.

Parity: /root/reference/deep3dmap/datasets/builder.py:24-151 — DATASETS /
PIPELINES registries and ``build_dataloader``.  The TPU-native loader is a
plain host-side iterator producing numpy pytrees (global batches); sharding
onto the mesh happens in the runner via NamedSharding — the entire
DataContainer/collate/scatter machinery of the reference is unnecessary.
"""
from __future__ import annotations

from typing import Iterable, Optional

import numpy as np

from ..utils.registry import Registry

DATASETS = Registry("dataset")
PIPELINES = Registry("pipeline")


def build_dataset(cfg, default_args=None):
    """Wrapper-aware dataset construction (parity:
    /root/reference/deep3dmap/datasets/builder.py:55-81)."""
    import copy

    from . import wrappers

    if isinstance(cfg, (list, tuple)):
        return wrappers.ConcatDataset(
            [build_dataset(c, default_args) for c in cfg])
    if cfg["type"] == "ConcatDataset":
        return wrappers.ConcatDataset(
            [build_dataset(c, default_args) for c in cfg["datasets"]],
            cfg.get("separate_eval", True))
    if cfg["type"] == "RepeatDataset":
        return wrappers.RepeatDataset(
            build_dataset(cfg["dataset"], default_args), cfg["times"])
    if cfg["type"] == "ClassBalancedDataset":
        return wrappers.ClassBalancedDataset(
            build_dataset(cfg["dataset"], default_args),
            cfg["oversample_thr"])
    if cfg["type"] == "MultiImageMixDataset":
        cp_cfg = copy.deepcopy(dict(cfg))
        cp_cfg["dataset"] = build_dataset(cp_cfg["dataset"])
        cp_cfg.pop("type")
        return wrappers.MultiImageMixDataset(**cp_cfg)
    return DATASETS.build(dict(cfg), **(default_args or {}))


class NumpyLoader:
    """Batches a map-style dataset of dict samples into stacked numpy arrays.

    With ``num_workers > 0`` batches are built by a worker thread pool ahead
    of consumption (up to ``num_workers * prefetch_factor`` in flight,
    yielded in order) — the TPU-native counterpart of the reference's torch
    DataLoader worker processes (/root/reference/deep3dmap/datasets/
    builder.py:84-151).  Threads rather than processes: the hot per-sample
    work (jpeg decode, cv2/numpy transforms) releases the GIL, workers see
    the live dataset object (no pickling), and the consumer is a jitted TPU
    step that leaves the host mostly idle.
    """

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True, sampler=None,
                 num_workers: int = 0, prefetch_factor: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.sampler = sampler
        self.num_workers = num_workers
        self.prefetch_factor = max(1, prefetch_factor)
        self.epoch = 0

    def _num_indices(self):
        return len(self.sampler) if self.sampler is not None else len(self.dataset)

    def __len__(self):
        n = self._num_indices() // self.batch_size
        if not self.drop_last and self._num_indices() % self.batch_size:
            n += 1
        return n

    def _epoch_indices(self):
        if self.sampler is not None:
            if hasattr(self.sampler, "set_epoch"):
                self.sampler.set_epoch(self.epoch)
            idx = np.fromiter(iter(self.sampler), dtype=np.int64)
        else:
            idx = np.arange(len(self.dataset))
            if self.shuffle:
                rs = np.random.RandomState(self.seed + self.epoch)
                rs.shuffle(idx)
        self.epoch += 1
        return idx

    def _build(self, indices):
        return _stack_samples([self.dataset[int(i)] for i in indices])

    def __iter__(self):
        idx = self._epoch_indices()
        starts = range(0, len(idx) - (self.batch_size - 1 if self.drop_last else 0),
                       self.batch_size)
        slices = [idx[s:s + self.batch_size] for s in starts]
        if self.num_workers <= 0:
            for sl in slices:
                yield self._build(sl)
            return
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        depth = self.num_workers * self.prefetch_factor
        with ThreadPoolExecutor(self.num_workers) as pool:
            pending = deque()
            it = iter(slices)
            for sl in it:
                pending.append(pool.submit(self._build, sl))
                if len(pending) >= depth:
                    break
            while pending:
                batch = pending.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    pending.append(pool.submit(self._build, nxt))
                yield batch


def _stack_samples(samples):
    out = {}
    keys = samples[0].keys()
    for k in keys:
        v0 = samples[0][k]
        if isinstance(v0, (list, tuple)):
            out[k] = [np.stack([np.asarray(s[k][j]) for s in samples])
                      for j in range(len(v0))]
        elif isinstance(v0, np.ndarray) or np.isscalar(v0):
            out[k] = np.stack([np.asarray(s[k]) for s in samples])
        else:
            out[k] = [s[k] for s in samples]  # metadata passthrough
    return out


def prefetch_to_device(iterable, mesh, depth: int = 2, axis: str = "data",
                       host_check=None):
    """Overlap host batch building and host->device transfer with the step.

    Wraps a host batch iterator: pulls ``depth`` batches ahead, runs the
    optional ``host_check`` callback on the host values, and starts their
    ``shard_batch`` device placement immediately — so batch N+1 uploads
    while the jitted step for batch N runs.  The reference gets this overlap
    from torch DataLoader workers + CUDA async H2D; on TPU ``jax.device_put``
    is nominally asynchronous, but some transports (the remote-chip tunnel)
    make it block the caller, so the put itself runs on a dedicated transfer
    thread — the lookahead deque holds futures, not arrays (SURVEY.md §5.8
    "host-side prefetch pipeline feeding device buffers").
    """
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    from ..parallel.mesh import shard_batch

    def put(batch):
        return shard_batch(batch, mesh, axis=axis)

    def submit(pool, batch):
        # host_check runs on the CALLER thread (it is cheap host-side
        # validation): its exceptions surface immediately at the submit site
        # instead of later via future.result(), which would leave other
        # in-flight futures' exceptions unretrieved
        if host_check is not None:
            host_check(batch)
        return pool.submit(put, batch)

    # one worker = transfers start in submission order
    with ThreadPoolExecutor(1) as pool:
        buf = deque()
        it = iter(iterable)
        try:
            for batch in it:
                buf.append(submit(pool, batch))
                if len(buf) >= max(1, depth):
                    break
            while buf:
                ready = buf.popleft().result()
                nxt = next(it, None)
                if nxt is not None:
                    buf.append(submit(pool, nxt))
                yield ready
        finally:
            # abandoning the generator early: drop queued transfers so
            # pool.shutdown(wait=True) only waits for the one in flight
            for f in buf:
                f.cancel()


def build_dataloader(dataset, samples_per_gpu: int = 1, workers_per_gpu: int = 0,
                     num_gpus: int = 1, dist: bool = False, shuffle: bool = True,
                     seed: Optional[int] = None, **kwargs) -> NumpyLoader:
    """Signature-compatible front for the reference's build_dataloader
    (datasets/builder.py:84).  samples_per_gpu * num_gpus = global batch;
    workers_per_gpu sizes the loader's worker thread pool.
    Datasets that already yield batches (iterable, no __getitem__ — e.g. the
    LERF ray datamanager or push-style async datasets) pass through as-is."""
    if not hasattr(dataset, "__getitem__") and hasattr(dataset, "__iter__"):
        return dataset
    sampler = None
    if dist:
        # rank-local slice of the global index stream; group-aware when the
        # dataset carries aspect-group flags (builder.py:96-108 in reference)
        from .samplers import DistributedGroupSampler, DistributedSampler

        if shuffle and hasattr(dataset, "flag"):
            sampler = DistributedGroupSampler(
                dataset, samples_per_gpu, seed=seed or 0)
        else:
            sampler = DistributedSampler(dataset, shuffle=shuffle,
                                         seed=seed or 0)
    elif shuffle and hasattr(dataset, "flag"):
        from .samplers import GroupSampler

        sampler = GroupSampler(dataset, samples_per_gpu, seed=seed or 0)
    batch = samples_per_gpu * (1 if dist else num_gpus)
    return NumpyLoader(dataset, batch_size=batch,
                       shuffle=shuffle and sampler is None, seed=seed or 0,
                       sampler=sampler, num_workers=workers_per_gpu,
                       prefetch_factor=kwargs.get("prefetch_factor", 2))
