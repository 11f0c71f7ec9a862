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
    return DATASETS.build(dict(cfg), **(default_args or {}))


class NumpyLoader:
    """Batches a map-style dataset of dict samples into stacked numpy arrays."""

    def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
                 seed: int = 0, drop_last: bool = True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            rs = np.random.RandomState(self.seed + self.epoch)
            rs.shuffle(idx)
        self.epoch += 1
        for start in range(0, len(idx) - (self.batch_size - 1 if self.drop_last else 0),
                           self.batch_size):
            samples = [self.dataset[int(i)] for i in idx[start:start + self.batch_size]]
            yield _stack_samples(samples)


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


def build_dataloader(dataset, samples_per_gpu: int = 1, workers_per_gpu: int = 0,
                     num_gpus: int = 1, dist: bool = False, shuffle: bool = True,
                     seed: Optional[int] = None, **kwargs) -> NumpyLoader:
    """Signature-compatible front for the reference's build_dataloader
    (datasets/builder.py:84).  samples_per_gpu * num_gpus = global batch.
    Datasets that already yield batches (iterable, no __getitem__ — e.g. the
    LERF ray datamanager or push-style async datasets) pass through as-is."""
    if not hasattr(dataset, "__getitem__") and hasattr(dataset, "__iter__"):
        return dataset
    return NumpyLoader(dataset, batch_size=samples_per_gpu * num_gpus,
                       shuffle=shuffle, seed=seed or 0)
