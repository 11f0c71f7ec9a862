"""Formatting transforms (parity: /root/reference/deep3dmap/datasets/
pipelines/formating.py:38-409 — the DataContainer machinery disappears;
batches stay numpy pytrees that shard via NamedSharding)."""
from __future__ import annotations

import numpy as np

from ..builder import PIPELINES


@PIPELINES.register_module()
class ToFloat32:
    def __init__(self, keys):
        self.keys = keys

    def __call__(self, data):
        for k in self.keys:
            v = data[k]
            if isinstance(v, (list, tuple)):
                data[k] = [np.asarray(x, np.float32) for x in v]
            else:
                data[k] = np.asarray(v, np.float32)
        return data


@PIPELINES.register_module()
class ImageToArray:
    """HWC uint8 image(s) -> float32 arrays (optionally scaled to [0,1])."""

    def __init__(self, keys=("img",), scale: bool = True):
        self.keys = keys
        self.scale = scale

    def __call__(self, data):
        for k in self.keys:
            v = np.asarray(data[k], np.float32)
            if self.scale:
                v = v / 255.0
            data[k] = v
        return data


@PIPELINES.register_module()
class Collect:
    """Keep only ``keys``; metadata keys are passed through unstacked
    (parity: formating.py Collect)."""

    def __init__(self, keys, meta_keys=()):
        self.keys = keys
        self.meta_keys = meta_keys

    def __call__(self, data):
        out = {k: data[k] for k in self.keys}
        for k in self.meta_keys:
            if k in data:
                out[k] = data[k]
        return out
