"""Pipeline composition (parity: /root/reference/deep3dmap/datasets/
pipelines/compose.py:14)."""
from __future__ import annotations

from ..builder import PIPELINES


@PIPELINES.register_module()
class Compose:
    def __init__(self, transforms):
        self.transforms = []
        for t in transforms:
            if isinstance(t, dict):
                self.transforms.append(PIPELINES.build(dict(t)))
            elif callable(t):
                self.transforms.append(t)
            else:
                raise TypeError(f"transform must be dict or callable, got {type(t)}")

    def __call__(self, data):
        for t in self.transforms:
            data = t(data)
            if data is None:
                return None
        return data

    def __repr__(self):
        return f"Compose({self.transforms})"
