"""2D image transforms (parity surface: /root/reference/deep3dmap/datasets/
pipelines/transforms.py — Resize/Normalize/Flip/Pad/Crop core family)."""
from __future__ import annotations

import numpy as np

from ..builder import PIPELINES


def _resize(img, size):
    import cv2

    return cv2.resize(img, size, interpolation=cv2.INTER_LINEAR)


@PIPELINES.register_module()
class Resize:
    def __init__(self, size, keys=("img",)):
        self.size = tuple(size)  # (w, h)
        self.keys = keys

    def __call__(self, data):
        for k in self.keys:
            data[k] = _resize(np.asarray(data[k]), self.size)
        return data


@PIPELINES.register_module()
class Normalize:
    def __init__(self, mean, std, keys=("img",), to_rgb: bool = False):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.keys = keys
        self.to_rgb = to_rgb

    def __call__(self, data):
        for k in self.keys:
            img = np.asarray(data[k], np.float32)
            if self.to_rgb:
                img = img[..., ::-1]
            data[k] = (img - self.mean) / self.std
        return data


@PIPELINES.register_module()
class RandomFlip:
    def __init__(self, prob: float = 0.5, keys=("img",), seed: int = 0):
        self.prob = prob
        self.keys = keys
        self.rs = np.random.RandomState(seed)

    def __call__(self, data):
        if self.rs.rand() < self.prob:
            for k in self.keys:
                data[k] = np.ascontiguousarray(np.asarray(data[k])[:, ::-1])
            data["flipped"] = True
        else:
            data["flipped"] = False
        return data


@PIPELINES.register_module()
class Pad:
    def __init__(self, size_divisor: int = 32, keys=("img",), value: float = 0.0):
        self.size_divisor = size_divisor
        self.keys = keys
        self.value = value

    def __call__(self, data):
        d = self.size_divisor
        for k in self.keys:
            img = np.asarray(data[k])
            H, W = img.shape[:2]
            ph = (d - H % d) % d
            pw = (d - W % d) % d
            pad = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
            data[k] = np.pad(img, pad, constant_values=self.value)
        return data


@PIPELINES.register_module()
class CenterCrop:
    def __init__(self, size, keys=("img",)):
        self.size = size  # (h, w)
        self.keys = keys

    def __call__(self, data):
        th, tw = self.size
        for k in self.keys:
            img = np.asarray(data[k])
            H, W = img.shape[:2]
            y0 = max((H - th) // 2, 0)
            x0 = max((W - tw) // 2, 0)
            data[k] = img[y0:y0 + th, x0:x0 + tw]
        return data
