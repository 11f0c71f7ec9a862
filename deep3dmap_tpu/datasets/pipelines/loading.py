"""Loading transforms (parity: /root/reference/deep3dmap/datasets/
pipelines/loading.py — LoadImageFromFile:192, LoadArrayUsingNp:55,
LoadMatDictUsingSio:123)."""
from __future__ import annotations

import os.path as osp

import numpy as np

from ..builder import PIPELINES


@PIPELINES.register_module()
class LoadImageFromFile:
    def __init__(self, key: str = "img", path_key: str = "img_path",
                 to_float32: bool = False, color_order: str = "bgr"):
        self.key = key
        self.path_key = path_key
        self.to_float32 = to_float32
        self.color_order = color_order

    def __call__(self, data):
        import cv2

        img = cv2.imread(data[self.path_key], cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(data[self.path_key])
        if self.color_order == "rgb":
            img = img[..., ::-1]
        if self.to_float32:
            img = img.astype(np.float32)
        data[self.key] = img
        data[f"{self.key}_shape"] = img.shape
        return data


@PIPELINES.register_module()
class LoadArrayUsingNp:
    def __init__(self, key: str = "arr", path_key: str = "arr_path",
                 allow_pickle: bool = False):
        self.key = key
        self.path_key = path_key
        self.allow_pickle = allow_pickle

    def __call__(self, data):
        data[self.key] = np.load(data[self.path_key], allow_pickle=self.allow_pickle)
        return data


@PIPELINES.register_module()
class LoadMatDictUsingSio:
    def __init__(self, key: str = "mat", path_key: str = "mat_path",
                 fields=None):
        self.key = key
        self.path_key = path_key
        self.fields = fields

    def __call__(self, data):
        import scipy.io as sio

        mat = sio.loadmat(data[self.path_key])
        if self.fields:
            mat = {f: mat[f] for f in self.fields}
        data[self.key] = mat
        return data
