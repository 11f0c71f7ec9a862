"""Scalar accumulation buffer for training logs.

Parity: /root/reference/deep3dmap/runners/log_buffer.py — accumulates
(value, count) pairs per key and averages over a window.
"""
from __future__ import annotations

from collections import OrderedDict

import numpy as np


class LogBuffer:
    def __init__(self):
        self.val_history: OrderedDict = OrderedDict()
        self.n_history: OrderedDict = OrderedDict()
        self.output: OrderedDict = OrderedDict()
        self.ready = False

    def clear(self):
        self.val_history.clear()
        self.n_history.clear()
        self.clear_output()

    def clear_output(self):
        self.output.clear()
        self.ready = False

    def update(self, vars: dict, count: int = 1):
        if not isinstance(vars, dict):
            raise TypeError(f"vars must be a dict, got {type(vars)}")
        for key, var in vars.items():
            self.val_history.setdefault(key, []).append(float(var))
            self.n_history.setdefault(key, []).append(count)

    def average(self, n: int = 0):
        """Average the latest ``n`` values (0 = all)."""
        assert n >= 0
        for key in self.val_history:
            values = np.array(self.val_history[key][-n:] if n else self.val_history[key])
            nums = np.array(self.n_history[key][-n:] if n else self.n_history[key])
            self.output[key] = float((values * nums).sum() / max(nums.sum(), 1))
        self.ready = True
