"""Iteration-based training loop.

Parity: /root/reference/deep3dmap/runners/iter_based_runner.py:19 — runs a
fixed number of iterations with an endlessly-cycling loader.
"""
from __future__ import annotations

from .base_runner import BaseRunner
from .builder import RUNNERS


class IterLoader:
    """Endless iterator over a loader; counts epochs (parity:
    iter_based_runner.py:47 IterLoader).  ``wrap`` (e.g. the runner's
    device-prefetcher) re-wraps the loader at each epoch restart so batches
    keep streaming ahead across epoch boundaries."""

    def __init__(self, loader, wrap=None):
        self._loader = loader
        self._wrap = wrap if wrap is not None else (lambda l: l)
        self._iter = iter(self._wrap(loader))
        self._epoch = 0

    @property
    def epoch(self):
        return self._epoch

    def __len__(self):
        return len(self._loader)

    def __next__(self):
        try:
            return next(self._iter)
        except StopIteration:
            self._epoch += 1
            self._iter = iter(self._wrap(self._loader))
            return next(self._iter)


@RUNNERS.register_module()
class IterBasedRunner(BaseRunner):
    def run(self, data_loaders, workflow=(("train", -1),), max_iters=None, **kwargs):
        if max_iters is not None:
            self._max_iters = max_iters
        assert self._max_iters is not None, "max_iters must be set"
        if not isinstance(data_loaders, (list, tuple)):
            data_loaders = [data_loaders]
        iter_loaders = [IterLoader(dl, wrap=self.prefetch) for dl in data_loaders]

        self.call_hook("before_run")
        self.cur_loader = data_loaders[0]
        self.call_hook("before_train_epoch")
        while self.iter < self._max_iters:
            for i, (mode, iters) in enumerate(workflow):
                if mode == "train":
                    n = iters if iters > 0 else self._max_iters - self.iter
                    for _ in range(n):
                        if self.iter >= self._max_iters:
                            break
                        self.inner_iter = self.iter % max(len(iter_loaders[i]), 1)
                        self.epoch = iter_loaders[i].epoch
                        self.call_hook("before_train_iter")
                        self.run_iter(next(iter_loaders[i]))
                        self.call_hook("after_train_iter")
                        self.iter += 1
                elif mode == "val":
                    self.val(data_loaders[i])
        self.call_hook("after_train_epoch")
        self.call_hook("after_run")
