"""Additional hooks: EMA, profiler, samplers, buffers, logger backends.

Parity: /root/reference/deep3dmap/runners/hooks/{ema.py:7, profiler.py:12,
sampler_seed.py, sync_buffer.py, memory.py:8} and hooks/logger/
{tensorboard,wandb}.py — re-expressed for the functional runner.
"""
from __future__ import annotations

import os.path as osp
from typing import Optional

import jax
import numpy as np

from .hooks import HOOKS, Hook


@HOOKS.register_module()
class EMAHook(Hook):
    """Exponential moving average of params (hooks/ema.py:7).  The EMA tree
    lives on the runner (``runner.ema_params``) and is updated with a jitted
    step; swap in for eval with ``apply_ema``/``restore``."""

    PRIORITY = 40

    def __init__(self, momentum: float = 0.0002, interval: int = 1,
                 warm_up: int = 100):
        self.momentum = momentum
        self.interval = interval
        self.warm_up = warm_up
        self._update = None
        self._backup = None

    def before_run(self, runner):
        # deep copy: the train step donates state buffers, so aliasing the
        # live params would leave the EMA pointing at deleted arrays
        runner.ema_params = jax.tree_util.tree_map(lambda x: x.copy(),
                                                   runner.state.params)

        @jax.jit
        def update(ema, params, momentum):
            return jax.tree_util.tree_map(
                lambda e, p: (1.0 - momentum) * e + momentum * p, ema, params)

        self._update = update

    def after_train_iter(self, runner):
        if (runner.iter + 1) % self.interval:
            return
        # reference ema.py ramps momentum during warmup
        m = min(self.momentum, (1 + runner.iter) / (self.warm_up + runner.iter))
        runner.ema_params = self._update(runner.ema_params, runner.state.params, m)

    def apply_ema(self, runner):
        self._backup = runner.state.params
        runner.state = runner.state.replace(params=runner.ema_params)

    def restore(self, runner):
        if self._backup is not None:
            runner.state = runner.state.replace(params=self._backup)
            self._backup = None

    def before_val_epoch(self, runner):
        self.apply_ema(runner)

    def after_val_epoch(self, runner):
        self.restore(runner)


@HOOKS.register_module()
class ProfilerHook(Hook):
    """jax.profiler trace over an iteration window (hooks/profiler.py:12);
    view with TensorBoard or Perfetto."""

    def __init__(self, start_iter: int = 2, n_iters: int = 3,
                 out_dir: Optional[str] = None):
        self.start_iter = start_iter
        self.n_iters = n_iters
        self.out_dir = out_dir
        self._active = False

    def before_train_iter(self, runner):
        if runner.iter == self.start_iter and not self._active:
            out = self.out_dir or osp.join(runner.work_dir or ".", "profile")
            jax.profiler.start_trace(out)
            self._active = True

    def after_train_iter(self, runner):
        if self._active and runner.iter >= self.start_iter + self.n_iters - 1:
            jax.profiler.stop_trace()
            self._active = False
            runner.logger.info(f"Profiler trace written "
                               f"({self.start_iter}..{runner.iter})")

    def after_run(self, runner):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False


@HOOKS.register_module()
class DistSamplerSeedHook(Hook):
    """Reseed shuffling loaders per epoch (hooks/sampler_seed.py)."""

    def before_train_epoch(self, runner):
        loader = runner.cur_loader
        if loader is not None and hasattr(loader, "epoch"):
            loader.epoch = runner.epoch


@HOOKS.register_module()
class SyncBuffersHook(Hook):
    """No-op on TPU: there are no unsynced module buffers — params and
    recurrent state live in the (replicated/sharded) TrainState."""


@HOOKS.register_module()
class EmptyCacheHook(Hook):
    """Best-effort freeing of dead device buffers (hooks/memory.py:8)."""

    def __init__(self, after_epoch: bool = True):
        self.after_epoch = after_epoch

    def after_train_epoch(self, runner):
        if self.after_epoch:
            import gc

            gc.collect()


@HOOKS.register_module()
class TensorboardLoggerHook(Hook):
    """Scalars to TensorBoard via flax.metrics (hooks/logger/tensorboard.py);
    silently degrades if the writer is unavailable."""

    PRIORITY = 90

    def __init__(self, interval: int = 50, log_dir: Optional[str] = None):
        self.interval = interval
        self.log_dir = log_dir
        self.writer = None

    def before_run(self, runner):
        try:
            from flax.metrics import tensorboard

            self.writer = tensorboard.SummaryWriter(
                self.log_dir or osp.join(runner.work_dir or ".", "tb"))
        except Exception as e:  # missing backend
            runner.logger.warning(f"TensorboardLoggerHook disabled: {e}")

    def after_train_iter(self, runner):
        if self.writer is None or not self.every_n_iters(runner, self.interval):
            return
        runner.log_buffer.average(self.interval)
        for k, v in runner.log_buffer.output.items():
            self.writer.scalar(f"train/{k}", v, runner.iter + 1)

    def after_run(self, runner):
        if self.writer is not None:
            self.writer.flush()


@HOOKS.register_module()
class WandbLoggerHook(Hook):
    """W&B scalars (hooks/logger/wandb.py); gated on the package."""

    PRIORITY = 90

    def __init__(self, interval: int = 50, init_kwargs: Optional[dict] = None):
        self.interval = interval
        self.init_kwargs = init_kwargs or {}
        self.run = None

    def before_run(self, runner):
        try:
            import wandb

            self.run = wandb.init(**self.init_kwargs)
        except Exception as e:
            runner.logger.warning(f"WandbLoggerHook disabled: {e}")

    def after_train_iter(self, runner):
        if self.run is None or not self.every_n_iters(runner, self.interval):
            return
        runner.log_buffer.average(self.interval)
        self.run.log(dict(runner.log_buffer.output), step=runner.iter + 1)


@HOOKS.register_module()
class EarlyStoppingHook(Hook):
    """Stop training when a monitored metric stops improving.

    Parity: /root/reference/deep3dmap/engines/hooks/early_stopping_hook.py:159.
    """

    PRIORITY = 75

    def __init__(self, monitor: str = "loss", rule: str = "less",
                 patience: int = 5, min_delta: float = 0.0):
        assert rule in ("less", "greater")
        self.monitor = monitor
        self.rule = rule
        self.patience = patience
        self.min_delta = min_delta
        self.best = None
        self.wait = 0

    def _improved(self, value):
        if self.best is None:
            return True
        if self.rule == "less":
            return value < self.best - self.min_delta
        return value > self.best + self.min_delta

    def after_train_epoch(self, runner):
        runner.log_buffer.average()
        value = runner.log_buffer.output.get(self.monitor)
        if value is None:
            return
        if self._improved(value):
            self.best = value
            self.wait = 0
        else:
            self.wait += 1
            if self.wait >= self.patience:
                runner.logger.info(
                    f"EarlyStopping: {self.monitor} did not improve for "
                    f"{self.patience} epochs (best={self.best:.5f})")
                runner._max_epochs = runner.epoch  # stop the loop


@HOOKS.register_module()
class OptimizerHook(Hook):
    """Config-compat shim for the reference's OptimizerHook
    (/root/reference/deep3dmap/runners/hooks/optimizer.py:21).

    In this framework backward + clip + step happen INSIDE the jitted train
    step (gradient clipping is an optax transform built from
    optimizer_config.grad_clip at runner.setup, base_runner.py).  The hook
    exists so reference configs with ``optimizer_config=dict(
    type='OptimizerHook', grad_clip=...)`` build unchanged; it validates the
    runner was set up with the same clipping."""

    def __init__(self, grad_clip=None, **kwargs):
        self.grad_clip = grad_clip

    def before_run(self, runner):
        if self.grad_clip and getattr(runner, "tx", None) is None:
            runner.logger.warning(
                "OptimizerHook.grad_clip set but runner.setup() has not "
                "built the optimizer yet; pass optimizer_config to setup()")


@HOOKS.register_module()
class MultiOptimizerHook(OptimizerHook):
    """Config-compat shim for MultiOptimizerHook (optimizer.py:44): the
    per-sequence optimizers of the StateMachineRunner each clip/step inside
    their own jitted step functions."""


@HOOKS.register_module()
class GradientCumulativeOptimizerHook(OptimizerHook):
    """Config-compat shim (optimizer.py:69): accumulation is an
    optax.MultiSteps wrapper built from optimizer_config.cumulative_iters."""

    def __init__(self, cumulative_iters=1, **kwargs):
        super().__init__(**kwargs)
        self.cumulative_iters = cumulative_iters


class _ScalarLoggerHook(Hook):
    """Shared scaffolding for external experiment trackers: average the
    LogBuffer every ``interval`` iters and hand the scalar dict to
    ``_log_scalars``; disabled (with a warning) when the client package is
    missing (parity: hooks/logger/{mlflow,neptune,pavi,dvclive}.py)."""

    PRIORITY = 90

    def __init__(self, interval: int = 50):
        self.interval = interval
        self._ok = False

    def _setup(self, runner):  # -> None, sets self._ok
        raise NotImplementedError

    def _log_scalars(self, scalars: dict, step: int):
        raise NotImplementedError

    def before_run(self, runner):
        try:
            self._setup(runner)
            self._ok = True
        except Exception as e:
            runner.logger.warning(f"{type(self).__name__} disabled: {e}")

    def after_train_iter(self, runner):
        if not self._ok or not self.every_n_iters(runner, self.interval):
            return
        runner.log_buffer.average(self.interval)
        scalars = {k: float(v) for k, v in runner.log_buffer.output.items()
                   if np.isscalar(v) or getattr(v, "ndim", 1) == 0}
        if scalars:
            self._log_scalars(scalars, runner.iter + 1)


@HOOKS.register_module()
class MlflowLoggerHook(_ScalarLoggerHook):
    """MLflow tracker (hooks/logger/mlflow.py); gated on ``mlflow``."""

    def __init__(self, exp_name: Optional[str] = None, tags=None,
                 interval: int = 50, **kwargs):
        super().__init__(interval)
        self.exp_name = exp_name
        self.tags = tags

    def _setup(self, runner):
        import mlflow

        self._mlflow = mlflow
        if self.exp_name:
            mlflow.set_experiment(self.exp_name)
        if self.tags:
            mlflow.set_tags(self.tags)

    def _log_scalars(self, scalars, step):
        self._mlflow.log_metrics(scalars, step=step)


@HOOKS.register_module()
class NeptuneLoggerHook(_ScalarLoggerHook):
    """Neptune tracker (hooks/logger/neptune.py); gated on ``neptune``."""

    def __init__(self, init_kwargs: Optional[dict] = None, interval: int = 50,
                 **kwargs):
        super().__init__(interval)
        self.init_kwargs = init_kwargs or {}

    def _setup(self, runner):
        import neptune

        self._run = neptune.init_run(**self.init_kwargs)

    def _log_scalars(self, scalars, step):
        for k, v in scalars.items():
            self._run[k].append(v, step=step)

    def after_run(self, runner):
        if self._ok:
            self._run.stop()


@HOOKS.register_module()
class PaviLoggerHook(_ScalarLoggerHook):
    """PAVI tracker (hooks/logger/pavi.py); gated on ``pavi``."""

    def __init__(self, init_kwargs: Optional[dict] = None, interval: int = 50,
                 **kwargs):
        super().__init__(interval)
        self.init_kwargs = init_kwargs or {}

    def _setup(self, runner):
        from pavi import SummaryWriter

        self._writer = SummaryWriter(**self.init_kwargs)

    def _log_scalars(self, scalars, step):
        self._writer.add_scalars("train", scalars, step)


@HOOKS.register_module()
class DvcliveLoggerHook(_ScalarLoggerHook):
    """DVCLive tracker (hooks/logger/dvclive.py); gated on ``dvclive``."""

    def __init__(self, model_file: Optional[str] = None, interval: int = 50,
                 **kwargs):
        super().__init__(interval)
        self.model_file = model_file

    def _setup(self, runner):
        from dvclive import Live

        self._live = Live()

    def _log_scalars(self, scalars, step):
        self._live.step = step
        for k, v in scalars.items():
            self._live.log_metric(k, v)


@HOOKS.register_module()
class HeartbeatHook(Hook):
    """Liveness beacon for the elastic supervisor (tools/run_elastic.py).

    Writes ``{"time", "iter", "epoch"}`` to a small json file every
    ``interval`` iterations and at epoch boundaries.  SURVEY §5.3: the
    reference has no failure detection at all (time.sleep workarounds only);
    this is the thin heartbeat half — the restart half is the supervisor,
    which watches this file's mtime and restarts a stalled/crashed trainer
    from the latest checkpoint (--resume-from auto).
    """

    PRIORITY = 10

    def __init__(self, path: str, interval: int = 10):
        self.path = path
        self.interval = int(interval)

    def _beat(self, runner):
        import json
        import os
        import time as _t

        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"time": _t.time(), "iter": int(runner.iter),
                       "epoch": int(runner.epoch)}, f)
        os.replace(tmp, self.path)  # atomic: the watcher never reads a torn file

    def before_run(self, runner):
        self._beat(runner)

    def after_train_iter(self, runner):
        if (runner.iter + 1) % self.interval == 0:
            self._beat(runner)

    def after_train_epoch(self, runner):
        self._beat(runner)

    def after_run(self, runner):
        self._beat(runner)
