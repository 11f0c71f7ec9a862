"""BaseRunner: the host-side orchestration loop around a jitted train step.

Capability parity with /root/reference/deep3dmap/runners/base_runner.py:28 —
hook registration with priorities, run/train/val/resume/save_checkpoint —
redesigned functionally: the model is a *framework* object exposing pure
functions, optimization state is a single TrainState pytree, and every hot
operation happens inside one ``jax.jit``-compiled step with donated state.

Framework contract (the TPU-native analogue of
models/frameworks/base.py:118-222 train_step/val_step):

    framework.init(rng, batch)            -> (params, model_state)
    framework.loss_fn(params, model_state, batch, rng)
        -> (loss, aux) with aux = {'log_vars': {...}, 'model_state': ...}
    framework.val_fn(params, model_state, batch)     [optional]
        -> {'log_vars': {...}, ...}
"""
from __future__ import annotations

import logging
import os
import os.path as osp
import time
from typing import Any, Callable, List, Optional

import jax
import numpy as np

from ..parallel.mesh import make_mesh, shard_batch, get_dist_info
from ..utils.log_buffer import LogBuffer
from ..utils.logging import get_root_logger
from .hooks import HOOKS, Hook, build_hook
from .optim import build_lr_schedule, build_optimizer
from .train_state import TrainState


class BaseRunner:
    def __init__(self, framework, runner_cfgs=None, work_dir: Optional[str] = None,
                 logger: Optional[logging.Logger] = None, mesh=None, seed: int = 0,
                 max_epochs: Optional[int] = None, max_iters: Optional[int] = None,
                 meta: Optional[dict] = None):
        runner_cfgs = dict(runner_cfgs or {})
        self.framework = framework
        self.work_dir = osp.abspath(work_dir) if work_dir else None
        if self.work_dir:
            os.makedirs(self.work_dir, exist_ok=True)
        rank, world = get_dist_info()
        self.rank, self.world_size = rank, world
        self.timestamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
        self.logger = logger or get_root_logger(
            log_file=osp.join(self.work_dir, f"{self.timestamp}.log") if self.work_dir else None,
            rank=rank)
        self.meta = meta or {}

        self._max_epochs = max_epochs if max_epochs is not None else runner_cfgs.get("max_epochs")
        self._max_iters = max_iters if max_iters is not None else runner_cfgs.get("max_iters")
        self.runner_cfgs = runner_cfgs

        self.mesh = mesh if mesh is not None else make_mesh()
        self.seed = seed
        self.log_buffer = LogBuffer()
        self._hooks: List[Hook] = []

        self.epoch = 0
        self.iter = 0
        self.inner_iter = 0
        self.mode = "train"
        self.cur_loader = None

        # populated by setup()
        self.state: Optional[TrainState] = None
        self.tx = None
        self.lr_schedule: Optional[Callable] = None
        self.base_lr: float = 0.0
        self.train_step_fn = None
        self.val_fn = getattr(framework, "val_fn", None)

    # -- properties --------------------------------------------------------
    @property
    def max_epochs(self):
        return self._max_epochs

    @property
    def max_iters(self):
        return self._max_iters

    def current_lr(self) -> float:
        if self.lr_schedule is not None and self.state is not None:
            return float(jax.device_get(self.lr_schedule(self.state.step)))
        return self.base_lr

    # -- hooks -------------------------------------------------------------
    def register_hook(self, hook: Hook, priority: Optional[int] = None):
        if priority is not None:
            hook.PRIORITY = priority
        # insert keeping ascending priority (lower = earlier)
        idx = len(self._hooks)
        for i, h in enumerate(self._hooks):
            if hook.PRIORITY < h.PRIORITY:
                idx = i
                break
        self._hooks.insert(idx, hook)

    def register_hook_from_cfg(self, cfg: dict):
        self.register_hook(build_hook(cfg))

    def call_hook(self, fn_name: str):
        for hook in self._hooks:
            getattr(hook, fn_name)(self)

    @property
    def hooks(self):
        return self._hooks

    def register_training_hooks(self, lr_config=None, optimizer_config=None,
                                checkpoint_config=None, log_config=None,
                                timer_config=None):
        """Parity: base_runner.py:490.  lr/optimizer configs are consumed at
        setup() time (schedules/clipping live in the optax chain); checkpoint,
        logger and timer configs become hooks here."""
        self.register_hook(build_hook(timer_config or dict(type="IterTimerHook")))
        if checkpoint_config:
            cfg = dict(checkpoint_config)
            cfg.setdefault("type", "CheckpointHook")
            self.register_hook(build_hook(cfg))
        if log_config:
            interval = log_config.get("interval", 50)
            for h in log_config.get("hooks", [dict(type="TextLoggerHook")]):
                h = dict(h)
                h.setdefault("interval", interval)
                self.register_hook(build_hook(h))

    # -- setup -------------------------------------------------------------
    def setup(self, sample_batch, optimizer: Optional[dict] = None,
              lr_config: Optional[dict] = None, optimizer_config: Optional[dict] = None,
              iters_per_epoch: int = 1):
        """Initialize params/optimizer and compile the train step."""
        optimizer = dict(optimizer or self.runner_cfgs.get("optimizer", dict(type="Adam", lr=1e-3)))
        self.base_lr = optimizer.get("lr", 1e-3)

        total_iters = (self._max_iters if self._max_iters is not None
                       else (self._max_epochs or 1) * iters_per_epoch)
        if lr_config:
            lr_cfg = dict(lr_config)
            policy = lr_cfg.pop("policy")
            self.lr_schedule = build_lr_schedule(
                policy, self.base_lr, total_iters, iters_per_epoch=iters_per_epoch, **lr_cfg)
        else:
            self.lr_schedule = None

        grad_clip = (optimizer_config or {}).get("grad_clip")
        paramwise_cfg = optimizer.pop("paramwise_cfg", None)
        accumulate = (optimizer_config or {}).get("cumulative_iters", 1)
        self.tx = build_optimizer(optimizer, lr_schedule=self.lr_schedule,
                                  grad_clip=grad_clip,
                                  accumulate_steps=accumulate,
                                  paramwise_cfg=paramwise_cfg)

        # §5.7: let the framework see the mesh BEFORE init — when cfg.mesh
        # declares a spatial axis (e.g. ("data","model")), NeuralRecon routes
        # its GRU fusion through the explicit halo cell over that axis
        spatial_on = False
        if hasattr(self.framework, "set_mesh"):
            spatial_on = bool(self.framework.set_mesh(self.mesh))

        rng = jax.random.PRNGKey(self.seed)
        rng, init_rng = jax.random.split(rng)
        batch = shard_batch(sample_batch, self.mesh)
        params, model_state = self.framework.init(init_rng, batch)
        self.state = TrainState.create(rng, params, self.tx, model_state)
        if (self.mesh.devices.size > 1 and jax.process_count() == 1):
            # place the state on the mesh: params/opt replicated, recurrent
            # global volumes batch-sharded over 'data' and — only when the
            # framework activated the §5.7 halo path — spatially sharded
            # over 'model' (volumes sharded without the halo boundary would
            # let the model axis repartition the rest of the graph).
            # Multi-process placement stays with the per-host flow in
            # parallel/mesh.shard_batch.
            from ..parallel.spatial import shard_train_state

            self.state = shard_train_state(
                self.state, self.mesh,
                axis="model" if spatial_on else None)

        n_params = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
        self.logger.info(f"Initialized {type(self.framework).__name__}: "
                         f"{n_params / 1e6:.2f}M params, mesh={self.mesh.shape}")

        self.train_step_fn = self._build_train_step()
        return self.state

    def _build_train_step(self):
        framework, tx = self.framework, self.tx

        def step(state: TrainState, batch):
            rng, sub = jax.random.split(state.rng)
            grad_fn = jax.value_and_grad(framework.loss_fn, has_aux=True)
            (loss, aux), grads = grad_fn(state.params, state.model_state, batch, sub)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            import optax
            params = optax.apply_updates(state.params, updates)
            new_state = state.replace(step=state.step + 1, params=params,
                                      opt_state=opt_state,
                                      model_state=aux.get("model_state", state.model_state),
                                      rng=rng)
            log_vars = dict(aux.get("log_vars", {}))
            log_vars["loss"] = loss
            return new_state, log_vars

        return jax.jit(step, donate_argnums=(0,))

    # -- loops (implemented by subclasses) ---------------------------------
    def run(self, data_loaders, workflow, **kwargs):
        raise NotImplementedError

    def _is_on_device(self, data_batch):
        leaves = jax.tree_util.tree_leaves(data_batch)
        return bool(leaves) and all(isinstance(l, jax.Array) for l in leaves)

    def prefetch(self, loader, depth: int = 2):
        """Device-prefetching view of a host loader: batch N+1's host build,
        host checks and async H2D upload overlap step N (SURVEY §5.8)."""
        from ..datasets.builder import prefetch_to_device

        return prefetch_to_device(
            loader, self.mesh, depth=depth,
            host_check=getattr(self.framework, "host_check_batch", None))

    def run_iter(self, data_batch):
        if self._is_on_device(data_batch):
            batch = data_batch  # arrived via prefetch(): checked + sharded
        else:
            check = getattr(self.framework, "host_check_batch", None)
            if check is not None:
                check(data_batch)
            batch = shard_batch(data_batch, self.mesh)
        self.state, log_vars = self.train_step_fn(self.state, batch)
        self.log_buffer.update({k: float(jax.device_get(v)) for k, v in log_vars.items()})
        return log_vars

    def val(self, data_loader=None):
        if self.val_fn is None:
            return
        loader = data_loader if data_loader is not None else getattr(self, "_val_loader", None)
        if loader is None:
            return
        self.mode = "val"
        self.call_hook("before_val_epoch")
        for i, data_batch in enumerate(loader):
            self.inner_iter = i
            self.call_hook("before_val_iter")
            batch = shard_batch(data_batch, self.mesh)
            out = self.val_fn(self.state.params, self.state.model_state, batch)
            log_vars = out.get("log_vars", out) if isinstance(out, dict) else {}
            self.log_buffer.update(
                {f"val_{k}": float(jax.device_get(v)) for k, v in log_vars.items()})
            self.call_hook("after_val_iter")
        self.call_hook("after_val_epoch")
        self.mode = "train"

    # -- checkpointing -----------------------------------------------------
    def save_checkpoint(self, out_dir=None, meta=None):
        from .checkpoint import save_checkpoint
        return save_checkpoint(out_dir or self.work_dir, self.state,
                               meta=dict(epoch=self.epoch + 1, iter=self.iter, **(meta or {})))

    def resume(self, checkpoint: Optional[str] = None):
        from .checkpoint import latest_checkpoint, load_checkpoint, load_meta
        path = checkpoint or latest_checkpoint(self.work_dir)
        if path is None:
            self.logger.info("No checkpoint found to resume from")
            return False
        assert self.state is not None, "call setup() before resume()"
        try:
            self.state = load_checkpoint(path, self.state)
        except ValueError as e:
            raise ValueError(
                f"Checkpoint at {path} does not match the current TrainState "
                f"structure. resume() requires reconstructing the runner with "
                f"the SAME model and optimizer config (including grad_clip / "
                f"lr schedule) used when the checkpoint was saved. "
                f"Original error: {e}") from e
        meta = load_meta(path)
        self.epoch = meta.get("epoch", 0)
        self.iter = meta.get("iter", int(jax.device_get(self.state.step)))
        self.logger.info(f"Resumed from {path} (epoch {self.epoch}, iter {self.iter})")
        return True
