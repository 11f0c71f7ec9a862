"""Gan2ShapeRunner: per-instance 3-phase × multi-stage fitting loop.

Parity: /root/reference/deep3dmap/runners/gan2shape_runner.py:29-361 — each
epoch fits one image instance (per process in the reference; per mesh-batch
element here): stages of step1 (photometric) -> collect canon ->
step2 (latent projection, collecting projected samples) -> step3 (joint
refinement sampling that pool); per-mode optimizer groups
(init_optimizers:77-91: step1/3 train the shape heads, step2 the encoder);
optional weight reset between instances (gan2shape_runner.py:148-156).
"""
from __future__ import annotations

import copy
from typing import Dict, List, Optional

import jax
import numpy as np
import optax

from ..parallel.mesh import shard_batch
from .base_runner import BaseRunner
from .builder import RUNNERS
from .train_state import TrainState

MODE_NETS = {
    "step1": ["depth_head", "albedo_head", "view_head", "light_head"],
    "step2": ["encoder_head"],
    "step3": ["depth_head", "albedo_head", "view_head", "light_head"],
}


@RUNNERS.register_module()
class Gan2ShapeRunner(BaseRunner):
    def __init__(self, *args, stage_iters=(20, 20, 20), num_stage: int = 2,
                 reset_weight: bool = True, **kwargs):
        super().__init__(*args, **kwargs)
        self.stage_iters = dict(zip(("step1", "step2", "step3"), stage_iters))
        self.num_stage = num_stage
        self.reset_weight = reset_weight
        self._mode_steps: Dict[str, callable] = {}
        self._init_params = None

    def setup(self, sample_batch, **kwargs):
        state = super().setup(sample_batch, **kwargs)
        opt_state = {k: self.tx.init(v) for k, v in state.params.items()}
        self.state = state.replace(opt_state=opt_state)
        self._init_params = jax.device_get(self.state.params)
        self._mode_steps.clear()
        return self.state

    def _get_mode_step(self, mode: str):
        if mode in self._mode_steps:
            return self._mode_steps[mode]
        framework, tx = self.framework, self.tx
        netnames = MODE_NETS[mode]

        def step(train_state: TrainState, batch):
            rng, sub = jax.random.split(train_state.rng)

            def loss_for(params):
                return framework.loss_fn(params, train_state.model_state, batch,
                                         sub, mode=mode)

            (loss, aux), grads = jax.value_and_grad(loss_for, has_aux=True)(train_state.params)
            params = dict(train_state.params)
            opt_state = dict(train_state.opt_state)
            for name in netnames:
                updates, opt_state[name] = tx.update(grads[name], opt_state[name],
                                                     params[name])
                params[name] = optax.apply_updates(params[name], updates)
            new = train_state.replace(step=train_state.step + 1, params=params,
                                      opt_state=opt_state,
                                      model_state=aux.get("model_state", train_state.model_state),
                                      rng=rng)
            log_vars = dict(aux.get("log_vars", {}))
            log_vars["loss"] = loss
            return new, log_vars

        fn = jax.jit(step, donate_argnums=(0,))
        self._mode_steps[mode] = fn
        return fn

    def _collect_canon(self, batch):
        """Run step1 forward to snapshot the canonical estimate."""
        out, _ = self.framework.forward_test(self.state.params,
                                             self.state.model_state, batch)
        light = self.framework.light_head.apply(
            {"params": self.state.params["light_head"]}, batch["input_im"])
        return {k: np.asarray(jax.device_get(v))
                for k, v in dict(depth=out["depth"], albedo=out["albedo"],
                                 normal=out["normal"], light=light).items()}

    def fit_instance(self, batch):
        """One instance through all stages (gan2shape_runner.py:158-191)."""
        if self.reset_weight and self._init_params is not None:
            self.state = self.state.replace(
                params=jax.device_put(copy.deepcopy(self._init_params)))

        dev_batch = shard_batch(batch, self.mesh)
        for stage in range(self.num_stage):
            # --- step1 ---
            fn = self._get_mode_step("step1")
            for _ in range(self.stage_iters["step1"]):
                self.state, log = fn(self.state, dev_batch)
                self.log_buffer.update({f"s1_{k}": float(jax.device_get(v))
                                        for k, v in log.items()})
            canon = self._collect_canon(dev_batch)

            # --- step2: latent projection, collect projected samples ---
            fn = self._get_mode_step("step2")
            proj_pool, mask_pool = [], []
            step2_batch = shard_batch({**batch, **canon}, self.mesh)
            for _ in range(self.stage_iters["step2"]):
                self.state, log = fn(self.state, step2_batch)
                self.log_buffer.update({f"s2_{k}": float(jax.device_get(v))
                                        for k, v in log.items()})
            # collect the projected-sample pool (step2_collect,
            # gan2shape.py:588-618) with extra no-grad forwards
            for i in range(max(self.stage_iters["step2"] // 4, 1)):
                _, _, outs = self.framework.forward_step2(
                    self.state.params, self.state.model_state, step2_batch,
                    jax.random.PRNGKey(1000 + i))
                proj_pool.append(np.asarray(jax.device_get(outs["proj_im"])))
                mask_pool.append(np.asarray(jax.device_get(outs["mask"])))
            proj_pool = np.concatenate(proj_pool, 0)
            mask_pool = np.concatenate(mask_pool, 0)

            # --- step3: joint refinement sampling the pool ---
            fn = self._get_mode_step("step3")
            rs = np.random.RandomState(stage)
            for _ in range(self.stage_iters["step3"]):
                idx = rs.choice(len(proj_pool), self.framework.batchsize,
                                replace=len(proj_pool) < self.framework.batchsize)
                b3 = {**batch, "proj_im": proj_pool[idx], "proj_mask": mask_pool[idx]}
                self.state, log = fn(self.state, shard_batch(b3, self.mesh))
                self.log_buffer.update({f"s3_{k}": float(jax.device_get(v))
                                        for k, v in log.items()})
        return self.state

    def train(self, dataset):
        """One epoch = one instance per mesh data-shard
        (gan2shape_runner.py:106-116 independent-instance mode)."""
        self.mode = "train"
        self.call_hook("before_train_epoch")
        batch = dataset.setup_input(self.epoch) if hasattr(dataset, "setup_input") \
            else dataset[self.epoch % len(dataset)]
        if isinstance(batch, dict) and batch["input_im"].ndim == 3:
            batch = {k: np.asarray(v)[None] for k, v in batch.items()}
        model = getattr(self, "framework", None)
        if (model is not None and getattr(model, "use_mask", False)
                and "input_mask" not in batch):
            # derive the instance's region mask once via the parsing model
            # (gan2shape.py setup uses parse_mask per instance)
            batch["input_mask"] = np.asarray(model.parse_mask(batch["input_im"]))
        self.call_hook("before_train_iter")
        self.fit_instance(batch)
        self.call_hook("after_train_iter")
        self.iter += 1
        self.call_hook("after_train_epoch")
        self.epoch += 1

    def run(self, datasets, workflow=(("train", 1),), max_epochs=None, **kwargs):
        if max_epochs is not None:
            self._max_epochs = max_epochs
        assert self._max_epochs is not None
        dataset = datasets[0] if isinstance(datasets, (list, tuple)) else datasets
        if hasattr(dataset, "dataset"):  # unwrap a NumpyLoader from the CLI
            dataset = dataset.dataset
        self._max_iters = self._max_epochs
        self.call_hook("before_run")
        while self.epoch < self._max_epochs:
            self.train(dataset)
        self.call_hook("after_run")
