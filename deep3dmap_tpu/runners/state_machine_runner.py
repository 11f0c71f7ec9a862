"""State-machine training loop: multi-state training with per-state
optimize sequences.

Parity: /root/reference/deep3dmap/runners/state_machine_runner.py:28 — state
sequencing by epoch steps (e.g. 'sup' -> 'sup_unsup', or GNeRF 'A' -> 'ABAB'
-> 'B'), and per-state multi-optimizer inner loops driven by
``framework.setup_optimize_sequences(state)`` / ``optseq2netnames``.

TPU-native redesign: each (state, opt_seq) pair maps to a separately jitted
step function whose optax masked transforms update only the sub-network named
by the sequence — the functional equivalent of per-network optimizer lists.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import optax

from ..parallel.mesh import shard_batch
from .base_runner import BaseRunner
from .builder import RUNNERS
from .train_state import TrainState


@RUNNERS.register_module()
class StateMachineRunner(BaseRunner):
    def __init__(self, *args, state_seq: Sequence[str] = ("default",),
                 state_steps: Sequence[int] = (0,), state_switch_by: str = "epoch",
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.state_seq = list(state_seq)
        self.state_steps = list(state_steps)
        self.state_switch_by = state_switch_by
        self.cur_state = self.state_seq[0]
        self._seq_step_fns: Dict[Tuple[str, str], callable] = {}

    # -- state switching (parity: state_machine_runner.py:73-93) -----------
    def state_switch(self):
        progress = self.epoch if self.state_switch_by == "epoch" else self.iter
        idx = 0
        for i, start in enumerate(self.state_steps):
            if progress >= start:
                idx = i
        new_state = self.state_seq[idx]
        if new_state != self.cur_state:
            self.logger.info(f"state switch: {self.cur_state} -> {new_state}")
            self.cur_state = new_state
            if hasattr(self.framework, "on_state_switch"):
                self.framework.on_state_switch(new_state)
            # the framework's loss_fn reads its state at trace time — re-jit
            if self.train_step_fn is not None:
                self.train_step_fn = self._build_train_step()
            self._seq_step_fns.clear()

    # -- multi-optimizer step construction ---------------------------------
    # The reference keeps a separate torch optimizer per sub-network
    # (state_machine_runner.py:62 init_optimizers).  The functional analogue:
    # opt_state is a dict keyed by the top-level param-collection names, and
    # each optimize sequence's jitted step runs tx.update only on its
    # selected sub-networks, passing the rest through untouched.
    def _get_seq_step(self, state_name: str, opt_seq: str):
        key = (state_name, opt_seq)
        if key in self._seq_step_fns:
            return self._seq_step_fns[key]

        framework, tx = self.framework, self.tx
        netnames = (framework.optseq2netnames(opt_seq)
                    if hasattr(framework, "optseq2netnames") else None)

        def step(train_state: TrainState, batch):
            rng, sub = jax.random.split(train_state.rng)

            def loss_for(params):
                return framework.loss_fn(params, train_state.model_state, batch, sub,
                                         state=state_name, opt_seq=opt_seq)

            (loss, aux), grads = jax.value_and_grad(loss_for, has_aux=True)(train_state.params)
            params = dict(train_state.params)
            opt_state = dict(train_state.opt_state)
            for name in (netnames if netnames is not None else params.keys()):
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
        self._seq_step_fns[key] = fn
        return fn

    def _build_train_step(self):
        """Single-optimizer path, but over the per-netname opt_state dict."""
        framework, tx = self.framework, self.tx

        def step(train_state: TrainState, batch):
            rng, sub = jax.random.split(train_state.rng)

            def loss_for(params):
                return framework.loss_fn(params, train_state.model_state, batch, sub)

            (loss, aux), grads = jax.value_and_grad(loss_for, has_aux=True)(train_state.params)
            params = dict(train_state.params)
            opt_state = dict(train_state.opt_state)
            for name in params:
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

        return jax.jit(step, donate_argnums=(0,))

    def setup(self, sample_batch, **kwargs):
        state = super().setup(sample_batch, **kwargs)
        assert isinstance(state.params, dict), \
            "StateMachineRunner frameworks must expose a dict of param collections"
        opt_state = {k: self.tx.init(v) for k, v in state.params.items()}
        self.state = state.replace(opt_state=opt_state)
        self.train_step_fn = self._build_train_step()
        self._seq_step_fns.clear()
        return self.state

    def run_multi_iter(self, data_batch):
        """Parity: state_machine_runner.py:115-132 — iterate optimize
        sequences for the current state within one data batch."""
        sequences = (self.framework.setup_optimize_sequences(self.cur_state)
                     if hasattr(self.framework, "setup_optimize_sequences") else [None])
        batch = shard_batch(data_batch, self.mesh)
        all_logs = {}
        for opt_seq in sequences:
            if opt_seq is None:
                self.state, log_vars = self.train_step_fn(self.state, batch)
            else:
                fn = self._get_seq_step(self.cur_state, opt_seq)
                self.state, log_vars = fn(self.state, batch)
            for k, v in log_vars.items():
                tag = k if opt_seq is None else f"{opt_seq}_{k}"
                all_logs[tag] = float(jax.device_get(v))
        self.log_buffer.update(all_logs)

    def train(self, data_loader):
        self.mode = "train"
        self.cur_loader = data_loader
        self.call_hook("before_train_epoch")
        multi = getattr(self.framework, "is_multi_opt_iters", False)
        for i, data_batch in enumerate(data_loader):
            self.inner_iter = i
            self.call_hook("before_train_iter")
            if multi:
                self.run_multi_iter(data_batch)
            else:
                self.run_iter(data_batch)
            self.call_hook("after_train_iter")
            self.iter += 1
        self.call_hook("after_train_epoch")
        self.epoch += 1

    def run(self, data_loaders, workflow=(("train", 1),), max_epochs=None, **kwargs):
        if max_epochs is not None:
            self._max_epochs = max_epochs
        assert self._max_epochs is not None
        if not isinstance(data_loaders, (list, tuple)):
            data_loaders = [data_loaders]
        self._max_iters = self._max_epochs * len(data_loaders[0])
        self.call_hook("before_run")
        while self.epoch < self._max_epochs:
            self.state_switch()
            for i, (mode, epochs) in enumerate(workflow):
                for _ in range(epochs):
                    if mode == "train":
                        if self.epoch >= self._max_epochs:
                            break
                        # pick the loader matching the current state if tagged
                        loader = data_loaders[i]
                        for dl in data_loaders:
                            if getattr(dl, "state", None) == self.cur_state:
                                loader = dl
                                break
                        self.train(loader)
                    elif mode == "val":
                        self.val(data_loaders[i])
        self.call_hook("after_run")
