"""Failure detection / elastic recovery (SURVEY §5.3) + determinism CI
check (§5.2): heartbeat hook, supervised restart-from-checkpoint, and the
run-twice bitwise-identical training check the reference lacks.
"""
import json
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from deep3dmap_tpu.parallel import make_mesh
from deep3dmap_tpu.runners import EpochBasedRunner

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


class ToyNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(nn.relu(nn.Dense(8)(x)))


class ToyFramework:
    def __init__(self):
        self.net = ToyNet()

    def init(self, rng, batch):
        return self.net.init(rng, batch["x"]), {}

    def loss_fn(self, params, model_state, batch, rng):
        loss = jnp.mean((self.net.apply(params, batch["x"]) - batch["y"]) ** 2)
        return loss, {"log_vars": {"mse": loss}, "model_state": model_state}


def _loader(n=4, bs=8, seed=0):
    rs = np.random.RandomState(seed)
    w = rs.randn(4, 1)
    return [{"x": rs.randn(bs, 4).astype(np.float32),
             "y": (rs.randn(bs, 4) @ w).astype(np.float32)}
            for _ in range(n)]


def _train(tmp_path, tag):
    mesh = make_mesh()
    loader = _loader()
    runner = EpochBasedRunner(ToyFramework(), work_dir=str(tmp_path / tag),
                              mesh=mesh, max_epochs=3)
    runner.setup(loader[0], optimizer=dict(type="Adam", lr=1e-2),
                 iters_per_epoch=len(loader))
    runner.register_training_hooks(log_config=dict(interval=100))
    runner.run([loader], [("train", 1)])
    return jax.device_get(runner.state.params)


def test_training_is_bitwise_deterministic(tmp_path):
    """Two identical runs produce bitwise-identical parameters — threaded
    PRNG keys + seeded loaders (the reference only toggled cudnn flags)."""
    p1 = _train(tmp_path, "a")
    p2 = _train(tmp_path, "b")
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b), p1, p2)


def test_heartbeat_hook_writes_beats(tmp_path):
    mesh = make_mesh()
    loader = _loader()
    runner = EpochBasedRunner(ToyFramework(), work_dir=str(tmp_path),
                              mesh=mesh, max_epochs=1)
    runner.setup(loader[0], optimizer=dict(type="Adam", lr=1e-2),
                 iters_per_epoch=len(loader))
    runner.register_training_hooks(log_config=dict(interval=100))
    hb = tmp_path / "hb.json"
    runner.register_hook_from_cfg(dict(type="HeartbeatHook", path=str(hb),
                                       interval=2))
    runner.run([loader], [("train", 1)])
    data = json.loads(hb.read_text())
    assert data["iter"] == 4 and data["epoch"] == 1
    assert data["time"] > 0


CRASH_CFG = '''
# toy config whose first attempt crashes mid-epoch (elastic restart test)
import os

from deep3dmap_tpu.runners.hooks import HOOKS, Hook
from deep3dmap_tpu.models.builder import RECONSTRUCTORS
from deep3dmap_tpu.datasets.builder import DATASETS
import flax.linen as nn
import jax.numpy as jnp
import numpy as np

MARKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "crashed_once")


if not HOOKS.get("CrashOnceHook"):
    @HOOKS.register_module()
    class CrashOnceHook(Hook):
        def after_train_iter(self, runner):
            if runner.iter >= 8 and not os.path.exists(MARKER):
                open(MARKER, "w").write("x")
                raise RuntimeError("injected crash (elastic test)")


if not RECONSTRUCTORS.get("ElasticToy"):
    class _Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(x)

    @RECONSTRUCTORS.register_module()
    class ElasticToy:
        def __init__(self, model_cfgs=None, train_cfg=None, test_cfg=None):
            self.net = _Net()

        def init(self, rng, batch):
            return self.net.init(rng, batch["x"]), {}

        def loss_fn(self, params, model_state, batch, rng):
            loss = jnp.mean((self.net.apply(params, batch["x"]) - batch["y"]) ** 2)
            return loss, {"log_vars": {"mse": loss}, "model_state": model_state}


if not DATASETS.get("ElasticToyData"):
    @DATASETS.register_module()
    class ElasticToyData:
        def __init__(self, n=6):
            rs = np.random.RandomState(0)
            self.items = [dict(x=rs.randn(4, 4).astype(np.float32),
                               y=rs.randn(4, 1).astype(np.float32))
                          for _ in range(n)]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i):
            return self.items[i]


data = dict(samples_per_gpu=1, train=dict(type="ElasticToyData"))
model = dict(type="ElasticToy", model_cfgs=dict())
checkpoint_config = dict(interval=1)
log_config = dict(interval=1)
custom_hooks = [dict(type="CrashOnceHook")]
workflow = [("train", 1)]
runner = dict(type="EpochBasedRunner",
              runner_cfgs=dict(optimizer=dict(type="Adam", lr=1e-2),
                               max_epochs=2))
'''


@pytest.mark.slow
def test_run_elastic_restarts_after_crash(tmp_path):
    cfg = tmp_path / "crash_cfg.py"
    cfg.write_text(CRASH_CFG)
    env = dict(os.environ)
    env["D3M_PLATFORM"] = "cpu"
    from deep3dmap_tpu.utils.misc import machine_cache_dir
    env["JAX_COMPILATION_CACHE_DIR"] = machine_cache_dir("/tmp/jax_test_cache")
    env.pop("XLA_FLAGS", None)
    hb = tmp_path / "hb.json"
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "run_elastic.py"),
         "--max-restarts", "2", "--stall-timeout", "300",
         "--poll", "0.5", "--backoff", "0.5",
         "--heartbeat-file", str(hb), "--",
         str(cfg), "--work-dir", str(tmp_path / "work"), "--no-validate"],
        capture_output=True, text=True, env=env, timeout=600, cwd=REPO)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert (tmp_path / "crashed_once").exists()
    assert "restart 1/2" in r.stdout
    log = (tmp_path / "work" / "train.log").read_text()
    assert "Resumed from" in log
    assert "Training finished" in log
    assert json.loads(hb.read_text())["epoch"] == 2
