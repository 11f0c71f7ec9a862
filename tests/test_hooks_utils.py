"""Extra hooks, analysis, weight init, visualization, parsing nets."""
import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from deep3dmap_tpu.parallel import make_mesh
from deep3dmap_tpu.runners import EpochBasedRunner
from deep3dmap_tpu.runners.hooks_extra import (
    DistSamplerSeedHook,
    EMAHook,
    EmptyCacheHook,
    SyncBuffersHook,
    TensorboardLoggerHook,
)
from deep3dmap_tpu.utils.analysis import count_params, get_model_complexity_info
from deep3dmap_tpu.utils.weight_init import apply_init_cfg, build_initializer


class ToyNet(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.Dense(1)(nn.relu(nn.Dense(8)(x)))


class ToyFramework:
    net = ToyNet()

    def init(self, rng, batch):
        return self.net.init(rng, batch["x"]), {}

    def loss_fn(self, params, mstate, batch, rng):
        loss = jnp.mean((self.net.apply(params, batch["x"]) - batch["y"]) ** 2)
        return loss, {"log_vars": {}, "model_state": mstate}


def _loader():
    rs = np.random.RandomState(0)
    return [{"x": rs.randn(8, 4).astype(np.float32),
             "y": rs.randn(8, 1).astype(np.float32)} for _ in range(4)]


def test_ema_hook_tracks_params(tmp_path):
    loader = _loader()
    runner = EpochBasedRunner(ToyFramework(), work_dir=str(tmp_path),
                              mesh=make_mesh(), max_epochs=2)
    runner.setup(loader[0], optimizer=dict(type="SGD", lr=0.5),
                 iters_per_epoch=len(loader))
    runner.register_hook(EMAHook(momentum=0.5, warm_up=1))
    runner.register_hook(DistSamplerSeedHook())
    runner.register_hook(SyncBuffersHook())
    runner.register_hook(EmptyCacheHook())
    runner.run([loader], [("train", 1)])
    assert hasattr(runner, "ema_params")
    # EMA differs from live params but lives in the same structure
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()),
                               runner.ema_params, runner.state.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_tensorboard_hook(tmp_path):
    loader = _loader()
    runner = EpochBasedRunner(ToyFramework(), work_dir=str(tmp_path),
                              mesh=make_mesh(), max_epochs=1)
    runner.setup(loader[0], optimizer=dict(type="Adam", lr=1e-2),
                 iters_per_epoch=len(loader))
    runner.register_hook(TensorboardLoggerHook(interval=1,
                                               log_dir=str(tmp_path / "tb")))
    runner.run([loader], [("train", 1)])
    # either wrote events or degraded gracefully
    assert runner.epoch == 1


def test_complexity_info():
    net = ToyNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))
    info = get_model_complexity_info(lambda p, x: net.apply(p, x), params,
                                     jnp.zeros((2, 4)))
    assert info["flops"] > 0
    assert info["params"] == count_params(params) > 0


def test_weight_init():
    init = build_initializer(dict(type="Constant", val=3.0))
    w = init(jax.random.PRNGKey(0), (2, 2), jnp.float32)
    np.testing.assert_allclose(np.asarray(w), 3.0)

    net = ToyNet()
    params = net.init(jax.random.PRNGKey(0), jnp.zeros((2, 4)))
    newp = apply_init_cfg(params, dict(type="Constant", val=0.0,
                                       layer_pattern="kernel"),
                          jax.random.PRNGKey(1))
    k = jax.tree_util.tree_flatten_with_path(newp)[0]
    for path, leaf in k:
        pstr = "/".join(str(getattr(p, "key", p)) for p in path)
        if "kernel" in pstr:
            np.testing.assert_allclose(np.asarray(leaf), 0.0)


def test_visualization(tmp_path):
    from deep3dmap_tpu.core.visualize import plot_camera_scene, save_mesh_preview

    poses = [np.eye(4) for _ in range(3)]
    p = plot_camera_scene(poses, save_path=str(tmp_path / "cams.png"))
    assert osp.exists(p)

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2]], np.int64)
    p2 = save_mesh_preview(verts, faces, str(tmp_path / "mesh.png"), size=64)
    assert osp.exists(p2)


@pytest.mark.parametrize("net_cfg,shape", [
    (dict(name="BiSeNet", n_classes=19), (1, 64, 64, 19)),
    (dict(name="PSPNet", n_classes=21), (1, 64, 64, 21)),
])
def test_parsing_nets(net_cfg, shape):
    from deep3dmap_tpu.models.parsing import BiSeNet, PSPNet

    cls = {"BiSeNet": BiSeNet, "PSPNet": PSPNet}[net_cfg.pop("name")]
    net = cls(base=8, **net_cfg)
    x = jnp.zeros((1, 64, 64, 3))
    p = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(p, x)
    assert y.shape == shape
