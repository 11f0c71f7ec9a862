"""MessageHub, evaluator, inferencer, fileio, early stopping, grad accum."""
import numpy as np
import pytest

import jax.numpy as jnp

from deep3dmap_tpu.core.evaluation.evaluator import DepthMetric, Evaluator
from deep3dmap_tpu.runners.optim import build_optimizer
from deep3dmap_tpu.utils.fileio import dump, load
from deep3dmap_tpu.utils.message_hub import HistoryBuffer, MessageHub


def test_history_buffer_stats():
    hb = HistoryBuffer()
    for v in (1.0, 2.0, 3.0, 4.0):
        hb.update(v)
    assert hb.current() == 4.0
    assert hb.mean() == 2.5
    assert hb.mean(window_size=2) == 3.5
    assert hb.max() == 4.0 and hb.min() == 1.0


def test_message_hub():
    hub = MessageHub.get_instance("test")
    hub.update_scalars({"loss": 1.0, "acc": 0.5})
    hub.update_scalar("loss", 0.5)
    assert hub.get_scalar("loss").mean() == 0.75
    hub.update_info("epoch", 3)
    assert hub.get_info("epoch") == 3
    assert MessageHub.get_instance("test") is hub


def test_evaluator_depth_metric():
    ev = Evaluator([dict(type="DepthMetric")])
    gt = np.full((1, 8, 8), 2.0, np.float32)
    ev.process({"gt_depth": gt}, {"depth": gt * 1.1})
    out = ev.evaluate()
    assert out["depth/AbsRel"] == pytest.approx(0.1, abs=1e-5)


def test_fileio_roundtrip(tmp_path):
    obj = {"a": 1, "b": [1, 2, 3]}
    for fmt in ("json", "pkl"):
        p = str(tmp_path / f"x.{fmt}")
        dump(obj, p)
        assert load(p) == obj


def test_grad_accumulation():
    import optax

    tx = build_optimizer(dict(type="SGD", lr=1.0), accumulate_steps=2)
    params = {"w": jnp.zeros(3)}
    opt = tx.init(params)
    g = {"w": jnp.ones(3)}
    u1, opt = tx.update(g, opt, params)
    # first step accumulates: no update applied yet
    np.testing.assert_allclose(np.asarray(u1["w"]), 0.0)
    u2, opt = tx.update(g, opt, params)
    # second step applies the mean gradient
    np.testing.assert_allclose(np.asarray(u2["w"]), -1.0)


def test_early_stopping(tmp_path):
    import flax.linen as nn
    import jax

    from deep3dmap_tpu.parallel import make_mesh
    from deep3dmap_tpu.runners import EpochBasedRunner
    from deep3dmap_tpu.runners.hooks_extra import EarlyStoppingHook

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(1)(x)

    class FW:
        net = Net()

        def init(self, rng, batch):
            return self.net.init(rng, batch["x"]), {}

        def loss_fn(self, params, mstate, batch, rng):
            # constant loss -> never improves after epoch 1
            loss = jnp.sum(self.net.apply(params, batch["x"]) * 0.0) + 1.0
            return loss, {"log_vars": {}, "model_state": mstate}

    loader = [{"x": np.zeros((4, 2), np.float32)}] * 2
    runner = EpochBasedRunner(FW(), work_dir=str(tmp_path), mesh=make_mesh(),
                              max_epochs=50)
    runner.setup(loader[0], optimizer=dict(type="SGD", lr=0.0),
                 iters_per_epoch=2)
    runner.register_hook(EarlyStoppingHook(monitor="loss", patience=2))
    runner.run([loader], [("train", 1)])
    assert runner.epoch <= 5  # stopped long before 50


def test_inferencer(tmp_path):
    from deep3dmap_tpu.runners.inferencer import BaseInferencer

    cfg = dict(model=dict(type="faceimg2uv",
                          model_cfgs=dict(resolution=32, base_channels=8)))
    inf = BaseInferencer(cfg)
    batch = {"faceimg": np.zeros((2, 32, 32, 3), np.float32)}
    out = inf(batch)
    assert out["uvpos"].shape == (2, 32, 32, 3)
