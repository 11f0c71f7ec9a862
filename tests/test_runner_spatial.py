"""Production-path spatial sharding (§5.7): the runner/train-CLI route.

r4 gap: `parallel/spatial.py` (halo GRU, shard_global_volumes) was real and
dryrun-tested but unreachable from `tools/train.py`.  These tests pin the
production wiring: `BaseRunner.setup` calls `framework.set_mesh(mesh)` (halo
GRU fusion over the 'model' axis) and places the TrainState via
`shard_train_state`, and the CLI reaches it through cfg.mesh.

Ref: /root/reference/deep3dmap/models/modulars/gru_fusion.py:122-150 (the
single-GPU unbounded global volume this design replaces); SURVEY §5.7.
"""
import os
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

import jax

from deep3dmap_tpu.datasets.builder import _stack_samples
from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon
from deep3dmap_tpu.parallel import make_mesh
from deep3dmap_tpu.runners import EpochBasedRunner

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _cfg(n_vox=16):
    return dict(N_LAYER=3, N_VOX=[n_vox] * 3, VOXEL_SIZE=0.08,
                FUSION=dict(FUSION_ON=True, FULL=True),
                BACKBONE2D=dict(ARC="fpn-mnas-0.5"))


def _batches(n, bs, n_vox=16):
    out = []
    for b in range(n):
        out.append(_stack_samples([
            make_fragment_sample(seed=10 * b + i, n_views=3, img_size=(32, 32),
                                 n_vox=n_vox, voxel_size=0.08)
            for i in range(bs)]))
    return out


def _run(mesh, batches, iters=3):
    fw = NeuralRecon(_cfg())
    runner = EpochBasedRunner(fw, mesh=mesh, max_epochs=1, seed=0)
    runner.setup(batches[0], optimizer=dict(type="Adam", lr=1e-3),
                 iters_per_epoch=len(batches))
    losses = [float(runner.run_iter(b)["loss"]) for b in batches[:iters]]
    return fw, runner, losses


def test_runner_spatial_mesh_matches_data_mesh():
    """The 2-D (data, model) mesh — halo-GRU fusion + spatially sharded
    volumes — reproduces the data-only mesh numerics through the runner."""
    batches = _batches(3, bs=2)

    fw1, r1, losses1 = _run(make_mesh(axes=("data",), shape=(2,)), batches)
    assert fw1.net.gru_spatial is None  # no model axis -> dense cell

    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    fw2, r2, losses2 = _run(mesh, batches)

    # the halo path actually activated ...
    assert fw2.net.gru_spatial is not None
    assert fw2.net.gru_spatial[1] == "model"
    # ... the recurrent volumes are spatially sharded over 'model'
    vols = r2.state.model_state["global_hidden"].volumes
    for v in vols:
        spec = v.sharding.spec
        assert "model" in str(spec), spec
    # ... and numerics match the data-parallel run
    np.testing.assert_allclose(losses1, losses2, rtol=2e-4, atol=2e-4)
    assert all(np.isfinite(losses2))


def test_set_mesh_refuses_indivisible_dims():
    fw = NeuralRecon(_cfg(n_vox=12))  # window dims [3, 6, 12]: 3 % 4 != 0
    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    assert fw.set_mesh(mesh) is False
    assert fw.net.gru_spatial is None


@pytest.mark.slow
def test_train_cli_spatial_mesh(tmp_path):
    """tools/train.py with cfg.mesh=(data, model) runs the full CLI path on
    the virtual 8-device mesh (the r4 'no production entry point' gap)."""
    cfg = tmp_path / "spatial_cfg.py"
    cfg.write_text(
        f"_base_ = ['{REPO}/configs/neural_recon/scannet_synthetic.py']\n"
        "mesh = dict(axes=('data', 'model'), shape=(2, 4))\n"
        "data = dict(samples_per_gpu=2,\n"
        "            train=dict(n_samples=4))\n"
        "log_config = dict(interval=1)\n"
        "runner = dict(runner_cfgs=dict(max_epochs=1))\n")
    env = dict(os.environ, D3M_PLATFORM="cpu", D3M_NUM_DEVICES="8")
    r = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "train.py"), str(cfg),
         "--work-dir", str(tmp_path / "wd")],
        env=env, capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    log = (tmp_path / "wd" / "train.log").read_text()
    assert "Training finished" in log
