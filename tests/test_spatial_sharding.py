"""Spatially-sharded volume tests on the virtual 8-device mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from deep3dmap_tpu.core.tsdf.fusion import TSDFParams, tsdf_fuse_frames
from deep3dmap_tpu.parallel import make_mesh
from deep3dmap_tpu.parallel.spatial import (
    shard_global_volumes,
    tsdf_fuse_frames_sharded,
    volume_sharding,
)


def _wall_frames(n=3, H=24, W=32):
    intr = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)
    pose = np.eye(4, dtype=np.float32)
    depth = np.full((H, W), 1.0, np.float32)
    return (np.stack([depth] * n), np.stack([intr] * n), np.stack([pose] * n))


def test_sharded_fusion_matches_single_device():
    mesh = make_mesh(axes=("x",))
    params = TSDFParams(dim=(16, 16, 16), voxel_size=0.1)
    depths, intrs, poses = _wall_frames()
    origin = np.array([-0.8, -0.8, 0.0], np.float32)

    t_ref, w_ref = tsdf_fuse_frames(jnp.asarray(depths), jnp.asarray(intrs),
                                    jnp.asarray(poses), jnp.asarray(origin), params)
    t_sh, w_sh = tsdf_fuse_frames_sharded(depths, intrs, poses, origin, params,
                                          mesh, axis="x")
    # sharded over 8 devices on X: bitwise-equal result
    np.testing.assert_array_equal(np.asarray(t_sh), np.asarray(t_ref))
    np.testing.assert_array_equal(np.asarray(w_sh), np.asarray(w_ref))
    assert len(t_sh.sharding.device_set) == len(jax.devices())


@pytest.mark.slow
def test_global_hidden_volume_spatial_sharding():
    """NeuralRecon's recurrent volumes shard spatially and the train step
    still compiles and runs (XLA handles boundary-straddling windows)."""
    import optax

    from deep3dmap_tpu.datasets.builder import _stack_samples
    from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
    from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon

    mesh = make_mesh(axes=("data", "model"), shape=(2, 4))
    fw = NeuralRecon(dict(N_LAYER=3, N_VOX=[16] * 3, VOXEL_SIZE=0.08,
                          FUSION=dict(FUSION_ON=True, FULL=True),
                          BACKBONE2D=dict(ARC="fpn-mnas-0.5"),
                          GLOBAL_DIMS=[8, 16, 32]))
    samples = [make_fragment_sample(seed=i, n_views=3, img_size=(32, 32),
                                    n_vox=16, voxel_size=0.08) for i in range(2)]
    batch = _stack_samples(samples)
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    mstate = shard_global_volumes(mstate, mesh, axis="model")

    vols = mstate["global_hidden"].volumes
    assert vols[2].sharding.spec == P(None, "model")

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, mstate, batch, rng):
        (loss, aux), g = jax.value_and_grad(fw.loss_fn, has_aux=True)(
            params, mstate, batch, rng)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, aux["model_state"], loss

    with mesh:
        params, opt, mstate2, loss = step(params, opt, mstate, batch,
                                          jax.random.PRNGKey(1))
        jax.block_until_ready(loss)
    assert np.isfinite(float(loss))
    # updated volumes exist and stayed on the mesh
    assert len(mstate2["global_hidden"].volumes[2].sharding.device_set) == 8


@pytest.mark.slow
def test_block_sparse_data_parallel_matches_single_device():
    """The block-sparse pipeline (bench.py's headline path) sharded over the
    data axis must compute the same per-fragment losses as unsharded:
    select_blocks / halo gathers / block scatters all partition over SPMD."""
    import optax
    from jax.sharding import NamedSharding

    from deep3dmap_tpu.datasets.builder import _stack_samples
    from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
    from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon

    cfgs = dict(N_LAYER=3, N_VOX=[32] * 3, VOXEL_SIZE=0.08,
                TRAIN_NUM_SAMPLE=[64, 256],
                FUSION=dict(FUSION_ON=True, FULL=True),
                LW=[1.0, 0.8, 0.64], THRESHOLDS=[0, 0, 0], POS_WEIGHT=1.5,
                BACKBONE2D=dict(ARC="fpn-mnas-0.5"),
                SPARSE_MODE="block", BLOCK_SIZE=8, MAX_BLOCKS=[None, 4, 24])
    fw = NeuralRecon(cfgs)
    n_dev = len(jax.devices())
    samples = [make_fragment_sample(seed=i, n_views=2, img_size=(32, 32),
                                    n_vox=32, voxel_size=0.08)
               for i in range(n_dev)]
    batch = _stack_samples(samples)
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def step(params, opt, mstate, batch, rng):
        (loss, aux), g = jax.value_and_grad(fw.loss_fn, has_aux=True)(
            params, mstate, batch, rng)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, aux["model_state"], loss

    key = jax.random.PRNGKey(1)
    # single-device reference
    p_ref, _, ms_ref, loss_ref = jax.jit(step)(params, opt, mstate, batch, key)
    jax.block_until_ready(loss_ref)

    # data-parallel: batch + recurrent volumes sharded on the fragment axis
    mesh = make_mesh(axes=("data",))
    dp = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def shard(tree, leading):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(
                jnp.asarray(x),
                dp if (leading and jnp.asarray(x).ndim >= 1
                       and jnp.asarray(x).shape[0] == n_dev) else repl),
            tree)

    batch_s = shard(batch, True)
    mstate_s = shard(mstate, True)
    params_s = shard(params, False)
    opt_s = shard(opt, False)
    with mesh:
        p_sh, _, ms_sh, loss_sh = jax.jit(step)(params_s, opt_s, mstate_s,
                                                batch_s, key)
        jax.block_until_ready(loss_sh)
    assert len(loss_sh.sharding.device_set) >= 1
    np.testing.assert_allclose(float(loss_sh), float(loss_ref),
                               rtol=2e-4, atol=1e-5)
    # recurrent hidden volumes updated identically (fragment-local math)
    for lvl in (1, 2):
        np.testing.assert_allclose(
            np.asarray(ms_sh["global_hidden"].volumes[lvl]),
            np.asarray(ms_ref["global_hidden"].volumes[lvl]),
            rtol=2e-3, atol=2e-4)
