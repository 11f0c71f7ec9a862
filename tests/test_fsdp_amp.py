"""FSDP/ZeRO PartitionSpec helpers and the AMP loss wrapper
(SURVEY.md §2.3 strategy table rows: FSDP, ZeRO; §2.9 AMP OptimWrapper)."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deep3dmap_tpu.parallel import (fsdp_shard, fsdp_specs, make_mesh,
                                    separate_group_specs, zero_shard,
                                    zero_specs)
from deep3dmap_tpu.runners.amp import (amp_loss, cast_floating, grads_finite,
                                       unscale_grads)


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs multi-device")
    return make_mesh(("data",))


def _toy_params():
    rng = np.random.RandomState(0)
    return {
        "dense": {"kernel": jnp.asarray(rng.randn(256, 128), jnp.float32),
                  "bias": jnp.zeros(128, jnp.float32)},
        "head": {"kernel": jnp.asarray(rng.randn(128, 8), jnp.float32)},
    }


def test_fsdp_specs_shard_large_replicate_small(mesh):
    params = _toy_params()
    specs = fsdp_specs(params, mesh, axis="data", min_size=1024)
    assert specs["dense"]["kernel"] == P("data", None)
    assert specs["dense"]["bias"] == P()      # tiny -> replicated
    assert specs["head"]["kernel"] == P("data", None)  # 128 divides the axis
    sharded = fsdp_shard(params, mesh, min_size=1024)
    sh = sharded["dense"]["kernel"].sharding
    assert isinstance(sh, NamedSharding) and sh.spec == P("data", None)


def test_fsdp_sharded_training_step_matches_replicated(mesh):
    params = _toy_params()
    x = jnp.asarray(np.random.RandomState(1).randn(16, 256), jnp.float32)
    y = jnp.asarray(np.random.RandomState(2).randn(16, 8), jnp.float32)

    def loss_fn(p, x, y):
        h = jax.nn.relu(x @ p["dense"]["kernel"] + p["dense"]["bias"])
        return jnp.mean((h @ p["head"]["kernel"] - y) ** 2)

    dense = jax.jit(jax.value_and_grad(loss_fn))(params, x, y)
    sharded_params = fsdp_shard(params, mesh, min_size=1024)
    shard = jax.jit(jax.value_and_grad(loss_fn))(sharded_params, x, y)
    np.testing.assert_allclose(dense[0], shard[0], rtol=1e-5)
    np.testing.assert_allclose(dense[1]["head"]["kernel"],
                               shard[1]["head"]["kernel"], rtol=1e-4,
                               atol=1e-5)


def test_zero_specs_mirror_param_shapes(mesh):
    params = _toy_params()
    opt = optax.adam(1e-3)
    state = opt.init(params)
    zs = zero_specs(state, params, mesh, min_size=1024)
    # adam mu/nu for dense.kernel get the kernel's spec
    mu_spec = jax.tree_util.tree_leaves(
        zs, is_leaf=lambda s: isinstance(s, P))
    assert P("data", None) in mu_spec
    sharded = zero_shard(state, params, mesh, min_size=1024)
    # one optimizer step with the sharded state still works under jit
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = jax.jit(opt.update)(grads, sharded, params)
    assert jnp.isfinite(updates["dense"]["kernel"]).all()


def test_separate_group_specs(mesh):
    groups = {"generator": _toy_params(), "discriminator": _toy_params()}
    specs = separate_group_specs(groups, mesh,
                                 shard_axes={"generator": "data"})
    assert specs["generator"]["dense"]["kernel"] == P("data", None)
    assert specs["discriminator"]["dense"]["kernel"] == P()


def test_amp_loss_runs_bf16_keeps_fp32_master():
    params = _toy_params()
    x = jnp.asarray(np.random.RandomState(3).randn(4, 256), jnp.float32)
    seen = {}

    def loss_fn(p, xb):
        seen["dtype"] = p["dense"]["kernel"].dtype
        h = xb @ p["dense"]["kernel"] + p["dense"]["bias"]
        return jnp.sum(h * h)

    loss, grads = jax.value_and_grad(amp_loss(loss_fn))(params, x)
    assert seen["dtype"] == jnp.bfloat16
    assert loss.dtype == jnp.float32
    # grads come back against the fp32 master params
    assert grads["dense"]["kernel"].dtype == jnp.float32
    fp32_loss = loss_fn(params, x)
    assert abs(float(loss) - float(fp32_loss)) / float(fp32_loss) < 0.05


def test_amp_loss_scale_roundtrip():
    params = {"w": jnp.asarray([2.0, 3.0])}

    def loss_fn(p):
        return jnp.sum(p["w"] ** 2)

    scaled = amp_loss(loss_fn, compute_dtype=jnp.float32, loss_scale=128.0)
    loss, grads = jax.value_and_grad(scaled)(params)
    assert float(loss) == pytest.approx(128.0 * 13.0)
    grads = unscale_grads(grads, 128.0)
    np.testing.assert_allclose(grads["w"], [4.0, 6.0], rtol=1e-6)
    assert bool(grads_finite(grads))
    bad = {"w": jnp.asarray([jnp.nan, 1.0])}
    assert not bool(grads_finite(bad))


def test_cast_floating_skips_ints():
    tree = {"f": jnp.ones(3, jnp.float32), "i": jnp.ones(3, jnp.int32)}
    out = cast_floating(tree, jnp.bfloat16)
    assert out["f"].dtype == jnp.bfloat16
    assert out["i"].dtype == jnp.int32
