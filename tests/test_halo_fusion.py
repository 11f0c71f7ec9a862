"""Explicit halo-exchange ConvGRU3D fusion == single-device result."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deep3dmap_tpu.models.modulars.conv_gru3d import ConvGRU3D
from deep3dmap_tpu.parallel.spatial import conv_gru3d_halo, halo_pad


def _mesh(n=4, name="model"):
    devs = np.array(jax.devices()[:n])
    return Mesh(devs, (name,))


def test_halo_pad_neighbors():
    mesh = _mesh(4)
    x = jnp.arange(8, dtype=jnp.float32).reshape(1, 8, 1, 1, 1)

    def f(blk):
        return halo_pad(blk, "model", 1)

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    out = shard_map(f, mesh=mesh, in_specs=P(None, "model"),
                    out_specs=P(None, "model"))(x)
    out = np.asarray(out).reshape(4, 4)  # 4 devices x (1 halo + 2 + 1 halo)
    # device 1 local slabs are [2, 3]; halos are 1 (left nbr) and 4 (right)
    np.testing.assert_allclose(out[1], [1, 2, 3, 4])
    # global boundary devices get zero halos
    assert out[0, 0] == 0.0 and out[3, -1] == 0.0


@pytest.mark.parametrize("gx", [8, 16])
def test_conv_gru3d_halo_matches_global(gx):
    mesh = _mesh(4)
    gru = ConvGRU3D(hidden_dim=6)
    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(2, gx, 4, 4, 6), jnp.float32)
    x = jnp.asarray(rs.randn(2, gx, 4, 4, 3), jnp.float32)
    params = gru.init(jax.random.PRNGKey(0), h, x)

    ref = gru.apply(params, h, x)
    out = conv_gru3d_halo(params, h, x, mesh, axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_conv_gru3d_halo_jit_with_shardings():
    mesh = _mesh(4)
    gru = ConvGRU3D(hidden_dim=4)
    rs = np.random.RandomState(1)
    h = jnp.asarray(rs.randn(1, 8, 4, 4, 4), jnp.float32)
    x = jnp.asarray(rs.randn(1, 8, 4, 4, 2), jnp.float32)
    params = gru.init(jax.random.PRNGKey(0), h, x)

    vs = NamedSharding(mesh, P(None, "model"))
    h_s = jax.device_put(h, vs)
    x_s = jax.device_put(x, vs)

    fn = jax.jit(lambda p, a, b: conv_gru3d_halo(p, a, b, mesh, axis="model"))
    out = fn(params, h_s, x_s)
    assert out.shape == h.shape
    ref = gru.apply(params, h, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
