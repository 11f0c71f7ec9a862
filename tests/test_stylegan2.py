"""StyleGAN2 ops + generator/discriminator tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.ops.upfirdn2d import (
    upfirdn2d, make_kernel, upsample2d, downsample2d, fused_leaky_relu,
)
from deep3dmap_tpu.models.modulars.stylegan2 import Generator, StyleDiscriminator


def test_upfirdn2d_identity():
    x = jnp.asarray(np.random.RandomState(0).rand(1, 8, 8, 3).astype(np.float32))
    k = make_kernel([1.0])
    y = upfirdn2d(x, k, pad=(0, 0))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_upsample_downsample_shapes():
    x = jnp.zeros((2, 8, 8, 4))
    k = make_kernel((1, 3, 3, 1))
    up = upsample2d(x, k)
    assert up.shape == (2, 16, 16, 4)
    down = downsample2d(up, k)
    assert down.shape == (2, 8, 8, 4)


def test_upsample_preserves_mean():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(1, 8, 8, 1).astype(np.float32))
    k = make_kernel((1, 3, 3, 1))
    up = upsample2d(x, k, factor=2)  # upsample2d scales by factor^2 itself
    # interior energy preserved (kernel scaled by factor^2)
    assert abs(float(up[:, 4:-4, 4:-4].mean()) - float(x[:, 2:-2, 2:-2].mean())) < 0.05


def test_fused_leaky_relu():
    x = jnp.asarray([-1.0, 1.0])
    b = jnp.asarray([0.5])
    y = fused_leaky_relu(x[None, :, None, None].transpose(0, 2, 3, 1) * 0 + x.reshape(1, 2, 1, 1).transpose(0, 2, 3, 1), None)
    y2 = fused_leaky_relu(jnp.asarray([[-1.0], [1.0]]), b)
    np.testing.assert_allclose(np.asarray(y2),
                               np.asarray([[-0.1 * 2 ** 0.5], [1.5 * 2 ** 0.5]]),
                               rtol=1e-5)


@pytest.fixture(scope="module")
def gan32():
    g = Generator(size=32, style_dim=64, n_mlp=2, channel_multiplier=1)
    d = StyleDiscriminator(size=32, channel_multiplier=1)
    z = jnp.zeros((2, 64))
    gp = jax.jit(lambda k: g.init({"params": k, "noise": k}, z))(jax.random.PRNGKey(0))
    img = g.apply(gp, z, rngs={"noise": jax.random.PRNGKey(1)})
    dp = jax.jit(lambda k: d.init(k, img))(jax.random.PRNGKey(2))
    return g, d, gp, dp, z, img


def test_generator_shapes(gan32):
    g, d, gp, dp, z, img = gan32
    assert img.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(img)).all()
    # w+ input path
    w_plus = jnp.zeros((2, g.n_latent, 64))
    img2 = g.apply(gp, w_plus, input_is_latent=True, rngs={"noise": jax.random.PRNGKey(1)})
    assert img2.shape == (2, 32, 32, 3)


@pytest.mark.slow
def test_discriminator_and_gan_grads(gan32):
    g, d, gp, dp, z, img = gan32
    score = d.apply(dp, img)
    assert score.shape == (2, 1)

    def g_loss(gp):
        fake = g.apply(gp, z, rngs={"noise": jax.random.PRNGKey(3)})
        return jax.nn.softplus(-d.apply(dp, fake)).mean()

    gr = jax.grad(g_loss)(gp)
    total = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(gr))
    assert np.isfinite(total) and total > 0


def test_generator_style_controls_output(gan32):
    g, d, gp, dp, z, img = gan32
    z2 = jnp.ones((2, 64))
    img2 = g.apply(gp, z2, rngs={"noise": jax.random.PRNGKey(1)})
    assert float(jnp.abs(img2 - img).max()) > 1e-4
