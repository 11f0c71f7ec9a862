"""LERF stack tests: hashgrid, CLIP relevancy, field, end-to-end training."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.core.renderer.renderer_lerf import render_clip, render_mean
from deep3dmap_tpu.datasets.lerf_rays import LERFRayDataset
from deep3dmap_tpu.models.frameworks.lerf import LERFModel
from deep3dmap_tpu.models.modulars.clip_encoder import CLIPEncoder
from deep3dmap_tpu.models.modulars.hashgrid import HashGridEncoding

CFG = dict(clip_n_dims=64, dino_n_dims=32, N_samples=8, N_importance=8,
           num_lerf_samples=4, fc_depth=2, fc_dim=32,
           grid_layers=(2, 2), grid_sizes=(10, 10),
           grid_resolutions=((4, 16), (16, 32)), hidden=32)


def test_hashgrid_shapes_and_interp():
    enc = HashGridEncoding(n_levels=3, features_per_level=4, log2_hashmap_size=10,
                           base_res=4, end_res=16)
    x = jnp.asarray([[0.2, 0.5, 0.8], [0.21, 0.5, 0.8]])
    p = enc.init(jax.random.PRNGKey(0), x)
    y = enc.apply(p, x)
    assert y.shape == (2, 12)
    # nearby points -> nearby features (continuity of trilinear interp)
    assert float(jnp.abs(y[0] - y[1]).max()) < 0.5 * float(jnp.abs(y).max() + 1e-9)
    # gradient flows into tables
    g = jax.grad(lambda p: enc.apply(p, x).sum())(p)
    assert sum(float(jnp.abs(t).sum()) for t in jax.tree_util.tree_leaves(g)) > 0


def test_renderers():
    e = jnp.ones((4, 8, 16))
    w = jnp.full((4, 8, 1), 1.0 / 8)
    c = render_clip(e, w)
    np.testing.assert_allclose(np.asarray(jnp.linalg.norm(c, axis=-1)), 1.0, rtol=1e-5)
    m = render_mean(e, w)
    np.testing.assert_allclose(np.asarray(m), 1.0, rtol=1e-5)


def test_clip_relevancy():
    enc = CLIPEncoder(embed_dim=32)
    enc.set_positives(["red chair"])
    pos_emb = enc.pos_embeds[0]
    probs = enc.get_relevancy(pos_emb[None], 0)
    assert probs.shape == (1, 2)
    # the positive embedding itself must score higher than a random one
    rnd = enc.encode_text(["completely unrelated walrus"])
    p_pos = float(enc.get_relevancy(pos_emb[None], 0)[0, 0])
    p_rnd = float(enc.get_relevancy(rnd, 0)[0, 0])
    assert p_pos > p_rnd


@pytest.fixture(scope="module")
def lerf_setup():
    fw = LERFModel(CFG)
    ds = LERFRayDataset(rays_per_batch=64, n_batches=2, clip_n_dims=64,
                        dino_n_dims=32, image_encoder=fw.image_encoder)
    batch = next(iter(ds))
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    return fw, ds, batch, params, mstate


@pytest.mark.slow
def test_lerf_loss_and_grads(lerf_setup):
    fw, ds, batch, params, mstate = lerf_setup
    loss, aux = fw.loss_fn(params, mstate, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert set(aux["log_vars"]) == {"rgb_loss", "clip_loss", "dino_loss"}
    g = jax.grad(lambda p: fw.loss_fn(p, mstate, batch, jax.random.PRNGKey(1))[0])(params)
    for net in ("rgb_field", "lerf_field"):
        s = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g[net]))
        assert s > 0, net


@pytest.mark.slow
def test_lerf_trains(lerf_setup):
    import optax

    fw, ds, batch, params, mstate = lerf_setup
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, batch, rng):
        (l, aux), g = jax.value_and_grad(fw.loss_fn, has_aux=True)(
            params, {}, batch, rng)
        u, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, u), opt, l

    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(25):
        rng, sub = jax.random.split(rng)
        params, opt, l = step(params, opt, batch, sub)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_lerf_relevancy_inference(lerf_setup):
    fw, ds, batch, params, mstate = lerf_setup
    fw.image_encoder.set_positives(["blue sphere"])
    out, _ = fw.forward_test(params, mstate, batch)
    assert out["rgb"].shape == (64, 3)
    assert out["raw_relevancy"].shape == (1, 64)
    assert out["best_scales"].shape == (1,)
    assert np.isfinite(np.asarray(out["raw_relevancy"])).all()


@pytest.mark.slow
def test_lerf_hashgrid_field_loss_and_grads():
    """Nerfacto-parity RGB path: proposal sampling + interlevel loss."""
    cfg = dict(CFG, rgb_field_type="hashgrid", N_proposal=16, N_importance=16,
               rgb_grid_levels=4, rgb_grid_log2=10, rgb_grid_end=64,
               rgb_hidden=32)
    fw = LERFModel(cfg)
    ds = LERFRayDataset(rays_per_batch=64, n_batches=1, clip_n_dims=64,
                        dino_n_dims=32, image_encoder=fw.image_encoder)
    batch = next(iter(ds))
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    assert "proposal" in params
    loss, aux = fw.loss_fn(params, mstate, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    assert "prop_loss" in aux["log_vars"]
    g = jax.grad(lambda p: fw.loss_fn(p, mstate, batch,
                                      jax.random.PRNGKey(1))[0])(params)
    for net in ("rgb_field", "proposal", "lerf_field"):
        s = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(g[net]))
        assert s > 0, net
    out, _ = jax.jit(fw.forward_test)(params, mstate, batch)
    assert np.isfinite(np.asarray(out["rgb"])).all()
