"""GNeRF stack tests: volume renderer, samplers, adversarial state machine."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.core.renderer.renderer_nfvr import sample_pdf, volume_render
from deep3dmap_tpu.core.renderer.samples.patch_sampler import (
    FlexPatchSampler,
    FullImageSampler,
    RescalePatchSampler,
    sample_image_patches,
)
from deep3dmap_tpu.core.renderer.samples.ray_sampler import RaySampler, look_at_rotation
from deep3dmap_tpu.datasets.builder import NumpyLoader
from deep3dmap_tpu.datasets.nerf_synthetic import SyntheticNerfDataset
from deep3dmap_tpu.models.frameworks.gnerf import GanNerf
from deep3dmap_tpu.models.modulars.embeddings import r6d2mat, pose_to_d9


def test_sample_pdf_concentrates():
    """Importance sampling should place samples where the weights are."""
    n_rays, m = 4, 16
    bins = jnp.broadcast_to(jnp.linspace(0, 1, m + 1), (n_rays, m + 1))
    weights = jnp.zeros((n_rays, m)).at[:, 10].set(100.0)
    s = sample_pdf(jax.random.PRNGKey(0), bins, weights, 32)
    mid = (10.5) / m
    assert abs(float(s.mean()) - mid) < 0.1


def test_volume_render_opaque_surface():
    """A wall of high density at one sample -> depth ≈ that sample's z."""
    N, S = 8, 32
    z = jnp.broadcast_to(jnp.linspace(0.5, 2.0, S), (N, S))
    sigmas = jnp.zeros((N, S)).at[:, 20].set(1000.0)
    rgbs = jnp.ones((N, S, 3)) * 0.7
    d = jnp.tile(jnp.asarray([[0.0, 0, 1]]), (N, 1))
    rgb, depth, w = volume_render(sigmas, rgbs, z, d, jnp.full((N, 1), 2.0))
    np.testing.assert_allclose(np.asarray(depth), float(z[0, 20]), atol=0.05)
    np.testing.assert_allclose(np.asarray(rgb), 0.7, atol=0.01)
    np.testing.assert_allclose(np.asarray(w.sum(-1)), 1.0, atol=0.01)


def test_look_at_rotation_points_at_target():
    pos = jnp.asarray([[2.0, 0, 0]])
    R = look_at_rotation(pos)
    z_axis = np.asarray(R)[0, :, 2]
    np.testing.assert_allclose(z_axis, [-1, 0, 0], atol=1e-5)


def test_ray_sampler_geometry():
    rs = RaySampler(near=0.5, far=4.0, azim_range=(0, 360), elev_range=(10, 50),
                    radius=(1.0, 1.5))
    rs.set_start_intrinsics(np.array([[64, 0, 32], [0, 64, 32], [0, 0, 1]], np.float32))
    poses = rs.random_poses(jax.random.PRNGKey(0), 6)
    assert poses.shape == (6, 3, 4)
    radii = np.linalg.norm(np.asarray(poses)[:, :, 3], axis=-1)
    assert ((radii >= 1.0 - 1e-4) & (radii <= 1.5 + 1e-4)).all()

    sampler = FullImageSampler()
    coords, _ = sampler(None, 2, (8, 8))
    rays = rs.get_rays(coords, poses[:2], (8, 8))
    assert rays.shape == (2, 8, 8, 8)
    d = np.asarray(rays[..., 3:6])
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-4)


def test_patch_samplers():
    flex = FlexPatchSampler(min_scale=0.25, max_scale=0.75, scale_anneal=0.0)
    coords, scales = flex(jax.random.PRNGKey(1), 4, 8, 0)
    assert coords.shape == (4, 8, 8, 2)
    assert float(jnp.abs(coords).max()) <= 1.0 + 1e-5
    s = np.asarray(scales).reshape(-1)
    assert ((s >= 0.25) & (s <= 0.75)).all()

    imgs = jnp.broadcast_to(jnp.linspace(0, 1, 16)[None, :, None, None], (4, 16, 16, 3))
    patches = sample_image_patches(imgs, coords)
    assert patches.shape == (4, 8, 8, 3)


def test_r6d_roundtrip(rng):
    from deep3dmap_tpu.core.all3dtrans.rotations import euler_angles_to_matrix

    R = euler_angles_to_matrix(jnp.asarray(rng.uniform(-1, 1, (3, 3)), jnp.float32))
    d9 = pose_to_d9(jnp.concatenate([R, jnp.zeros((3, 3, 1))], -1))
    R2 = r6d2mat(d9[:, 3:9])
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


@pytest.fixture(scope="module")
def gnerf_setup():
    cfg = dict(img_wh=(32, 32), patch_size=16, inv_size=16, pose_mode="6d",
               fc_depth=2, fc_dim=32, N_samples=8, N_importance=8, ndf=16,
               inv_depth=2, n_train_images=4, n_val_images=2)
    fw = GanNerf(cfg)
    ds = SyntheticNerfDataset(n_images=4, img_wh=(32, 32))
    fw.set_info_from_datasets([ds, SyntheticNerfDataset(n_images=2, img_wh=(32, 32), split="val")])
    loader = NumpyLoader(ds, batch_size=2, shuffle=False)
    batch = next(iter(loader))
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    return fw, params, mstate, batch


def test_gnerf_optimize_sequences(gnerf_setup):
    fw = gnerf_setup[0]
    assert len(fw.setup_optimize_sequences("A")) == 5
    assert len(fw.setup_optimize_sequences("ABAB")) == 7
    assert fw.setup_optimize_sequences("B") == ["training_refine_step", "val_refine_step"]
    assert fw.optseq2netnames("generator_trainstep") == ["generator"]
    with pytest.raises(AssertionError):
        fw.setup_optimize_sequences("C")


@pytest.mark.parametrize("opt_seq", [
    "generator_trainstep", "discriminator_trainstep", "inversion_net_trainstep",
    "training_pose_regularization", "training_refine_step", "val_refine_step",
])
@pytest.mark.slow
def test_gnerf_all_sequences_finite(gnerf_setup, opt_seq):
    fw, params, mstate, batch = gnerf_setup
    loss, aux = fw.loss_fn(params, mstate, batch, jax.random.PRNGKey(2),
                           state="A", opt_seq=opt_seq)
    assert np.isfinite(float(loss)), opt_seq
    # gradients flow to the nets this sequence optimizes
    nets = fw.optseq2netnames(opt_seq)
    grads = jax.grad(lambda p: fw.loss_fn(p, mstate, batch, jax.random.PRNGKey(2),
                                          state="A", opt_seq=opt_seq)[0])(params)
    for net in nets:
        g = sum(float(jnp.abs(x).sum()) for x in jax.tree_util.tree_leaves(grads[net]))
        assert g > 0, f"no grad into {net} for {opt_seq}"


def test_gnerf_forward_test(gnerf_setup):
    fw, params, mstate, batch = gnerf_setup
    batch2 = dict(batch, val_idx=np.arange(2))
    out, _ = fw.forward_test(params, mstate, batch2)
    assert out["rgb"].shape == (2, 32, 32, 3)
    assert out["depth"].shape == (2, 32, 32)
