"""NeuralRecon end-to-end tests on synthetic fragments."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.datasets.builder import _stack_samples
from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon, apply_log_transform

MODEL_CFGS = dict(
    N_LAYER=3,
    N_VOX=[24, 24, 24],
    VOXEL_SIZE=0.08,
    FUSION=dict(FUSION_ON=True, FULL=True),
    LW=[1.0, 0.8, 0.64],
    THRESHOLDS=[0, 0, 0],
    POS_WEIGHT=1.5,
    BACKBONE2D=dict(ARC="fpn-mnas-0.5"),
)


@pytest.fixture(scope="module")
def batch():
    samples = [make_fragment_sample(seed=i, n_views=4, img_size=(64, 64),
                                    n_vox=24, voxel_size=0.08) for i in range(2)]
    return _stack_samples(samples)


@pytest.fixture(scope="module")
def fw_and_state(batch):
    fw = NeuralRecon(MODEL_CFGS)
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    return fw, params, mstate


def test_init_and_shapes(batch, fw_and_state):
    fw, params, mstate = fw_and_state
    out, new_state = fw._apply(params, mstate, batch)
    dims = [6, 12, 24]
    for i, d in enumerate(dims):
        assert out["tsdf"][i].shape == (2, d, d, d, 1)
        assert out["occ"][i].shape == (2, d, d, d, 1)
        assert out["count_mask"][i].shape == (2, d, d, d)
    # hidden volumes updated
    for i, v in enumerate(new_state["global_hidden"].volumes):
        assert v.shape[1] == dims[i]


@pytest.mark.slow
def test_loss_finite_and_backprop(batch, fw_and_state):
    fw, params, mstate = fw_and_state
    (loss, aux), grads = jax.value_and_grad(fw.loss_fn, has_aux=True)(
        params, mstate, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert gnorm > 0
    for i in range(3):
        assert np.isfinite(float(aux["log_vars"][f"tsdf_occ_loss_{i}"]))


def test_scene_reset_zeroes_hidden(batch, fw_and_state):
    fw, params, mstate = fw_and_state
    _, st1 = fw._apply(params, mstate, batch)
    # run again WITHOUT reset: hidden should persist (nonzero before apply)
    b_noreset = dict(batch, scene_reset=np.zeros(2, np.float32))
    _, st2 = fw._apply(params, st1, b_noreset)
    h1 = np.asarray(st1["global_hidden"].volumes[0])
    assert np.abs(h1).sum() > 0
    # with reset the *input* hidden is zeroed; output still updated
    b_reset = dict(batch, scene_reset=np.ones(2, np.float32))
    out_r, _ = fw._apply(params, st1, b_reset)
    out_nr, _ = fw._apply(params, st1, b_noreset)
    # reset vs no-reset must differ (hidden affects GRU output)
    diff = np.abs(np.asarray(out_r["tsdf"][0]) - np.asarray(out_nr["tsdf"][0])).max()
    assert diff > 0


@pytest.mark.slow
def test_overfit_single_fragment():
    """The flagship sanity check: loss must drop sharply when overfitting one
    fragment (SURVEY.md §7 stage 3)."""
    import optax

    sample = make_fragment_sample(seed=3, n_views=4, img_size=(64, 64),
                                  n_vox=24, voxel_size=0.08)
    batch = _stack_samples([sample])
    fw = NeuralRecon(dict(MODEL_CFGS, FUSION=dict(FUSION_ON=False, FULL=False)))
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, mstate, batch, rng):
        (loss, aux), grads = jax.value_and_grad(fw.loss_fn, has_aux=True)(
            params, mstate, batch, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux["model_state"], loss

    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(60):
        rng, sub = jax.random.split(rng)
        params, opt_state, mstate, loss = step(params, opt_state, mstate, batch, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.5, f"no learning: {losses[0]:.3f} -> {losses[-1]:.3f}"


def test_forward_test_outputs(batch, fw_and_state):
    fw, params, mstate = fw_and_state
    out, _ = fw.forward_test(params, mstate, batch)
    assert out["tsdf"].shape == (2, 24, 24, 24)
    assert out["occ"].shape == (2, 24, 24, 24)
    assert float(jnp.max(out["occ"])) <= 1.0


def test_apply_log_transform():
    x = jnp.asarray([-2.0, 0.0, 2.0])
    y = np.asarray(apply_log_transform(x))
    np.testing.assert_allclose(y, [-np.log(3), 0, np.log(3)], atol=1e-6)


def test_backbone_ckpt_graft(tmp_path, batch):
    """BACKBONE2D.CKPT/pretrained loads an imported MnasFPN npz and grafts it
    under params/backbone2d/fpn (ADVICE r1: complete the torch-import
    workflow), with FREEZE stop-gradienting the trunk."""
    from deep3dmap_tpu.models.backbones.fpn2d import MnasFPN

    donor = MnasFPN(alpha=0.5, norm="none", torch_pad=True)
    donor_params = jax.jit(donor.init)(jax.random.PRNGKey(7),
                                       jnp.zeros((1, 64, 64, 3)))
    npz = tmp_path / "mnas.npz"
    np.savez(npz, params=np.array(
        jax.tree_util.tree_map(np.asarray, donor_params), dtype=object))

    cfgs = dict(MODEL_CFGS,
                BACKBONE2D=dict(ARC="fpn-mnas-0.5", NORM="none",
                                TORCH_PAD=True, CKPT=str(npz), FREEZE=True))
    fw = NeuralRecon(cfgs)
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    got = params["params"]["backbone2d"]["fpn"]
    want = donor_params["params"]
    for g, w in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=0)

    # FREEZE: no gradient reaches the grafted trunk, others still train
    _, grads = jax.value_and_grad(fw.loss_fn, has_aux=True)(
        params, mstate, batch, jax.random.PRNGKey(1))
    bb = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(
        grads["params"]["backbone2d"]))
    rest = sum(float(jnp.abs(g).sum()) for k, v in grads["params"].items()
               if k != "backbone2d"
               for g in jax.tree_util.tree_leaves(v))
    assert bb == 0.0
    assert rest > 0


def test_backbone_ckpt_shape_mismatch(tmp_path, batch):
    """A mis-matched npz (wrong alpha) fails loudly with a shape error."""
    from deep3dmap_tpu.models.backbones.fpn2d import MnasFPN

    donor = MnasFPN(alpha=1.0, norm="none", torch_pad=True)
    donor_params = jax.jit(donor.init)(jax.random.PRNGKey(7),
                                       jnp.zeros((1, 64, 64, 3)))
    npz = tmp_path / "mnas_a1.npz"
    np.savez(npz, params=np.array(
        jax.tree_util.tree_map(np.asarray, donor_params), dtype=object))
    cfgs = dict(MODEL_CFGS,
                BACKBONE2D=dict(ARC="fpn-mnas-0.5", NORM="none",
                                TORCH_PAD=True, CKPT=str(npz)))
    fw = NeuralRecon(cfgs)
    with pytest.raises(ValueError, match="shape"):
        fw.init(jax.random.PRNGKey(0), batch)


# ---- block-sparse mode (SPARSE_MODE="block") ------------------------------

BLOCK_CFGS = dict(
    N_LAYER=3,
    N_VOX=[32, 32, 32],
    VOXEL_SIZE=0.08,
    TRAIN_NUM_SAMPLE=[64, 256],
    FUSION=dict(FUSION_ON=True, FULL=True),
    LW=[1.0, 0.8, 0.64],
    THRESHOLDS=[0, 0, 0],
    POS_WEIGHT=1.5,
    BACKBONE2D=dict(ARC="fpn-mnas-0.5"),
    SPARSE_MODE="block",
    BLOCK_SIZE=8,
    MAX_BLOCKS=[None, 4, 24],
)


@pytest.fixture(scope="module")
def block_batch():
    samples = [make_fragment_sample(seed=i, n_views=3, img_size=(64, 64),
                                    n_vox=32, voxel_size=0.08) for i in range(2)]
    return _stack_samples(samples)


@pytest.fixture(scope="module")
def block_fw_and_state(block_batch):
    fw = NeuralRecon(BLOCK_CFGS)
    params, mstate = fw.init(jax.random.PRNGKey(0), block_batch)
    return fw, params, mstate


@pytest.mark.slow
def test_block_mode_shapes_and_masks(block_batch, block_fw_and_state):
    fw, params, mstate = block_fw_and_state
    out, new_state = fw._apply(params, mstate, block_batch)
    dims = [8, 16, 32]
    for i, d in enumerate(dims):
        assert out["tsdf"][i].shape == (2, d, d, d, 1)
        assert out["occ"][i].shape == (2, d, d, d, 1)
        assert out["sparse_mask"][i].shape == (2, d, d, d)
    # block levels: the sparse set never exceeds the active-block capacity
    for i, maxb in [(1, 4), (2, 24)]:
        n_sparse = int(np.asarray(out["sparse_mask"][i]).sum(axis=(1, 2, 3)).max())
        assert n_sparse <= maxb * 8 ** 3


@pytest.mark.slow
def test_block_mode_loss_and_grads(block_batch, block_fw_and_state):
    fw, params, mstate = block_fw_and_state
    (loss, aux), grads = jax.value_and_grad(fw.loss_fn, has_aux=True)(
        params, mstate, block_batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.abs(g).sum()) for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # block UNet/GRU params received gradient
    flat = {"/".join(str(k) for k in p): g
            for p, g in jax.tree_util.tree_leaves_with_path(grads)}
    assert any("unet2" in k and float(jnp.abs(g).sum()) > 0 for k, g in flat.items())


@pytest.mark.slow
def test_block_mode_inactive_hidden_preserved(block_batch, block_fw_and_state):
    """GRU hidden outside the active block set must keep its old value
    (parity: gru_fusion.py:122-150 updates only the current sparse set)."""
    fw, params, mstate = block_fw_and_state
    old_vols = [v + 0.37 for v in mstate["global_hidden"].volumes]
    mstate2 = dict(mstate, global_hidden=mstate["global_hidden"]._replace(
        volumes=tuple(old_vols)))
    batch2 = dict(block_batch)
    if "scene_reset" in batch2:  # keep the carried state (no new-scene reset)
        batch2["scene_reset"] = jnp.zeros_like(batch2["scene_reset"])
    out, new_state = fw._apply(params, mstate2, batch2)
    for i in (1, 2):
        sm = np.asarray(out["sparse_mask"][i])  # voxels inside active blocks
        new_v = np.asarray(new_state["global_hidden"].volumes[i])
        old_v = np.asarray(old_vols[i])
        d = new_v.shape[1]
        bs = 8
        nb = d // bs
        # block-granular activity map from the sparse mask
        act = sm.reshape(2, nb, bs, nb, bs, nb, bs).any((2, 4, 6))
        act_vox = np.repeat(np.repeat(np.repeat(act, bs, 1), bs, 2), bs, 3)
        inactive = ~act_vox
        assert np.allclose(new_v[inactive], old_v[inactive]), \
            f"level {i}: hidden changed outside active blocks"


@pytest.mark.slow
def test_block_mode_forward_test(block_batch, block_fw_and_state):
    fw, params, mstate = block_fw_and_state
    out, new_state = jax.jit(fw.forward_test)(params, mstate, block_batch)
    assert out["tsdf"].shape == (2, 32, 32, 32)
    assert np.isfinite(np.asarray(out["tsdf"])).all()
    # unoccupied voxels read as empty space
    occ = np.asarray(out["occ"])
    assert ((occ >= 0) & (occ <= 1)).all()


# ---- scene-scale global hidden extent (VERDICT r2 weak #5) -----------------

@pytest.mark.slow
def test_global_dims_disjoint_windows_and_clamp_warning():
    """Two fragments 5 m apart must read/write DISJOINT global-hidden
    windows when GLOBAL_DIMS covers the scene, and the host-side check must
    warn when a fragment origin would clamp against an undersized extent."""
    cfgs = dict(N_LAYER=3, N_VOX=[16] * 3, VOXEL_SIZE=0.08,
                FUSION=dict(FUSION_ON=True, FULL=True),
                LW=[1.0, 0.8, 0.64], THRESHOLDS=[0, 0, 0], POS_WEIGHT=1.5,
                BACKBONE2D=dict(ARC="fpn-mnas-0.5"),
                GLOBAL_DIMS=[20, 40, 80])  # covers 6.4 m at every scale
    fw = NeuralRecon(cfgs)
    s = make_fragment_sample(seed=0, n_views=2, img_size=(32, 32),
                             n_vox=16, voxel_size=0.08)
    batch1 = _stack_samples([s])
    params, mstate = fw.init(jax.random.PRNGKey(0), batch1)
    out1, st1 = fw._apply(params, mstate, batch1)

    # second fragment of the SAME scene, 5 m along x (no scene reset)
    s2 = dict(s)
    s2["vol_origin_partial"] = np.asarray(
        s["vol_origin_partial"], np.float32) + np.array([5.0, 0, 0], np.float32)
    if "scene_reset" in s2:
        s2["scene_reset"] = np.zeros_like(np.asarray(s2["scene_reset"]))
    batch2 = _stack_samples([s2])
    out2, st2 = fw._apply(params, st1, batch2)

    dims = fw._window_dims()
    for lvl in range(3):
        v1 = np.asarray(st1["global_hidden"].volumes[lvl])
        v2 = np.asarray(st2["global_hidden"].volumes[lvl])
        w = dims[lvl]
        # fragment 1's window (at the scene origin) is untouched by write 2
        np.testing.assert_array_equal(v2[:, :w, :w, :w], v1[:, :w, :w, :w])
        # fragment 2 wrote somewhere else (state actually changed)
        assert not np.array_equal(v2, v1), f"level {lvl}: no second write"

    # host-side check: in-extent batch is silent ...
    fw.host_check_batch(batch2)
    assert not getattr(fw, "_warned_clamp", False)
    # ... an out-of-extent origin warns (once)
    far = dict(s)
    far["vol_origin_partial"] = np.asarray(
        s["vol_origin_partial"], np.float32) + np.array([50.0, 0, 0], np.float32)
    fw.host_check_batch(_stack_samples([far]))
    assert fw._warned_clamp


def test_backbone_batch_mode_matches_scan(batch, fw_and_state):
    """BACKBONE2D.MODE='batch' (views folded into the conv batch — no
    per-view scan stacking copies, r4 chip A/B: infer 30.8 -> 24.1 ms) must
    share the scanned form's param tree, and the trunk itself must be
    view-batch invariant: per-view application == one batched application.
    (End-to-end volumes are NOT compared: float-associativity-level feature
    differences can flip sparse occupancy-mask bits downstream.)"""
    from deep3dmap_tpu.models.backbones.fpn2d import MnasFPN

    fw_scan, params, mstate = fw_and_state
    fw_batch = NeuralRecon(dict(MODEL_CFGS,
                                BACKBONE2D=dict(ARC="fpn-mnas-0.5",
                                                MODE="batch")))
    p2, m2 = fw_batch.init(jax.random.PRNGKey(0), batch)
    assert (jax.tree_util.tree_structure(p2)
            == jax.tree_util.tree_structure(params))
    # batch-mode forward_test runs and produces the standard surface
    out_b, _ = fw_batch.forward_test(p2, m2, batch)
    assert out_b["tsdf"].shape == (2, 24, 24, 24)
    assert np.isfinite(np.asarray(out_b["tsdf"])).all()

    # trunk view-batch invariance at the feature level
    m = MnasFPN(alpha=0.5)
    imgs = jnp.asarray(batch["imgs"][:, :2])        # (B, 2, H, W, 3)
    B, V = imgs.shape[:2]
    p_fpn = m.init(jax.random.PRNGKey(1), imgs[:, 0])
    per_view = [m.apply(p_fpn, imgs[:, v]) for v in range(V)]
    batched = m.apply(p_fpn, imgs.reshape((B * V,) + imgs.shape[2:]))
    for s in range(3):
        want = np.stack([np.asarray(per_view[v][s]) for v in range(V)], 1)
        got = np.asarray(batched[s]).reshape(want.shape)
        np.testing.assert_allclose(want, got, rtol=2e-5, atol=2e-5)


def test_scene_reset_fold_matches_zeroed_state():
    """r5 fast path: with GLOBAL_DIMS == window, scene_reset folds into the
    read window (no full-volume select).  Resetting a dirty hidden state
    must equal running from a freshly zeroed state."""
    import jax
    import jax.numpy as jnp

    from deep3dmap_tpu.datasets.builder import _stack_samples
    from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
    from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon

    fw = NeuralRecon(dict(N_LAYER=3, N_VOX=[16] * 3, VOXEL_SIZE=0.08,
                          FUSION=dict(FUSION_ON=True, FULL=True),
                          BACKBONE2D=dict(ARC="fpn-mnas-0.5")))
    batch = _stack_samples([make_fragment_sample(
        seed=0, n_views=2, img_size=(32, 32), n_vox=16, voxel_size=0.08)])
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)

    # dirty the recurrent state, then reset via the batch flag
    dirty = jax.tree_util.tree_map(lambda v: v + 3.0, mstate["global_hidden"])
    mstate_dirty = dict(mstate, global_hidden=dirty)
    b_reset = dict(batch, scene_reset=np.ones(1, np.float32))
    out_reset, st_reset = jax.jit(fw._apply)(params, mstate_dirty, b_reset)
    out_zero, st_zero = jax.jit(fw._apply)(params, mstate, b_reset)

    for i in range(3):
        np.testing.assert_allclose(np.asarray(out_reset["tsdf"][i]),
                                   np.asarray(out_zero["tsdf"][i]),
                                   rtol=1e-5, atol=1e-5)
    for a, b in zip(st_reset["global_hidden"].volumes,
                    st_zero["global_hidden"].volumes):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)

    # and with reset=0 the dirty state must actually flow through
    b_keep = dict(batch, scene_reset=np.zeros(1, np.float32))
    out_keep, _ = jax.jit(fw._apply)(params, mstate_dirty, b_keep)
    assert np.abs(np.asarray(out_keep["tsdf"][2])
                  - np.asarray(out_reset["tsdf"][2])).max() > 1e-4
