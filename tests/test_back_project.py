"""Golden-value tests for dense back-projection against a naive numpy
reference implementing the semantics of
/root/reference/deep3dmap/core/voxel/back_project.py:5-84."""
import numpy as np
import pytest

import jax.numpy as jnp

from deep3dmap_tpu.ops.back_project import back_project_dense, back_project_batch


def naive_back_project(feats, proj, origin, dim, voxel_size, interval):
    """feats (V,H,W,C), proj (V,4,4), origin (3,)."""
    V, H, W, C = feats.shape
    vol = np.zeros((dim, dim, dim, C + 1), np.float32)
    cnt = np.zeros((dim, dim, dim), np.float32)
    feat_acc = np.zeros((dim, dim, dim, C), np.float32)
    z_acc = np.zeros((dim, dim, dim), np.float32)
    for ix in range(dim):
        for iy in range(dim):
            for iz in range(dim):
                world = np.array([ix, iy, iz], np.float32) * interval * voxel_size + origin
                for v in range(V):
                    p = proj[v] @ np.array([*world, 1.0])
                    z = p[2]
                    if z <= 0:
                        continue
                    x, y = p[0] / z, p[1] / z
                    if not (0 <= x <= W - 1 and 0 <= y <= H - 1):
                        continue
                    x0, y0 = int(np.floor(x)), int(np.floor(y))
                    x1, y1 = min(x0 + 1, W - 1), min(y0 + 1, H - 1)
                    wx, wy = x - x0, y - y0
                    f = (feats[v, y0, x0] * (1 - wx) * (1 - wy)
                         + feats[v, y0, x1] * wx * (1 - wy)
                         + feats[v, y1, x0] * (1 - wx) * wy
                         + feats[v, y1, x1] * wx * wy)
                    feat_acc[ix, iy, iz] += f
                    z_acc[ix, iy, iz] += z
                    cnt[ix, iy, iz] += 1
    denom = np.maximum(cnt, 1)
    mean_f = feat_acc / denom[..., None]
    mean_z = z_acc / denom
    seen = mean_z > 0
    if seen.any():
        zm = mean_z[seen].mean()
        zs = np.sqrt(((mean_z[seen] - zm) ** 2).sum()) + 1e-5
        zn = np.where(seen, (mean_z - zm) / zs, 0.0)
    else:
        zn = np.zeros_like(mean_z)
    vol[..., :C] = mean_f
    vol[..., C] = zn
    return vol, cnt


def _random_setup(rng, V=3, H=12, W=16, C=4, dim=6):
    feats = rng.randn(V, H, W, C).astype(np.float32)
    # cameras looking at the grid center from random positions
    projs = []
    extent = dim * 0.08
    for v in range(V):
        intr = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)
        eye = np.array([extent / 2 + np.cos(v) * 2 * extent,
                        extent / 2 + np.sin(v) * 2 * extent, extent], np.float32)
        from deep3dmap_tpu.datasets.synthetic import look_at_pose
        pose = look_at_pose(eye, np.array([extent / 2] * 3, np.float32))
        w2c = np.linalg.inv(pose)
        P = w2c.copy()
        P[:3, :4] = intr @ w2c[:3, :4]
        projs.append(P)
    proj = np.stack(projs).astype(np.float32)
    origin = np.zeros(3, np.float32)
    return feats, proj, origin


def test_back_project_matches_naive(rng):
    feats, proj, origin = _random_setup(rng)
    dim, vs, interval = 6, 0.08, 1
    vol, cnt = back_project_dense(jnp.asarray(feats), jnp.asarray(proj),
                                  jnp.asarray(origin), dim, vs, interval)
    vol_ref, cnt_ref = naive_back_project(feats, proj, origin, dim, vs, interval)
    np.testing.assert_allclose(np.asarray(cnt), cnt_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vol), vol_ref, rtol=1e-4, atol=1e-4)
    assert cnt_ref.max() >= 2, "test setup should have multi-view coverage"


def test_back_project_interval(rng):
    feats, proj, origin = _random_setup(rng)
    vol, cnt = back_project_dense(jnp.asarray(feats), jnp.asarray(proj),
                                  jnp.asarray(origin), 3, 0.08, 2)
    vol_ref, cnt_ref = naive_back_project(feats, proj, origin, 3, 0.08, 2)
    np.testing.assert_allclose(np.asarray(vol), vol_ref, rtol=1e-4, atol=1e-4)


def test_back_project_batch_shapes(rng):
    feats, proj, origin = _random_setup(rng)
    B = 2
    bf = np.stack([feats] * B)
    bp = np.stack([proj] * B)
    bo = np.stack([origin] * B)
    vol, cnt = back_project_batch(jnp.asarray(bf), jnp.asarray(bp), jnp.asarray(bo),
                                  6, 0.08, 1)
    assert vol.shape == (B, 6, 6, 6, 5)
    assert cnt.shape == (B, 6, 6, 6)
    np.testing.assert_allclose(np.asarray(vol[0]), np.asarray(vol[1]))


def test_behind_camera_is_masked(rng):
    feats, proj, origin = _random_setup(rng, V=1)
    # flip the camera to look away: negate rotation rows -> z < 0 for grid
    proj_flipped = proj.copy()
    proj_flipped[0, 2, :] *= -1
    vol, cnt = back_project_dense(jnp.asarray(feats), jnp.asarray(proj_flipped),
                                  jnp.asarray(origin), 6, 0.08, 1)
    assert float(jnp.asarray(cnt).sum()) == 0.0
    np.testing.assert_allclose(np.asarray(vol), 0.0, atol=1e-6)


def test_packed_gather_custom_vjp_matches_auto():
    """The per-view-scatter backward must equal the plain gather VJP."""
    import jax
    import jax.numpy as jnp

    from deep3dmap_tpu.ops.back_project import _packed_gather

    rs = np.random.RandomState(0)
    S, HW, K, C = 3, 40, 17, 8
    table = jnp.asarray(rs.randn(S * HW, C), jnp.float32)
    idx = jnp.asarray(
        rs.randint(0, HW, (S, K)) + np.arange(S)[:, None] * HW, jnp.int32)
    cot = jnp.asarray(rs.randn(S * K, C), jnp.float32)

    valid = jnp.ones((S, K), bool)

    def f_custom(t):
        return (_packed_gather(t, idx, valid, HW) * cot).sum()

    def f_auto(t):
        return (jnp.take(t, idx.reshape(-1), axis=0) * cot).sum()

    g_custom = jax.grad(f_custom)(table)
    g_auto = jax.grad(f_auto)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_auto),
                               rtol=1e-6, atol=1e-6)


def test_packed_gather_capped_vjp_exact():
    """grad_cap compaction must stay exact: compacted segments, segments
    overflowing the cap (cond fallback to the full scatter), and masked
    (invalid -> zero-cotangent) rows all match the plain gather VJP."""
    import jax
    import jax.numpy as jnp

    from deep3dmap_tpu.ops.back_project import _packed_gather

    rs = np.random.RandomState(1)
    S, HW, K, C = 4, 40, 24, 8
    table = jnp.asarray(rs.randn(S * HW, C), jnp.float32)
    idx = jnp.asarray(
        rs.randint(0, HW, (S, K)) + np.arange(S)[:, None] * HW, jnp.int32)
    # segment 0: few valid (compacted path); segment 1: all valid (overflow
    # -> full fallback); 2/3: mixed around the cap boundary
    valid = np.zeros((S, K), bool)
    valid[0, :5] = True
    valid[1, :] = True
    valid[2, ::2] = True
    valid[3, :12] = True
    valid = jnp.asarray(valid)
    cot = jnp.asarray(rs.randn(S * K, C), jnp.float32)
    # CONTRACT: invalid rows carry zero cotangent (the production chain
    # multiplies consumers by `valid`)
    cot = cot * valid.reshape(S * K, 1)
    cap = 12

    def f_capped(t):
        return (_packed_gather(t, idx, valid, HW, cap) * cot).sum()

    def f_auto(t):
        return (jnp.take(t, idx.reshape(-1), axis=0) * cot).sum()

    g_capped = jax.jit(jax.grad(f_capped))(table)
    g_auto = jax.grad(f_auto)(table)
    np.testing.assert_allclose(np.asarray(g_capped), np.asarray(g_auto),
                               rtol=1e-6, atol=1e-6)


def test_back_project_grad_row_frac_matches_unfracced(rng):
    """back_project_sparse_batch gradients are identical with and without
    the grad_row_frac backward compaction."""
    import jax
    import jax.numpy as jnp

    from deep3dmap_tpu.ops.back_project import back_project_sparse_batch

    feats, proj, origin = _random_setup(rng, V=3, H=12, W=16, C=5)
    dim = 6
    K = 30
    flat_idx = jnp.asarray(rng.randint(0, dim ** 3, (1, K)), jnp.int32)
    slot_valid = jnp.asarray(rng.rand(1, K) > 0.2)

    def loss(f, frac):
        feat, cnt = back_project_sparse_batch(
            f, jnp.asarray(proj)[None], jnp.asarray(origin)[None], flat_idx,
            slot_valid, dim, 0.08, 1, grad_row_frac=frac)
        return (feat ** 2).sum() + cnt.sum()

    f = jnp.asarray(feats)[None]
    g_plain = jax.grad(lambda f: loss(f, None))(f)
    g_frac = jax.jit(lambda f: jax.grad(lambda x: loss(x, 0.5))(f))(f)
    np.testing.assert_allclose(np.asarray(g_frac), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-5)
