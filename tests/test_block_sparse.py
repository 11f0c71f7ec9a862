"""Block-sparse voxel ops + block-domain conv stacks."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep3dmap_tpu.ops.block_sparse import (
    BlockSet, block_mask_from_voxels, block_voxel_indices, blocks_to_dense,
    dense_to_blocks, gather_halo, select_blocks)


def _random_case(seed=0, d=16, bs=4, maxb=32, B=2, C=3, density=0.005):
    rs = np.random.default_rng(seed)
    nb = d // bs
    vox_mask = rs.random((B, d, d, d)) < density
    vol = rs.normal(size=(B, d, d, d, C)).astype(np.float32)
    bm = block_mask_from_voxels(jnp.asarray(vox_mask), bs)
    bset = select_blocks(bm, maxb, bs)
    return vol, vox_mask, bm, bset, nb


def test_select_blocks_roundtrip():
    vol, vox_mask, bm, bset, nb = _random_case()
    n_active = int(np.asarray(bm).sum(axis=(1, 2, 3)).max())
    assert n_active <= bset.ids.shape[1]
    # slot_of inverts ids for valid slots
    ids = np.asarray(bset.ids)
    valid = np.asarray(bset.valid)
    slot = np.asarray(bset.slot_of)
    for b in range(ids.shape[0]):
        for s in range(ids.shape[1]):
            if valid[b, s]:
                assert slot[b, ids[b, s]] == s
    # inactive blocks map to -1
    for b in range(ids.shape[0]):
        active = set(ids[b, valid[b]].tolist())
        for blk in range(slot.shape[1]):
            if blk not in active:
                assert slot[b, blk] == -1


def test_dense_blocks_roundtrip():
    vol, vox_mask, bm, bset, nb = _random_case()
    jvol = jnp.asarray(vol)
    blocks = dense_to_blocks(jvol, bset)
    back = np.asarray(blocks_to_dense(blocks, bset))
    # active blocks reproduce exactly; inactive read as 0
    bm_np = np.asarray(bm)
    bs = bset.bs
    for b in range(vol.shape[0]):
        for i in range(nb):
            for j in range(nb):
                for k in range(nb):
                    sl = np.s_[b, i*bs:(i+1)*bs, j*bs:(j+1)*bs, k*bs:(k+1)*bs]
                    if bm_np[b, i, j, k]:
                        np.testing.assert_array_equal(back[sl], vol[sl])
                    else:
                        assert np.all(back[sl] == 0)


def test_gather_halo_matches_dense_neighborhood():
    vol, vox_mask, bm, bset, nb = _random_case(seed=1)
    jvol = jnp.asarray(vol)
    bs = bset.bs
    # zero inactive blocks in the dense reference (halo reads them as 0)
    dense_masked = np.asarray(blocks_to_dense(dense_to_blocks(jvol, bset), bset))
    padded = np.pad(dense_masked, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))

    blocks = dense_to_blocks(jvol, bset)
    halos = np.asarray(gather_halo(blocks, bset, halo=1))
    ids = np.asarray(bset.ids)
    valid = np.asarray(bset.valid)
    for b in range(vol.shape[0]):
        for s in range(ids.shape[1]):
            if not valid[b, s]:
                continue
            bx, by, bz = np.unravel_index(ids[b, s], (nb, nb, nb))
            want = padded[b, bx*bs:bx*bs+bs+2, by*bs:by*bs+bs+2,
                          bz*bs:bz*bs+bs+2]
            np.testing.assert_array_equal(halos[b, s], want)


def test_block_voxel_indices_match_grid():
    vol, vox_mask, bm, bset, nb = _random_case(seed=2)
    d = nb * bset.bs
    idx = np.asarray(block_voxel_indices(bset))
    ids = np.asarray(bset.ids)
    valid = np.asarray(bset.valid)
    bs3 = bset.bs ** 3
    for b in range(ids.shape[0]):
        for s in range(ids.shape[1]):
            if not valid[b, s]:
                continue
            vox = idx[b, s*bs3:(s+1)*bs3]
            xs, ys, zs = vox // (d*d), (vox // d) % d, vox % d
            bx, by, bz = np.unravel_index(ids[b, s], (nb, nb, nb))
            assert xs.min() == bx*bset.bs and xs.max() == bx*bset.bs+bset.bs-1
            assert ys.min() == by*bset.bs and ys.max() == by*bset.bs+bset.bs-1
            assert zs.min() == bz*bset.bs and zs.max() == bz*bset.bs+bset.bs-1
            assert len(set(vox.tolist())) == bs3


def test_block_conv_matches_dense_conv():
    """A stride-1 BlockConv3D on a fully-active volume == dense SAME conv."""
    import flax.linen as nn
    from deep3dmap_tpu.models.modulars.block_dense3d import BlockConv3D

    rs = np.random.default_rng(3)
    d, bs, C = 8, 4, 5
    vol = jnp.asarray(rs.normal(size=(1, d, d, d, C)).astype(np.float32))
    bm = jnp.ones((1, d // bs, d // bs, d // bs), bool)
    bset = select_blocks(bm, (d // bs) ** 3, bs)
    blocks = dense_to_blocks(vol, bset)

    mdl = BlockConv3D(7)
    params = mdl.init(jax.random.PRNGKey(0), blocks, bset)
    out_blocks = mdl.apply(params, blocks, bset)
    out_dense = np.asarray(blocks_to_dense(out_blocks, bset))

    kernel = params["params"]["Conv_0"]["kernel"]
    ref = nn.Conv(7, (3, 3, 3), padding="SAME", use_bias=False).apply(
        {"params": {"kernel": kernel}}, vol)
    np.testing.assert_allclose(out_dense, np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_block_unet_and_gru_shapes_and_masking():
    from deep3dmap_tpu.models.modulars.block_dense3d import (BlockConvGRU3D,
                                                             BlockUNet3D)

    rs = np.random.default_rng(4)
    d, bs, maxb, C = 16, 8, 6, 10
    vox = rs.random((1, d, d, d)) < 0.2
    bm = block_mask_from_voxels(jnp.asarray(vox), bs)
    bset = select_blocks(bm, maxb, bs)
    x = jnp.asarray(rs.normal(size=(1, maxb, bs, bs, bs, C)).astype(np.float32))

    unet = BlockUNet3D(12, cr=0.25)
    p = unet.init(jax.random.PRNGKey(0), x, bset)
    y = unet.apply(p, x, bset)
    assert y.shape == (1, maxb, bs, bs, bs, 12)
    # padding slots stay zero
    v = np.asarray(bset.valid[0])
    assert np.all(np.asarray(y)[0, ~v] == 0)
    assert np.isfinite(np.asarray(y)).all()

    h = jnp.asarray(rs.normal(size=(1, maxb, bs, bs, bs, 12)).astype(np.float32))
    gru = BlockConvGRU3D(12)
    gp = gru.init(jax.random.PRNGKey(1), h, y, bset)
    h2 = gru.apply(gp, h, y, bset)
    assert h2.shape == h.shape
    assert np.all(np.asarray(h2)[0, ~v] == 0)


@pytest.mark.slow
def test_block_unet_grads_flow():
    from deep3dmap_tpu.models.modulars.block_dense3d import BlockUNet3D

    rs = np.random.default_rng(5)
    d, bs, maxb, C = 16, 8, 4, 6
    vox = rs.random((1, d, d, d)) < 0.3
    bset = select_blocks(block_mask_from_voxels(jnp.asarray(vox), bs), maxb, bs)
    x = jnp.asarray(rs.normal(size=(1, maxb, bs, bs, bs, C)).astype(np.float32))
    unet = BlockUNet3D(4, cr=0.25)
    p = unet.init(jax.random.PRNGKey(0), x, bset)

    def loss(p):
        return jnp.square(unet.apply(p, x, bset)).sum()

    g = jax.grad(loss)(p)
    gn = sum(float(jnp.abs(l).sum()) for l in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
