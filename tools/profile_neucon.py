"""Component-level timing of the NeuralRecon fragment step on the live chip.

Times each stage of the pipeline in isolation (compiled, steady-state) so
optimization effort lands where the milliseconds are.  Not part of the test
suite; a developer tool like the reference's ProfilerHook
(/root/reference/deep3dmap/runners/hooks/profiler.py:12).

Timing methodology: each op is iterated inside ONE compiled ``lax.scan``
whose carry perturbs the next iteration's input (a chained data dependency),
and the scalar result is read back to the host.  Host-side loops with
``block_until_ready`` are NOT reliable here — the remote-TPU runtime
dispatches asynchronously and dedups/defers work, so they report the
dispatch floor (~0.05 ms) regardless of the op.  A scan-chained dispatch
with a final readback forces real sequential device execution; the fixed
dispatch+RTT cost is measured once via an empty scan and subtracted.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from deep3dmap_tpu.utils.misc import machine_cache_dir
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      machine_cache_dir("/tmp/jax_bench_cache"))

import jax
import jax.numpy as jnp
import numpy as np

_overhead_ms = None


def _leaf_sum(tree):
    leaves = [l for l in jax.tree_util.tree_leaves(tree)
              if hasattr(l, "dtype")]
    return sum(l.astype(jnp.float32).sum() for l in leaves)


def _perturb(args, s):
    """Thread the carry into the first perturbable leaf (data dependency)."""
    leaves, treedef = jax.tree_util.tree_flatten(args)
    fidx = next((i for i, l in enumerate(leaves)
                 if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)),
                None)
    if fidx is None:
        fidx = next((i for i, l in enumerate(leaves)
                     if hasattr(l, "dtype")
                     and jnp.issubdtype(l.dtype, jnp.integer)), None)
    out = list(leaves)
    if fidx is not None:
        l = leaves[fidx]
        if jnp.issubdtype(l.dtype, jnp.floating):
            out[fidx] = l + (s * 1e-30).astype(l.dtype)
        else:
            out[fidx] = l + (s * 1e-30).astype(l.dtype)  # adds traced zero
    return jax.tree_util.tree_unflatten(treedef, out)


def _measure_overhead():
    global _overhead_ms
    if _overhead_ms is not None:
        return _overhead_ms
    f = jax.jit(lambda x: jax.lax.scan(
        lambda c, _: (c * 1.0000001, None), x, None, length=2)[0])
    x = jnp.float32(1.0)
    float(np.asarray(f(x)))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(f(x)))
        ts.append(time.perf_counter() - t0)
    _overhead_ms = min(ts) * 1000
    return _overhead_ms


def timeit(fn, *args, iters=20, label=""):
    """Scan-chained timing: real device ms/iter (dispatch overhead removed)."""
    ovh = _measure_overhead()

    @jax.jit
    def looped(args):
        def body(s, _):
            out = fn(*_perturb(args, s))
            return _leaf_sum(out) * 1e-30 + s, None
        s, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return s

    float(np.asarray(looped(args)))  # compile + warm
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        float(np.asarray(looped(args)))
        ts.append(time.perf_counter() - t0)
    dt = (min(ts) * 1000 - ovh) / iters
    print(f"{label:<42s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    from deep3dmap_tpu.datasets.builder import _stack_samples
    from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
    from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon

    n_views = 9
    model_cfgs = dict(
        N_LAYER=3, N_VOX=[96, 96, 96], VOXEL_SIZE=0.04,
        TRAIN_NUM_SAMPLE=[4096, 16384, 65536],
        FUSION=dict(FUSION_ON=True, FULL=True), LW=[1.0, 0.8, 0.64],
        THRESHOLDS=[0, 0, 0], POS_WEIGHT=1.5, BACKBONE2D=dict(ARC="fpn-mnas-1"))
    fw = NeuralRecon(model_cfgs)
    sample = make_fragment_sample(seed=0, n_views=n_views, img_size=(480, 640),
                                  n_vox=96, voxel_size=0.04)
    batch = jax.device_put(_stack_samples([sample]))
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)

    # full forward_test
    f_full = jax.jit(lambda p, s, b: fw.forward_test(p, s, b))
    timeit(f_full, params, mstate, batch, label="forward_test (full)")

    # backbone alone
    net = fw.net
    import flax.linen as nn
    from deep3dmap_tpu.models.backbones.fpn2d import MnasFPN
    from deep3dmap_tpu.models.frameworks.neuralrecon import _FPNStep

    def fpn_only(p, imgs):
        ScanFPN = nn.scan(nn.remat(_FPNStep), variable_broadcast="params",
                          split_rngs={"params": False}, in_axes=0, out_axes=0)
        imgs_v = jnp.moveaxis(imgs, 1, 0)
        mod = ScanFPN(alpha=1.0, norm="gn")
        return mod.apply({"params": p["params"]["backbone2d"]}, None, imgs_v)[1]

    timeit(jax.jit(fpn_only), params, batch["imgs"], label="2D backbone (9 views, scanned)")

    # back-projection per level
    from deep3dmap_tpu.ops.back_project import (back_project_batch,
                                                back_project_masked_batch)
    pyr_c = [24, 40, 80]
    for i, (dim, interval, scale) in enumerate([(24, 4, 2), (48, 2, 1), (96, 1, 0)]):
        H, W = 480 // (4 * 2 ** scale), 640 // (4 * 2 ** scale)
        feats = jnp.zeros((1, n_views, H, W, pyr_c[scale]), jnp.float32)
        proj = batch["proj_matrices"][:, :, scale]
        if fw.num_sample[i] is not None and fw.num_sample[i] < dim ** 3:
            mask = jnp.ones((1, dim, dim, dim), bool)
            fn = jax.jit(lambda f, p, o, m, cap=fw.num_sample[i], d=dim, iv=interval:
                         back_project_masked_batch(f, p, o, m, cap, d, 0.04, iv,
                                                   gather_dtype=jnp.bfloat16))
            timeit(fn, feats, proj, batch["vol_origin_partial"], mask,
                   label=f"back_project L{i} ({dim}^3 cap={fw.num_sample[i]})")
        else:
            fn = jax.jit(lambda f, p, o, d=dim, iv=interval:
                         back_project_batch(f, p, o, d, 0.04, iv,
                                            gather_dtype=jnp.bfloat16))
            timeit(fn, feats, proj, batch["vol_origin_partial"],
                   label=f"back_project L{i} ({dim}^3 dense)")

    # UNet3D per level
    from deep3dmap_tpu.models.modulars.dense3d import UNet3D
    in_ch = [24 + 1 + 3, 40 + 1 + 96 + 1 + 1 + 3, 80 + 1 + 48 + 1 + 1 + 3]
    for i, dim in enumerate([24, 48, 96]):
        m = UNet3D(fw.out_channels[i], cr=1.0 / (2 ** i))
        x = jnp.zeros((1, dim, dim, dim, in_ch[i]), jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x)
        timeit(jax.jit(m.apply), p, x, label=f"UNet3D L{i} ({dim}^3, cr=1/{2**i})")

    # ConvGRU per level
    from deep3dmap_tpu.models.modulars.conv_gru3d import ConvGRU3D
    for i, dim in enumerate([24, 48, 96]):
        m = ConvGRU3D(fw.out_channels[i])
        h = jnp.zeros((1, dim, dim, dim, fw.out_channels[i]), jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), h, h)
        timeit(jax.jit(m.apply), p, h, h, label=f"ConvGRU3D L{i} ({dim}^3)")

    profile_block(fw, batch, n_views)


def profile_block(fw_dense, batch, n_views):
    """Block-sparse path: full forward + per-component timings."""
    from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon
    from deep3dmap_tpu.ops.back_project import back_project_sparse
    from deep3dmap_tpu.ops.block_sparse import (
        block_mask_from_voxels, block_voxel_indices, blocks_to_dense,
        dense_to_blocks, gather_halo, select_blocks)
    from deep3dmap_tpu.models.modulars.block_dense3d import (BlockConvGRU3D,
                                                             BlockUNet3D)

    print("---- block-sparse path ----")
    model_cfgs = dict(
        N_LAYER=3, N_VOX=[96, 96, 96], VOXEL_SIZE=0.04,
        TRAIN_NUM_SAMPLE=[4096, 16384, 65536],
        FUSION=dict(FUSION_ON=True, FULL=True), LW=[1.0, 0.8, 0.64],
        THRESHOLDS=[0, 0, 0], POS_WEIGHT=1.5,
        BACKBONE2D=dict(ARC="fpn-mnas-1"),
        SPARSE_MODE="block", BLOCK_SIZE=8)
    fw = NeuralRecon(model_cfgs)
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    f_full = jax.jit(lambda p, s, b: fw.forward_test(p, s, b))
    timeit(f_full, params, mstate, batch, label="forward_test (block, full)")

    pyr_c = [24, 40, 80]
    for i, (dim, interval, scale, maxb) in enumerate(
            [(48, 2, 1, fw.max_blocks[1]), (96, 1, 0, fw.max_blocks[2])]):
        bs = 8
        nb = dim // bs
        H, W = 480 // (4 * 2 ** scale), 640 // (4 * 2 ** scale)
        feats = jnp.zeros((1, n_views, H, W, pyr_c[scale]), jnp.float32)
        proj = batch["proj_matrices"][:, :, scale]
        C = fw.out_channels[i + 1]

        mask = jnp.zeros((1, dim // 2, dim // 2, dim // 2), bool
                         ).at[:, ::3, ::3, ::3].set(True)
        sel = jax.jit(lambda m, maxb=maxb, bs=bs: select_blocks(
            block_mask_from_voxels(m, bs // 2), maxb, bs))
        timeit(sel, mask, label=f"select_blocks L{i+1} (maxb={maxb})")
        bset = sel(mask)
        # jit outputs turn static NamedTuple ints into arrays — restore them
        bset = bset._replace(nb=nb, bs=bs)
        vidx = block_voxel_indices(bset)
        slot_valid = jnp.repeat(bset.valid, bs ** 3, axis=1)

        from functools import partial as _p
        bp = jax.jit(jax.vmap(_p(back_project_sparse, dim=dim,
                                 voxel_size=0.04, interval=interval,
                                 gather_dtype=jnp.bfloat16)))
        timeit(bp, feats, proj, batch["vol_origin_partial"], vidx, slot_valid,
               label=f"back_project_sparse L{i+1} ({maxb} blocks)")

        blk = jnp.zeros((1, maxb, bs, bs, bs, C), jnp.float32)
        timeit(jax.jit(lambda b, bset=bset: gather_halo(b, bset)), blk,
               label=f"gather_halo L{i+1}")
        timeit(jax.jit(lambda b, bset=bset: blocks_to_dense(b, bset)), blk,
               label=f"blocks_to_dense L{i+1}")
        vol = jnp.zeros((1, dim, dim, dim, C), jnp.float32)
        timeit(jax.jit(lambda v, bset=bset: dense_to_blocks(v, bset)), vol,
               label=f"dense_to_blocks L{i+1}")

        cin = [0, 40 + 1 + 96 + 1 + 1 + 3, 80 + 1 + 48 + 1 + 1 + 3][i + 1]
        m = BlockUNet3D(C, cr=1.0 / (2 ** (i + 1)))
        x = jnp.zeros((1, maxb, bs, bs, bs, cin), jnp.float32)
        p = jax.jit(m.init)(jax.random.PRNGKey(0), x, bset)
        timeit(jax.jit(m.apply), p, x, bset,
               label=f"BlockUNet3D L{i+1} ({maxb} blocks)")

        g = BlockConvGRU3D(C)
        hp = jax.jit(g.init)(jax.random.PRNGKey(0), blk, blk, bset)
        timeit(jax.jit(g.apply), hp, blk, blk, bset,
               label=f"BlockConvGRU3D L{i+1} ({maxb} blocks)")


if __name__ == "__main__":
    main()
