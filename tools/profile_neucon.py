"""Component-level timing of the NeuralRecon fragment step on the live chip.

Times each stage of the pipeline in isolation (compiled, steady-state) so
optimization effort lands where the milliseconds are.  Not part of the test
suite; a developer tool like the reference's ProfilerHook
(/root/reference/deep3dmap/runners/hooks/profiler.py:12).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_bench_cache")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20, label=""):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{label:<42s} {dt:8.2f} ms")
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


if __name__ == "__main__":
    main()
