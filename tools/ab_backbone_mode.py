"""Chip A/B: 2D backbone `scan` (per-view nn.scan) vs `batch` (views folded
into the conv batch) at the production bench shape.

The scanned form minimizes activation memory but pays output-stacking layout
copies every view (r4 trace: ~1.9 ms/step VMEM-write-bound `copy` ops at
9 views) and runs each conv at batch 1.  The batched form runs each conv at
batch V.  Usage: python tools/ab_backbone_mode.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from deep3dmap_tpu.utils.misc import machine_cache_dir

jax.config.update("jax_compilation_cache_dir",
                  machine_cache_dir("/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import optax

from deep3dmap_tpu.datasets.builder import _stack_samples
from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon


def build(mode):
    model_cfgs = dict(
        N_LAYER=3, N_VOX=[96, 96, 96], VOXEL_SIZE=0.04,
        TRAIN_NUM_SAMPLE=[4096, 16384, 65536],
        FUSION=dict(FUSION_ON=True, FULL=True), LW=[1.0, 0.8, 0.64],
        THRESHOLDS=[0, 0, 0], POS_WEIGHT=1.5,
        SPARSE_MODE="block", BLOCK_SIZE=8,
        GLOBAL_DTYPE="bfloat16", BLOCK_DTYPE="bfloat16",
        BACKBONE2D=dict(ARC="fpn-mnas-1", DTYPE="bfloat16", MODE=mode,
                        INFER_MODE=mode))
    return NeuralRecon(model_cfgs)


def time_compiled(fn, *args, iters):
    compiled = jax.jit(fn).lower(*args).compile()
    out = compiled(*args)
    jax.block_until_ready(out)
    # fresh input buffers: the remote runtime dedups repeated identical calls
    targs = jax.tree_util.tree_map(
        lambda x: x.copy() if hasattr(x, "copy") else x, args)
    jax.block_until_ready(targs)
    t0 = time.perf_counter()
    out = compiled(*targs)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    n_views = 9
    sample = make_fragment_sample(seed=0, n_views=n_views, img_size=(480, 640),
                                  n_vox=96, voxel_size=0.04)
    batch = jax.device_put(_stack_samples([sample]))

    for mode in ("scan", "batch"):
        fw = build(mode)
        params, mstate = fw.init(jax.random.PRNGKey(0), batch)

        iters = 10

        def stream(params, mstate, batch):
            def body(carry, _):
                out, new_state = fw.forward_test(params, carry, batch)
                return new_state, out["tsdf"].sum()
            mstate, sums = jax.lax.scan(body, mstate, None, length=iters)
            return sums.sum()

        infer_dt = time_compiled(stream, params, mstate, batch, iters=iters)

        tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
        opt_state = tx.init(params)
        rng0 = jax.random.PRNGKey(1)
        train_iters = 5

        def train_stream(params, opt_state, mstate, rng, batch):
            def body(carry, _):
                params, opt_state, mstate, rng = carry
                rng, sub = jax.random.split(rng)
                (loss, aux), grads = jax.value_and_grad(
                    fw.loss_fn, has_aux=True)(params, mstate, batch, sub)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state, aux["model_state"], rng), loss
            carry, losses = jax.lax.scan(
                body, (params, opt_state, mstate, rng), None,
                length=train_iters)
            return losses.sum()

        train_dt = time_compiled(train_stream, params, opt_state, mstate,
                                 rng0, batch, iters=train_iters)
        print(f"mode={mode:5s}  infer {infer_dt*1e3:7.2f} ms "
              f"({n_views/infer_dt:6.1f} kf/s)   train {train_dt*1e3:7.2f} ms "
              f"({n_views/train_dt:5.1f} kf/s)", flush=True)


if __name__ == "__main__":
    main()
