"""Chip A/B: back-projection scatter-VJP valid-row compaction
(BP_GRAD_FRAC) at the production bench shape.

The r4 trace showed the per-view scatter VJPs (`fusion.16977/.16981/.16986`)
at 12.8 ms/step, row-rate-bound; ~29% of rows are out-of-frustum on the
bench sample, so compacting the backward to valid rows (exact — cond falls
back to the full scatter on overflow) should cut scatter time by the invalid
fraction.  Usage: python tools/ab_scatter_cap.py [frac ...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from deep3dmap_tpu.utils.misc import machine_cache_dir

jax.config.update("jax_compilation_cache_dir",
                  machine_cache_dir("/tmp/jax_bench_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np
import optax

from bench import _compile_and_time
from deep3dmap_tpu.datasets.builder import _stack_samples
from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon


def build(frac):
    model_cfgs = dict(
        N_LAYER=3, N_VOX=[96, 96, 96], VOXEL_SIZE=0.04,
        TRAIN_NUM_SAMPLE=[4096, 16384, 65536],
        FUSION=dict(FUSION_ON=True, FULL=True), LW=[1.0, 0.8, 0.64],
        THRESHOLDS=[0, 0, 0], POS_WEIGHT=1.5,
        SPARSE_MODE="block", BLOCK_SIZE=8,
        GLOBAL_DTYPE="bfloat16", BLOCK_DTYPE="bfloat16",
        BACKBONE2D=dict(ARC="fpn-mnas-1", DTYPE="bfloat16", MODE="batch",
                        REMAT=False, INFER_MODE="batch"))
    if frac is not None:
        model_cfgs["BP_GRAD_FRAC"] = frac
    return NeuralRecon(model_cfgs)


def main():
    fracs = [None] + [float(a) for a in sys.argv[1:]] or [None, 0.75]
    if len(fracs) == 1:
        fracs = [None, 0.625, 0.75, 0.875]
    n_views = 9
    sample = make_fragment_sample(seed=0, n_views=n_views, img_size=(480, 640),
                                  n_vox=96, voxel_size=0.04)
    batch = jax.device_put(_stack_samples([sample]))

    for frac in fracs:
        fw = build(frac)
        params, mstate = fw.init(jax.random.PRNGKey(0), batch)
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

        train_dt = _compile_and_time(train_stream, params, opt_state, mstate,
                                     rng0, batch, iters=train_iters)
        print(f"BP_GRAD_FRAC={str(frac):6s}  train {train_dt*1e3:7.2f} ms "
              f"({n_views/train_dt:5.1f} kf/s)", flush=True)


if __name__ == "__main__":
    main()
