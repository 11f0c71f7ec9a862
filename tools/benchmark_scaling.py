#!/usr/bin/env python
"""Multi-device scaling report for NeuralRecon training.

The BASELINE.md report surface: frames/s/chip at 1 chip and scaling
efficiency over an N-device mesh.  On a machine with one real TPU the
N-device points run on a virtual CPU mesh (relative efficiency is
meaningful; absolute CPU numbers are not) — on a pod slice they run on real
chips.

Usage:
    python tools/benchmark_scaling.py [--devices 1 2 4 8] [--platform cpu]
"""
import argparse
import json
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"])
    p.add_argument("--n-vox", type=int, default=24)
    p.add_argument("--img", type=int, default=48)
    p.add_argument("--views", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--block", action="store_true",
                   help="block-sparse fine levels (the bench.py headline "
                        "path) instead of dense-masked")
    p.add_argument("--modes", nargs="+", default=None,
                   choices=["dense", "block"],
                   help="run several modes into one report (overrides --block)")
    p.add_argument("--out", default=None,
                   help="write the report json here (e.g. SCALING_r04.json)")
    return p.parse_args()


def bench_n(n_devices, args):
    import jax
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from deep3dmap_tpu.datasets.builder import _stack_samples
    from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
    from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon
    from deep3dmap_tpu.parallel import make_mesh
    from deep3dmap_tpu.runners.train_state import TrainState

    mesh = make_mesh(axes=("data",), shape=(n_devices,))
    cfg = dict(
        N_LAYER=3, N_VOX=[args.n_vox] * 3, VOXEL_SIZE=0.08,
        FUSION=dict(FUSION_ON=True, FULL=True),
        BACKBONE2D=dict(ARC="fpn-mnas-0.5"))
    if getattr(args, "_mode", "dense") == "block":
        bs = 8 if args.n_vox % 8 == 0 else 4
        nb_mid, nb_fine = (args.n_vox // 2) // bs, args.n_vox // bs
        cfg.update(SPARSE_MODE="block", BLOCK_SIZE=bs,
                   MAX_BLOCKS=[None, max(nb_mid ** 3 // 2, 2),
                               max(nb_fine ** 3 // 4, 4)],
                   GLOBAL_DTYPE="bfloat16", BLOCK_DTYPE="bfloat16")
    fw = NeuralRecon(cfg)
    samples = [make_fragment_sample(seed=i, n_views=args.views,
                                    img_size=(args.img, args.img),
                                    n_vox=args.n_vox, voxel_size=0.08)
               for i in range(n_devices)]
    batch = _stack_samples(samples)

    params, mstate = fw.init(jax.random.PRNGKey(0), batch)
    tx = optax.adam(1e-3)
    state = TrainState.create(jax.random.PRNGKey(1), params, tx, mstate)

    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data"))
    put = lambda x, s: jax.device_put(jnp.asarray(x), s)
    batch = jax.tree_util.tree_map(
        lambda x: put(x, dp if np_leading(x, n_devices) else repl), batch)
    state = state.replace(
        params=jax.tree_util.tree_map(lambda x: put(x, repl), state.params),
        opt_state=jax.tree_util.tree_map(lambda x: put(x, repl), state.opt_state),
        model_state=jax.tree_util.tree_map(
            lambda x: put(x, dp if np_leading(x, n_devices) else repl),
            state.model_state),
        rng=put(state.rng, repl), step=put(state.step, repl))

    def train_step(state, batch):
        rng, sub = jax.random.split(state.rng)
        (loss, aux), grads = jax.value_and_grad(fw.loss_fn, has_aux=True)(
            state.params, state.model_state, batch, sub)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state, model_state=aux["model_state"],
                             rng=rng), loss

    step = jax.jit(train_step, donate_argnums=(0,))
    with mesh:
        state, loss = step(state, batch)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, loss = step(state, batch)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters
    frames = n_devices * args.views
    return frames / dt


def np_leading(x, n):
    import numpy as np

    x = np.asarray(x)
    return x.ndim >= 1 and x.shape[0] == n


def main():
    args = parse_args()
    if args.platform:
        os.environ["D3M_PLATFORM"] = args.platform
    from deep3dmap_tpu.utils.misc import maybe_force_platform

    os.environ.setdefault("D3M_PLATFORM", "cpu")
    os.environ.setdefault("D3M_NUM_DEVICES", str(max(args.devices)))
    maybe_force_platform()

    import jax

    avail = len(jax.devices())
    modes = args.modes or (["block"] if args.block else ["dense"])
    report = {}
    for mode in modes:
        args._mode = mode
        rows = []
        base = None
        for n in args.devices:
            if n > avail:
                continue
            fps = bench_n(n, args)
            if base is None:
                base = fps
            eff = fps / (base * n)
            rows.append(dict(devices=n, frames_per_s=round(fps, 2),
                             scaling_efficiency=round(eff, 3)))
            print(json.dumps(dict(mode=mode, **rows[-1])))
        report[mode] = rows
    out = {"report": "neuralrecon_train_scaling", "modes": report,
           "n_vox": args.n_vox, "views": args.views,
           "platform": jax.devices()[0].platform}
    if out["platform"] == "cpu":
        out["note"] = ("virtual CPU devices share one host's cores: total "
                       "compute does NOT grow with N, so efficiency ~1/N here "
                       "validates only correctness/compilation of the sharded "
                       "step; run on a pod slice for real scaling numbers")
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
