"""Benchmark: NeuralRecon fragment reconstruction throughput on TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N,
... training + MFU report fields ...}.

Baseline: upstream NeuralRecon paper reports ~33 keyframes/s on an RTX 2080 Ti
(BASELINE.md; the reference repo publishes no numbers of its own, and its demo
harness computes keyframes/s the same way — /root/reference/demos/
demo_neucon.py:108-115).  vs_baseline = our keyframes/s / 33.

Beyond the inference headline, this reports the BASELINE.md "north star"
surface: chip-measured *training* keyframes/s (jitted value_and_grad + optax
step at production shape) and MFU (XLA cost-analysis FLOPs / step-time /
chip bf16 peak) for both the train and inference steps.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from deep3dmap_tpu.utils.misc import machine_cache_dir

def _enable_compile_cache():
    # must go through jax.config: under axon, jax is imported at interpreter
    # start, so JAX_COMPILATION_CACHE_DIR set here would be ignored
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR")
                      or machine_cache_dir("/tmp/jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_KEYFRAMES_PER_S = 33.0

# per-chip bf16 peak FLOP/s by device kind (substring match).  MXU matmuls
# run bf16 here, so the bf16 peak is the speed-of-light reference.
_PEAK_BF16 = [
    ("v6e", 918e12), ("v6 lite", 918e12),
    ("v5p", 459e12), ("v5 lite", 197e12), ("v5e", 197e12),
    ("v4", 275e12), ("v3", 123e12), ("v2", 45e12),
]


def _chip_peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind:
        return 0.0
    for key, peak in _PEAK_BF16:
        if key in kind:
            return peak
    return 0.0


# per-chip HBM bandwidth by device kind — the binding resource for this
# gather-heavy workload (back-projection + block gathers), so BW utilization
# is the meaningful speed-of-light figure alongside MFU.
_PEAK_HBM_BPS = [
    ("v6e", 1640e9), ("v6 lite", 1640e9),
    ("v5p", 2765e9), ("v5 lite", 819e9), ("v5e", 819e9),
    ("v4", 1228e9), ("v3", 900e9), ("v2", 700e9),
]


def _chip_peak_bw(device) -> float:
    kind = getattr(device, "device_kind", "").lower()
    if "tpu" not in kind:
        return 0.0
    for key, peak in _PEAK_HBM_BPS:
        if key in kind:
            return peak
    return 0.0


def _compiled_cost(compiled):
    """(flops, bytes_accessed) of a compiled executable from XLA's own
    cost analysis."""
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return (float(cost.get("flops", 0.0)),
                float(cost.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def _compile_and_time(fn, *args, iters):
    """AOT-compile once; returns seconds per inner iteration.

    ``fn`` must return a scalar.  Each timed call carries a fresh 4-byte
    "salt" input folded into the output: the remote-chip runtime dedups a
    repeated call whose input buffers are all identical (returning the
    cached result in ~0 ms, which would inflate throughput absurdly), and
    re-registering fresh copies of the BIG buffers instead pays hundreds of
    ms of tunnel RPC — the salt defeats dedup while the big buffers stay
    registered.  Best of 2 guards against one-off dispatch hiccups."""
    import jax
    import jax.numpy as jnp

    def salted(salt, *a):
        return fn(*a) + salt * 1e-30

    compiled = jax.jit(salted).lower(jnp.float32(0), *args).compile()
    out = compiled(jnp.float32(0), *args)   # warmup (first run allocates)
    jax.block_until_ready(out)
    times = []
    for i in (1, 2, 3):
        s = jax.device_put(jnp.float32(i))
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        out = compiled(s, *args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    # the remote runtime intermittently completes a call's future early
    # (r5: a 10-step scan "measured" 0.04 ms against 18.9 ms of traced
    # device-busy time), so a bare min() can pick a phantom: discard
    # samples under half the slowest before taking the min
    hi = max(times)
    real = [t for t in times if t >= 0.5 * hi] or times
    return min(real) / iters


def _cost_of(fn, *args):
    """(flops, bytes) of ONE step.  Must be measured on an unscanned step:
    XLA's cost analysis counts a while/scan body once regardless of trip
    count, so dividing a scanned program's cost by its length undercounts
    (r3 finding: the block forward is ~169 GF / ~33 GB per fragment, not
    the 17 GF a scan/10 read suggested)."""
    import jax
    return _compiled_cost(jax.jit(fn).lower(*args).compile())


def main():
    cpu_probe = "--cpu-probe" in sys.argv
    if cpu_probe:
        # same-harness CPU baseline (BASELINE.md "≥2x frames/s/chip vs CPU
        # baseline" — recorded as a measured fact, not an inference): the
        # parent bench invokes this file as a subprocess with
        # D3M_PLATFORM=cpu; we time a short compiled inference scan and
        # print one number
        from deep3dmap_tpu.utils.misc import maybe_force_platform

        maybe_force_platform()
    import jax

    _enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deep3dmap_tpu.datasets.builder import _stack_samples
    from deep3dmap_tpu.datasets.synthetic import make_fragment_sample
    from deep3dmap_tpu.models.frameworks.neuralrecon import NeuralRecon

    n_views = 9
    # production fragment shape: 9 views, 640x480 imgs, 96^3 partial volume
    model_cfgs = dict(
        N_LAYER=3, N_VOX=[96, 96, 96], VOXEL_SIZE=0.04,
        TRAIN_NUM_SAMPLE=[4096, 16384, 65536],
        FUSION=dict(FUSION_ON=True, FULL=True), LW=[1.0, 0.8, 0.64],
        THRESHOLDS=[0, 0, 0], POS_WEIGHT=1.5,
        # block-sparse fine levels: compute scales with occupancy like the
        # reference's sparse conv, but every matmul stays dense on the MXU
        SPARSE_MODE="block", BLOCK_SIZE=8,
        # bf16 on the bandwidth-bound paths (r4 chip A/B, PROFILE_r04.md):
        # recurrent hidden volumes, block UNet/GRU compute, and the 2D trunk
        # — params/accumulation stay fp32.  With the per-view scatter VJP and
        # the batched-views inference trunk (BACKBONE2D.INFER_MODE default):
        # infer 41.4->24.1 ms, train 156->113 ms on v5e
        GLOBAL_DTYPE="bfloat16", BLOCK_DTYPE="bfloat16",
        # r5 chip A/B (tools/ab_backbone_mode.py): the batched-views trunk
        # WITHOUT remat is the fastest train step (113.3 scan -> 106.4 ms;
        # bf16 activations for 9 views fit HBM, skipping the recompute pass
        # and the per-view scan's layout copies).  The inference net keeps
        # the remat annotation (faster in pure forward; see neuralrecon.py).
        BACKBONE2D=dict(ARC="fpn-mnas-1", DTYPE="bfloat16", MODE="batch",
                        REMAT=False, INFER_MODE="batch"))
    fw = NeuralRecon(model_cfgs)

    sample = make_fragment_sample(seed=0, n_views=n_views, img_size=(480, 640),
                                  n_vox=96, voxel_size=0.04)
    batch = _stack_samples([sample])

    # pin inputs on device: keyframes stream continuously in production, so
    # steady-state throughput excludes host->device upload of the same batch
    batch = jax.device_put(batch)
    params, mstate = fw.init(jax.random.PRNGKey(0), batch)

    # ---- inference: fragments streamed inside one compiled scan ----------
    # (recurrent state carried fragment-to-fragment) so per-dispatch
    # host/tunnel RPC latency does not masquerade as model time — matching
    # how a production streaming loop runs (async dispatch, pipelined input)
    iters = 2 if cpu_probe else 10


    def stream(params, mstate, batch):
        def body(carry, _):
            out, new_state = fw.forward_test(params, carry, batch)
            return new_state, out["tsdf"].sum()
        mstate, sums = jax.lax.scan(body, mstate, None, length=iters)
        return sums.sum()

    infer_dt = _compile_and_time(stream, params, mstate, batch, iters=iters)
    kf_per_s = n_views / infer_dt
    if cpu_probe:
        print(json.dumps({"cpu_keyframes_per_s": round(kf_per_s, 3)}))
        return

    def infer_once(params, mstate, batch):
        out, new_state = fw.forward_test(params, mstate, batch)
        return out["tsdf"], new_state

    infer_flops, infer_bytes = _cost_of(infer_once, params, mstate, batch)

    # ---- training: jitted value_and_grad + optax step, same shapes -------
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(1e-3))
    opt_state = tx.init(params)
    rng0 = jax.random.PRNGKey(1)

    def one_step(params, opt_state, mstate, rng, batch):
        rng, sub = jax.random.split(rng)
        (loss, aux), grads = jax.value_and_grad(fw.loss_fn, has_aux=True)(
            params, mstate, batch, sub)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux["model_state"], rng, loss

    train_iters = 5


    def train_stream(params, opt_state, mstate, rng, batch):
        def body(carry, _):
            params, opt_state, mstate, rng = carry
            params, opt_state, mstate, rng, loss = one_step(
                params, opt_state, mstate, rng, batch)
            return (params, opt_state, mstate, rng), loss
        carry, losses = jax.lax.scan(
            body, (params, opt_state, mstate, rng), None, length=train_iters)
        return losses.sum()

    train_dt = _compile_and_time(train_stream, params, opt_state, mstate,
                                 rng0, batch, iters=train_iters)
    train_kf_per_s = n_views / train_dt
    train_flops, train_bytes = _cost_of(one_step, params, opt_state, mstate,
                                        rng0, batch)

    # ---- streaming-input training: fresh batch per step ------------------
    # pays real per-step input cost (host batch -> shard_batch -> async H2D
    # via prefetch_to_device) instead of a pinned device batch; the ratio to
    # the pinned rate shows whether the input pipeline can starve the chip
    streaming_ratio = None
    streaming_kf_per_s = None
    try:
        from deep3dmap_tpu.datasets.builder import prefetch_to_device
        from deep3dmap_tpu.parallel.mesh import make_mesh

        mesh1 = make_mesh()
        # production stream payload: only the keys the step consumes, images
        # quantized to uint8 (device-side normalization in the framework) —
        # 4x fewer H2D bytes than the raw fp32 sample dict
        need = ("imgs", "proj_matrices", "vol_origin_partial",
                "world_to_aligned_camera", "tsdf_list", "occ_list",
                "vol_origin", "scene_reset")

        def pack(sample):
            b = _stack_samples([sample])
            b = {k: v for k, v in b.items() if k in need}
            b["imgs"] = np.rint(np.clip(b["imgs"], 0, 1) * 255).astype(np.uint8)
            return b

        n_stream = 12
        # every timed batch is DISTINCT (fresh host arrays): re-feeding the
        # same host arrays would let the remote runtime dedup whole steps
        host_batches = [pack(make_fragment_sample(
            seed=100 + s, n_views=n_views, img_size=(480, 640), n_vox=96,
            voxel_size=0.04)) for s in range(4 + n_stream)]
        step_once = jax.jit(one_step)
        carry = (params, opt_state, mstate, rng0)
        for devb in prefetch_to_device(host_batches[:4], mesh1):  # warm compile
            p, o, m, r, _ = step_once(*carry, devb)
            carry = (p, o, m, r)
        jax.block_until_ready(carry[0])
        t0 = time.perf_counter()
        for devb in prefetch_to_device(host_batches[4:], mesh1):
            p, o, m, r, _ = step_once(*carry, devb)
            carry = (p, o, m, r)
        jax.block_until_ready(carry[0])
        stream_dt = (time.perf_counter() - t0) / n_stream
        streaming_kf_per_s = n_views / stream_dt
        streaming_ratio = streaming_kf_per_s / train_kf_per_s
    except Exception:
        import traceback

        sys.stderr.write("bench: streaming section failed:\n"
                         + traceback.format_exc())

    # ---- measured utilization from a device trace ------------------------
    # XLA cost-analysis "bytes accessed" double-counts reuse (r3: >100% of
    # physical HBM BW); the profiler's per-op measured BW x self-time is the
    # traffic the HBM actually served, so utilization here cannot exceed 1
    measured = {}
    try:
        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.abspath(__file__)), "tools"))
        from trace_profile import capture_trace, parse_hlo_stats, summarize
        import tempfile

        peak = _chip_peak_flops(jax.devices()[0])
        peak_bw = _chip_peak_bw(jax.devices()[0])
        for name, fn, fargs, trips, wall in (
                ("infer", stream, (params, mstate, batch), iters, infer_dt),
                ("train", train_stream,
                 (params, opt_state, mstate, rng0, batch), train_iters,
                 train_dt)):
            compiled = jax.jit(fn).lower(*fargs).compile()
            jax.block_until_ready(compiled(*fargs))
            paths = capture_trace(compiled, fargs,
                                  tempfile.mkdtemp(prefix="d3m_bench_tr_"),
                                  warm=False)
            s = summarize(parse_hlo_stats(paths), trips, wall, peak_bw, peak)
            measured[f"measured_{name}_hbm_bw_util"] = round(
                s["bw_util_wall"], 4) if s["bw_util_wall"] else None
            measured[f"measured_{name}_gib_per_step"] = round(
                s["bytes_per_step"] / 2 ** 30, 3)
            measured[f"{name}_device_busy_frac"] = round(
                s["busy_ms_per_step"] / s["step_wall_ms"], 3)
    except Exception:
        import traceback

        sys.stderr.write("bench: measured-trace section failed:\n"
                         + traceback.format_exc())

    peak = _chip_peak_flops(jax.devices()[0])
    peak_bw = _chip_peak_bw(jax.devices()[0])
    mfu = (train_flops / train_dt / peak) if (peak and train_flops > 0) else None
    infer_mfu = (infer_flops / infer_dt / peak) if (peak and infer_flops > 0) else None

    # ---- same-harness CPU-backend probe (subprocess) ---------------------
    cpu_kf = None
    try:
        import subprocess

        env = dict(os.environ, D3M_PLATFORM="cpu", JAX_PLATFORMS="cpu")
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "--cpu-probe"], capture_output=True, text=True,
                           timeout=1500, env=env)
        for line in reversed(r.stdout.strip().splitlines()):
            if line.startswith("{"):
                cpu_kf = json.loads(line).get("cpu_keyframes_per_s")
                break
    except Exception:
        pass

    print(json.dumps({
        "metric": "neuralrecon_keyframes_per_s",
        "value": round(kf_per_s, 2),
        "unit": "keyframes/s",
        "vs_baseline": round(kf_per_s / BASELINE_KEYFRAMES_PER_S, 3),
        "train_keyframes_per_s": round(train_kf_per_s, 2),
        "train_step_ms": round(train_dt * 1e3, 2),
        "train_step_flops": train_flops,
        "infer_step_flops": infer_flops,
        "device": getattr(jax.devices()[0], "device_kind", "unknown"),
        "chip_peak_bf16_flops": peak or None,
        "mfu": round(mfu, 4) if mfu is not None else None,
        "infer_mfu": round(infer_mfu, 4) if infer_mfu is not None else None,
        # (the r3/r4 xla_cost_*_bw_util fields are gone: XLA cost-analysis
        # "bytes accessed" double-counts reuse and printed >1.0 utilizations;
        # the measured_* trace fields below are the trustworthy ones)
        "train_streaming_kf_per_s": round(streaming_kf_per_s, 2)
        if streaming_kf_per_s else None,
        "train_streaming_vs_pinned": round(streaming_ratio, 3)
        if streaming_ratio else None,
        # measured same-harness CPU-backend inference rate (2-step scan,
        # identical model/config) — the BASELINE.md "vs CPU" anchor
        "cpu_keyframes_per_s": cpu_kf,
        "vs_cpu": round(kf_per_s / cpu_kf, 1) if cpu_kf else None,
        **measured,
    }))


if __name__ == "__main__":
    main()
