"""Chip A/B: back-projection forward gather+combine formulations at the
production level-2 shape (V=9, K=131072 active voxels, per-view table
19200 rows x 96 packed channels).

r4's profile claimed the ~230 MB (V,K,4C) gather intermediate costs ~2 ms of
the 21.4 ms inference step and that a Pallas kernel "cannot beat" XLA (citing
the scatter-backward experiment).  This measures forward and backward of the
plain-take vs production custom-vjp formulations; the Pallas candidates are
not expressible in this Pallas/Mosaic version (no vectorized VMEM gather:
`jnp.take`/`take_along_axis` fail to lower inside kernels, only `roll`
exists) — see docs/perf_studies_r05.md for the full study.

Methodology note (r5): single-dispatch timings over the remote-chip tunnel
are unreliable — the first call after a warmup can read ~0 ms (async
completion accounting), which poisoned best-of-1/2 micro-benchmarks.  Every
variant here runs N iterations inside ONE compiled ``lax.scan`` whose input
is re-salted per iteration (the scan carry perturbs the feature table, so no
iteration's work can be elided or deduped), and the wall time of the single
dispatch divides by N — the same harness bench.py uses for the step timings.

Usage: python tools/ab_gather_kernel.py
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
import numpy as np

V, H, W, C = 9, 120, 160, 24
K = 131072
HW = H * W
C4 = 4 * C


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    table = rng.randn(V, HW, C4).astype(np.float32)
    # coherent indices: voxels in a z-line hit consecutive-ish pixels
    base = rng.randint(0, HW - 64, size=(V, K // 64))
    idx = (base[..., None] + np.arange(64)[None, None, :]).reshape(V, K)
    w = rng.rand(V, K, 4).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    valid = (rng.rand(V, K) > 0.3).astype(np.float32)
    return (jnp.asarray(table, jnp.bfloat16), jnp.asarray(idx, jnp.int32),
            jnp.asarray(w), jnp.asarray(valid))


def combine(g, w, valid):
    """(V,K,4C) bf16 -> (K,C) mean over valid views (the production chain)."""
    f = (g[..., 0 * C:1 * C].astype(jnp.float32) * w[..., 0:1]
         + g[..., 1 * C:2 * C].astype(jnp.float32) * w[..., 1:2]
         + g[..., 2 * C:3 * C].astype(jnp.float32) * w[..., 2:3]
         + g[..., 3 * C:4 * C].astype(jnp.float32) * w[..., 3:4])
    f = f * valid[..., None]
    cnt = valid.sum(0)
    return f.sum(0) / jnp.maximum(cnt, 1.0)[..., None]


def chain_plain(table, idx, w, valid):
    flat = table.reshape(V * HW, C4)
    rows = idx + (jnp.arange(V, dtype=jnp.int32) * HW)[:, None]
    g = jnp.take(flat, rows.reshape(-1), axis=0).reshape(V, K, C4)
    return (combine(g, w, valid) ** 2).sum()


def chain_smallvjp(table, idx, w, valid):
    """The production formulation: custom_vjp wraps the bare gather."""
    from deep3dmap_tpu.ops.back_project import _packed_gather

    flat = table.reshape(V * HW, C4)
    rows = idx + (jnp.arange(V, dtype=jnp.int32) * HW)[:, None]
    g = _packed_gather(flat, rows, valid > 0, HW).reshape(V, K, C4)
    return (combine(g, w, valid) ** 2).sum()


def time_scanned(fn, args, iters=20, grad=False):
    """One dispatch of an ``iters``-long scan; per-iteration salted table."""
    table = args[0]

    def body(c, _):
        t = table + c.astype(table.dtype)
        if grad:
            gr = jax.grad(fn)(t, *args[1:])
            out = (gr.astype(jnp.float32) ** 2).sum()
        else:
            out = fn(t, *args[1:])
        return c + 1.0, out

    def stream(table, *rest):
        _, outs = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return outs.sum()

    compiled = jax.jit(stream).lower(*args).compile()
    out = compiled(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = compiled(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best / iters, float(out)


def main():
    args = make_inputs()
    rows = []
    for name, fn, grad, iters in [
        ("fwd plain", chain_plain, False, 20),
        ("fwd smallvjp", chain_smallvjp, False, 20),
        ("grad plain(autodiff)", chain_plain, True, 5),
        ("grad smallvjp", chain_smallvjp, True, 5),
    ]:
        try:
            dt, chk = time_scanned(fn, args, iters=iters, grad=grad)
            rows.append((name, dt * 1e3, chk))
        except Exception as e:
            rows.append((name, None, f"{type(e).__name__}: {str(e)[:160]}"))
    print(f"{'variant':22s} {'ms/iter':>9s}  checksum")
    for name, ms, chk in rows:
        ms_s = f"{ms:9.3f}" if ms is not None else "     FAIL"
        print(f"{name:22s} {ms_s}  {chk}")


if __name__ == "__main__":
    main()
