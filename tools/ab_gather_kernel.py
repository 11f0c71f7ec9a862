"""Chip A/B: can a Pallas kernel beat XLA's fused gather+combine for the
back-projection forward?

The r4 profile (PROFILE_r04.md "Remaining headroom") identified the ~230 MB
(B,V,K,4C) gather intermediate as the biggest single inference win (~2 ms of
21.4) and claimed a Pallas kernel "cannot beat" XLA, citing the *scatter
backward* per-row experiment — a different kernel.  This measures the actual
candidates at the production level-2 shape (V=9, K=131072 active voxels,
table 19200 rows x 96 packed channels per view):

  1. xla-baseline: jnp.take + slice/multiply/add combine (what ships).
  2. pallas-rowloop: per-row fori_loop gather in VMEM (the naive kernel).
  3. pallas-dyngather: vectorized jnp.take inside the kernel, if Mosaic
     lowers it (sublane dynamic-gather support).
  4. xla-chunked: lax.scan over K-tiles (bounds the intermediate; tests
     whether traffic or latency dominates).

Usage: python tools/ab_gather_kernel.py
"""
import functools
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

from bench import _compile_and_time

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


def xla_baseline(table, idx, w, valid):
    flat = table.reshape(V * HW, C4)
    rows = idx + (jnp.arange(V, dtype=jnp.int32) * HW)[:, None]
    g = jnp.take(flat, rows.reshape(-1), axis=0).reshape(V, K, C4)
    return combine(g, w, valid).sum()


def xla_chunked(table, idx, w, valid, kt=16384):
    flat = table.reshape(V * HW, C4)
    base = (jnp.arange(V, dtype=jnp.int32) * HW)[:, None]

    def body(_, args):
        idx_t, w_t, valid_t = args
        rows = idx_t + base
        g = jnp.take(flat, rows.reshape(-1), axis=0).reshape(V, kt, C4)
        return 0, combine(g, w_t, valid_t)

    nt = K // kt
    _, out = jax.lax.scan(
        body, 0, (idx.reshape(V, nt, kt).swapaxes(0, 1),
                  w.reshape(V, nt, kt, 4).swapaxes(0, 1),
                  valid.reshape(V, nt, kt).swapaxes(0, 1)))
    return out.sum()


def _pallas_kernel(mode, kt):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(idx_ref, table_ref, w_ref, valid_ref, out_ref):
        v = pl.program_id(1)

        @pl.when(v == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        if mode == "dyngather":
            g = jnp.take(table_ref[0], idx_ref[0], axis=0)  # (kt, C4)
            f = (g[:, 0 * C:1 * C].astype(jnp.float32) * w_ref[0, :, 0:1]
                 + g[:, 1 * C:2 * C].astype(jnp.float32) * w_ref[0, :, 1:2]
                 + g[:, 2 * C:3 * C].astype(jnp.float32) * w_ref[0, :, 2:3]
                 + g[:, 3 * C:4 * C].astype(jnp.float32) * w_ref[0, :, 3:4])
            out_ref[:] += f * valid_ref[0][:, None]
        else:  # rowloop
            def body(i, _):
                r = idx_ref[0, i]
                g = table_ref[0, r, :].astype(jnp.float32)
                f = (g[0 * C:1 * C] * w_ref[0, i, 0]
                     + g[1 * C:2 * C] * w_ref[0, i, 1]
                     + g[2 * C:3 * C] * w_ref[0, i, 2]
                     + g[3 * C:4 * C] * w_ref[0, i, 3])
                out_ref[i, :] += f * valid_ref[0, i]
                return 0
            jax.lax.fori_loop(0, kt, body, 0)

    nt = K // kt
    # v INNERMOST: the (kt, C) out block is revisited on consecutive steps,
    # so it stays resident in VMEM and accumulates across views; the price
    # is the per-view table block (3.7 MB) reloading every (tile, view) step
    # -- nt x V x 3.7 MB of streaming traffic, which kt sizes against VMEM.
    grid = (nt, V)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, kt), lambda t, v: (v, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, HW, C4), lambda t, v: (v, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt, 4), lambda t, v: (v, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kt), lambda t, v: (v, t), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kt, C), lambda t, v: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )


def pallas_fused(table, idx, w, valid, mode="dyngather", kt=16384):
    call = _pallas_kernel(mode, kt)
    out = call(idx, table, w, valid)
    return out.sum()


def main():
    args = make_inputs()
    rows = []
    for name, fn in [
        ("xla-baseline", xla_baseline),
        ("xla-chunk16k", functools.partial(xla_chunked, kt=16384)),
        ("xla-chunk32k", functools.partial(xla_chunked, kt=32768)),
        ("pallas-dyngather", functools.partial(pallas_fused, mode="dyngather")),
        ("pallas-rowloop", functools.partial(pallas_fused, mode="rowloop",
                                             kt=2048)),
    ]:
        try:
            dt = _compile_and_time(fn, *args, iters=1)
            rows.append((name, dt * 1e3, float(jax.jit(fn)(*args))))
        except Exception as e:
            rows.append((name, None, f"{type(e).__name__}: {str(e)[:200]}"))
    print(f"{'variant':18s} {'ms':>9s}  checksum")
    for name, ms, chk in rows:
        ms_s = f"{ms:9.3f}" if ms is not None else "     FAIL"
        print(f"{name:18s} {ms_s}  {chk}")


if __name__ == "__main__":
    main()
