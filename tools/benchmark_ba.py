"""BA iters/s report (BASELINE.md report points: "BA iters/s + frames/s/chip").

Times the Schur-complement LM bundle adjuster (core/sfm/ba.py) at fragment
scale on the available device(s): one compiled while_loop, so iters/s is
device math, not Python dispatch.  With >1 device (or the virtual CPU mesh),
also reports the observation-sharded variant.

Usage: python tools/benchmark_ba.py [--cams 24] [--pts 4096] [--obs-per-pt 8]
"""
import argparse
import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def make_problem(rng, n_cams, n_pts, obs_per_pt, dtype):
    import jax.numpy as jnp
    import numpy as np

    from deep3dmap_tpu.core import sfm
    from deep3dmap_tpu.core.sfm.ba import BAProblem

    X = rng.randn(n_pts, 3).astype(np.float64) * 0.6
    K = np.tile(np.array([320.0, 320.0, 160.0, 120.0]), (n_cams, 1))
    Rs, ts = [], []
    for i in range(n_cams):
        ang = 0.5 * i / max(n_cams - 1, 1)
        R = np.asarray(sfm.so3_exp(jnp.asarray([0.0, ang, 0.0])))
        c = np.array([2.5 * np.sin(ang), 0.02 * i, -2.5 * np.cos(ang)])
        Rs.append(R)
        ts.append(-R @ c)
    Rs, ts = np.stack(Rs), np.stack(ts)
    # each point observed by obs_per_pt consecutive cameras
    pt_idx = np.repeat(np.arange(n_pts), obs_per_pt)
    start = rng.randint(0, max(n_cams - obs_per_pt, 1), n_pts)
    cam_idx = (start[:, None] + np.arange(obs_per_pt)[None]).reshape(-1)
    uv, _ = sfm.project(jnp.asarray(K)[cam_idx], jnp.asarray(Rs)[cam_idx],
                        jnp.asarray(ts)[cam_idx], jnp.asarray(X)[pt_idx])
    uv = np.asarray(uv) + 0.5 * rng.randn(*uv.shape)
    prob = BAProblem(
        K=jnp.asarray(K, dtype), cam_idx=jnp.asarray(cam_idx),
        pt_idx=jnp.asarray(pt_idx), uv=jnp.asarray(uv, dtype),
        w=jnp.ones(len(cam_idx), dtype),
        cam_fixed=jnp.asarray(np.arange(n_cams) < 2))
    return (jnp.asarray(K, dtype), jnp.asarray(Rs, dtype),
            jnp.asarray(ts, dtype), jnp.asarray(X, dtype), prob)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cams", type=int, default=24)
    ap.add_argument("--pts", type=int, default=4096)
    ap.add_argument("--obs-per-pt", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deep3dmap_tpu.core import sfm

    rng = np.random.RandomState(0)
    K, Rs, ts, X, prob = make_problem(rng, args.cams, args.pts,
                                      args.obs_per_pt, jnp.float32)
    dxi = jnp.asarray(rng.randn(args.cams, 6) * 0.01).at[:2].set(0.0)
    R0, t0 = sfm.se3_retract(Rs, ts, dxi)
    X0 = X + jnp.asarray(rng.randn(*X.shape) * 0.03, jnp.float32)

    solve = jax.jit(lambda R, t, Xp: sfm.lm_solve(R, t, Xp, prob,
                                                  iters=args.iters))
    res = solve(R0, t0, X0)
    jax.block_until_ready(res.cost)          # compile + warmup
    t_best = float("inf")
    for _ in range(args.reps):
        t0_ = time.perf_counter()
        res = solve(R0, t0, X0)
        jax.block_until_ready(res.cost)
        t_best = min(t_best, time.perf_counter() - t0_)
    iters_per_s = args.iters / t_best

    out = {
        "report": "ba_lm_schur",
        "cams": args.cams, "points": args.pts,
        "observations": int(prob.uv.shape[0]),
        "lm_iters_per_s": round(iters_per_s, 2),
        "obs_per_s": round(iters_per_s * prob.uv.shape[0], 1),
        "initial_cost": float(res.initial_cost), "final_cost": float(res.cost),
        "device": jax.devices()[0].platform,
    }

    n_dev = jax.device_count()
    if n_dev > 1:
        from deep3dmap_tpu.parallel.mesh import make_mesh
        M = prob.uv.shape[0]
        pad = (-M) % n_dev
        probp = prob._replace(
            cam_idx=jnp.pad(prob.cam_idx, (0, pad)),
            pt_idx=jnp.pad(prob.pt_idx, (0, pad)),
            uv=jnp.pad(prob.uv, ((0, pad), (0, 0))),
            w=jnp.pad(prob.w, (0, pad)))
        mesh = make_mesh(("data",))
        run = lambda: sfm.lm_solve_sharded(mesh, R0, t0, X0, probp,  # noqa: E731
                                           iters=args.iters)
        r = run()
        jax.block_until_ready(r.cost)
        t0_ = time.perf_counter()
        r = run()
        jax.block_until_ready(r.cost)
        dt = time.perf_counter() - t0_
        out["sharded_devices"] = n_dev
        out["sharded_lm_iters_per_s"] = round(args.iters / dt, 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
