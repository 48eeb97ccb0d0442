"""Arc-parallel overhead of the sharded BA step on the virtual mesh.

BASELINE target: >=80% multi-host BA scaling.  Real multi-chip hardware is
not attached in this environment, and virtual CPU devices SHARE the same
cores, so a naive weak-scaling efficiency cannot be measured (P shards do
P x the work on the same silicon).  What the virtual mesh CAN measure
honestly is the **arc-parallel overhead ratio**:

    overhead(P) = t(P arc shards, N knots) / t(1 shard, same N knots)

i.e. how much the halo exchanges, psum reductions, and the SPIKE reduced
solve add over the identical computation unsharded.  On a real slice each
shard owns its own chip, so the projected weak-scaling efficiency is
~ 1 / overhead(P): overhead near 1.0 (or below, when the SPIKE cut in
sequential Thomas depth wins) supports the >=80% target; the real-hardware
curve still needs a pod to confirm.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
     python -m vinsat_tpu.dist.bench_scaling [--base-knots 64] [--obs 8]
Prints one JSON line per shard count.
"""
from __future__ import annotations

import argparse
import json
import time

import numpy as np


def build_problem(n_knots: int, D: int, dtype, seed: int = 0):
    import jax.numpy as jnp

    from vinsat_tpu.dist import sharded_ba

    rng = np.random.default_rng(seed)
    B, N = 1, n_knots
    pos = rng.normal(size=(B, N, 3)) * 30 + np.array([6900.0, 0, 0])
    q = rng.normal(size=(B, N, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vel = rng.normal(size=(B, N, 3)) * 0.1 + np.array([0, 7.5, 0])
    states = np.concatenate([pos, q, vel], axis=-1)
    gaps = np.full((B, N), 120.0)
    gaps[:, -1] = 0.0
    cum = np.zeros((B, N, 4))
    cum[..., 3] = 1.0
    lm = pos[:, :, None, :] * 0.92 + rng.normal(size=(B, N, D, 3)) * 10.0
    uv = rng.uniform(100, 2000, size=(B, N, D, 2))
    conf = rng.uniform(0.85, 1.0, (B, N, D))
    ov = np.ones((B, N, D))
    pv = np.ones((B, N))
    pv[:, -1] = 0.0
    return sharded_ba.ShardedProblem(
        states=jnp.asarray(states, dtype), gaps=jnp.asarray(gaps, dtype),
        cum_rot=jnp.asarray(cum, dtype), lm_xyz=jnp.asarray(lm, dtype),
        uv=jnp.asarray(uv, dtype), conf=jnp.asarray(conf, dtype),
        obs_valid=jnp.asarray(ov, dtype), pair_valid=jnp.asarray(pv, dtype),
        intrinsics=jnp.asarray([3547.851, 3547.851, 2304.0, 1296.0], dtype),
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-knots", type=int, default=64,
                    help="knots per shard (constant in weak scaling)")
    ap.add_argument("--obs", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--dispatch-scan", action="store_true",
                    help="scan window sizes for the shard-vs-single-device "
                         "crossover of the full window solve")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from vinsat_tpu.dist import mesh as mesh_mod
    from vinsat_tpu.dist import sharded_ba
    from vinsat_tpu.estimation import ba

    jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if jax.devices()[0].platform == "cpu" else jnp.float32
    params = ba.SolverParams(num_hops=3, max_substep=100.0)
    n_dev = len(jax.devices())
    print(json.dumps({"devices": n_dev,
                      "platform": jax.devices()[0].platform}))

    def make_step(P, N):
        mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=P)
        prob = build_problem(N, args.obs, dtype)
        step = sharded_ba.make_sharded_ba_step(mesh, params)
        lam = jnp.full((1,), 1e-4, dtype)
        jax.block_until_ready(step(jnp.asarray(0), lam, prob))
        return lambda: jax.block_until_ready(step(jnp.asarray(0), lam, prob))

    def timed_pair(P, N):
        """Alternate sharded/single timings and take the MIN of repeats:
        virtual CPU devices share cores with everything else on the host,
        so medians absorb contention spikes asymmetrically — interleaved
        minima are the contention-robust estimate of the true step times
        (measured: medians wander 1.0-3.2x run to run on a loaded host)."""
        f_sh = make_step(P, N)
        f_1 = make_step(1, N)
        ts, t1 = [], []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            f_sh()
            ts.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            f_1()
            t1.append(time.perf_counter() - t0)
        return float(np.min(ts)), float(np.min(t1))

    if args.dispatch_scan:
        # ---- window-size dispatch crossover (VERDICT r3 next #4) --------
        # For EACH window size N, time the FULL window solve (the unit the
        # streaming driver dispatches, make_sharded_window_solver) sharded
        # over all arc devices vs on ONE device.  The crossover knot count
        # is where sharding starts winning; below it the distributed
        # streaming driver should keep the window on a single device.
        num_iters, lm_iters = 10, 10
        wparams = params._replace(max_iters=lm_iters)

        def make_solve(P, N):
            mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=P)
            prob = build_problem(N, args.obs, dtype)
            solve = sharded_ba.make_sharded_window_solver(
                mesh, wparams, num_iters=num_iters)
            lam = jnp.full((1,), 1e-4, dtype)
            jax.block_until_ready(solve(lam, prob))
            return lambda: jax.block_until_ready(solve(lam, prob))

        for N in (16, 32, 64, 128, 256, 512):
            if N % n_dev:
                continue
            f_sh = make_solve(n_dev, N)
            f_1 = make_solve(1, N)
            ts, t1 = [], []
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                f_sh()
                ts.append(time.perf_counter() - t0)
                t0 = time.perf_counter()
                f_1()
                t1.append(time.perf_counter() - t0)
            t_sh, t_one = float(np.min(ts)), float(np.min(t1))
            print(json.dumps({
                "window_knots": N, "arc_shards": n_dev,
                "sharded_solve_ms": round(t_sh * 1e3, 2),
                "single_device_ms": round(t_one * 1e3, 2),
                "shard_wins": bool(t_sh < t_one),
            }))
        return

    P = 2
    while P <= n_dev:
        N = args.base_knots * P
        t_sharded, t_single = timed_pair(P, N)
        overhead = t_sharded / t_single
        print(json.dumps({
            "arc_shards": P, "total_knots": N,
            "sharded_step_ms": round(t_sharded * 1e3, 2),
            "single_shard_ms": round(t_single * 1e3, 2),
            "overhead_ratio": round(overhead, 3),
            "projected_weak_efficiency": round(min(1.0, 1.0 / overhead), 3),
        }))
        P *= 2


if __name__ == "__main__":
    main()
