#!/usr/bin/env python
"""Benchmark: streaming orbit-determination throughput on the local device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}

value      = frames/s of the full streaming OD pipeline (10800-frame arc,
             BASELINE.md sequence spec) on this machine's default JAX device.
vs_baseline = measured per-LM-iteration speedup vs a pure-numpy baseline
             implementing the reference's computational pattern (1 Hz RK4
             loops, finite-difference rollout Jacobians, dense (9N)^3 solve
             — see vinsat_tpu/bench_baseline.py) at the same problem size.
"""
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    # f32 solver numerics require true-f32 matmuls (TPU defaults to bf16)
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compile cache (remote TPU compiles cost ~30-60 s each)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    dtype = "float64" if not on_tpu else "float32"
    log(f"device: {jax.devices()[0]}, dtype: {dtype}")

    from vinsat_tpu import pipeline
    from vinsat_tpu.estimation.window import StreamingConfig
    from vinsat_tpu.evalx import ate

    duration = int(os.environ.get("BENCH_DURATION_S", 10800))
    seed = int(os.environ.get("BENCH_SEED", 1))

    t0 = time.time()
    seq = pipeline.simulate_sequence(seed, duration_s=duration,
                                     along_track=True, frame_stride=5)
    sim_s = time.time() - t0
    log(f"sim: {sim_s:.1f}s rows={len(seq.det_rows)}")

    cfg = StreamingConfig(dtype=dtype)
    t0 = time.time()
    res = pipeline.run_streaming(seq, seed=seed, cfg=cfg)  # warm-up/compile
    warm_s = time.time() - t0
    t0 = time.time()
    res = pipeline.run_streaming(seq, seed=seed, cfg=cfg)
    run_s = time.time() - t0
    frames_per_s = duration / run_s
    t5 = ate.time_to_threshold(res.errors, res.times, 5.0)
    final_err = float(res.errors[-1]) if len(res.errors) else float("nan")
    log(f"stream: warm {warm_s:.1f}s run {run_s:.1f}s -> {frames_per_s:.1f} frames/s"
        f" time_to_5km={t5} final_err={final_err:.2f} km")

    # ---- per-iteration comparison vs the numpy reference-pattern baseline
    from vinsat_tpu.bench_baseline import baseline_ba_iteration
    from vinsat_tpu.estimation import ba
    from vinsat_tpu.estimation.window import solve_window, _pad_problem

    N, M, max_gap = 32, 256, 1000
    rng = np.random.default_rng(0)
    pos = rng.normal(size=(N, 3)) * 30 + np.array([6900.0, 0, 0])
    q = rng.normal(size=(N, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vel = rng.normal(size=(N, 3)) * 0.1 + np.array([0, 7.5, 0])
    states = np.concatenate([pos, q, vel], axis=1)
    gaps = np.full(N, 350.0)
    gaps[-1] = 0
    cum = np.zeros((N, 4))
    cum[:, 3] = 1
    lm = pos[rng.integers(0, N, M)] * 0.92
    uv = rng.uniform(0, 2000, size=(M, 2))
    conf = rng.uniform(0.8, 1.0, M)
    ii = np.sort(rng.integers(0, N, M)).astype(np.int64)

    st0, prob = _pad_problem(states, gaps, cum, lm, uv, conf, ii, N, M, dtype)
    params = ba.SolverParams(num_hops=12, max_substep=100.0)
    iters = 10

    def run_ours():
        out, _, _, _ = solve_window(st0, prob, 1e-4, jnp.asarray(0), iters,
                                    params)
        jax.block_until_ready(out)

    run_ours()  # compile
    t0 = time.time()
    run_ours()
    ours_iter = (time.time() - t0) / iters
    log(f"ours: {ours_iter*1e3:.1f} ms/iter")

    states9 = np.concatenate([pos, np.zeros((N, 3)), vel], axis=1)
    t0 = time.time()
    baseline_ba_iteration(states9, ii, uv, lm, max_gap=max_gap)
    base_iter = time.time() - t0
    log(f"baseline: {base_iter*1e3:.1f} ms/iter")

    vs_baseline = base_iter / ours_iter
    print(json.dumps({
        "metric": "streaming OD throughput (10800 s arc, 1 chip)",
        "value": round(frames_per_s, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 2),
        "extra": {
            "time_to_5km_s": t5,
            "final_error_km": round(final_err, 3),
            "ba_iter_ms": round(ours_iter * 1e3, 2),
            "baseline_iter_ms": round(base_iter * 1e3, 2),
            "platform": platform,
            "dtype": dtype,
        },
    }))


if __name__ == "__main__":
    main()
