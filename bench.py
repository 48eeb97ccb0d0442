#!/usr/bin/env python
"""Benchmark: streaming orbit-determination throughput on the local device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N, ...}

value      = frames/s of the full streaming OD pipeline on a 10800-frame arc
             (BASELINE.md sequence spec) with the reference's REGION-PASS
             detection structure: landmarks only under periodic track
             segments, so the stream has real >200 s detection gaps and the
             driver runs genuine MULTI-WINDOW streaming (window handoff,
             inter-window propagation, tail propagation) — the same shape as
             od_pipe.streaming_version on the ids-92..113 sequences
             (od_pipe.py:1063-1086).
vs_baseline = measured per-LM-iteration speedup vs a pure-numpy baseline
             implementing the reference's computational pattern (1 Hz RK4
             loops, finite-difference rollout Jacobians, dense (9N)^3 solve
             — see vinsat_tpu/bench_baseline.py) at the same problem size.

extras: time_to_5km_s (< arc length now that windows are real), final error,
num_windows, sim throughput measured separately (steady-state, post-compile),
and per-LM-iteration device times.

Env knobs: BENCH_DURATION_S (default 10800), BENCH_SEED.
BENCH_FULL_EVAL=1|synthetic|real appends the 16-orbit region-based
evaluation (slow; for documentation runs): "synthetic" uses the generated
landmark field, "real" the reference's 34-CSV landmark database
(BENCH_LANDMARK_DIR, default /root/reference/sim/landmark_csvs) with the
detector-QA best-class downselect; "1" runs both.
"""
import json
import os
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _full_eval_artifact(name: str = "full_eval"):
    return os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f".bench_{name}.json")


def main():
    import jax

    # expose the CPU backend next to the accelerator: GROUND TRUTH MUST BE
    # SIMULATED IN f64 (f32 RK4 trajectories are dynamically inconsistent at
    # km level against any estimator — CLAUDE.md invariant); estimation
    # still runs f32 on the accelerator
    env_plat = os.environ.get("JAX_PLATFORMS", "")
    if env_plat and "cpu" not in env_plat:
        jax.config.update("jax_platforms", env_plat + ",cpu")

    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)
    # x64 stays on for the whole run on CPU; on TPU it is toggled on ONLY
    # around the f64 ground-truth simulation (f64 traces cannot lower to
    # the TPU, and the f32 estimation paths are traced exactly as deployed)
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    # f32 solver numerics require true-f32 matmuls (TPU defaults to bf16)
    jax.config.update("jax_default_matmul_precision", "highest")
    # persistent compile cache (remote TPU compiles cost ~30-60 s each;
    # un-jitted one-op programs ~0.4 s tunnel wall APIECE), host-keyed +
    # remote-aware thresholds (utils/cache.configure_persistent_cache)
    from vinsat_tpu.utils.cache import configure_persistent_cache

    configure_persistent_cache(os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    dtype = "float64" if not on_tpu else "float32"
    log(f"device: {jax.devices()[0]}, dtype: {dtype}")

    from vinsat_tpu import pipeline
    from vinsat_tpu.estimation import ingest
    from vinsat_tpu.estimation.window import StreamingConfig
    from vinsat_tpu.evalx import ate

    duration = int(os.environ.get("BENCH_DURATION_S", 10800))
    seed = int(os.environ.get("BENCH_SEED", 1))

    # ---- simulation: f64 ground truth on the CPU backend ------------------
    sim_kw = dict(duration_s=duration, along_track=True, frame_stride=5,
                  pass_every_s=1800, pass_len_s=300)
    # simulate_sequence itself pins f64 on a local CPU device via the
    # thread-local enable_x64 context (re-entrant; no global toggles)
    t0 = time.time()
    seq = pipeline.simulate_sequence(seed, **sim_kw)
    sim_f64_s = time.time() - t0
    graph = ingest.build_graph(seq.det_rows, duration)
    windows = ingest.split_windows(graph.ii, graph.time_idx)
    log(f"sim(f64 cpu): {sim_f64_s:.1f}s rows={len(seq.det_rows)} "
        f"windows={len(windows)}")

    # accelerator sim throughput, measured separately (steady-state after
    # one compile; f32 device rollout — the "jit-batched rollout replaces
    # the sim" capability, NOT the estimation ground truth)
    sim_fps = float("nan")
    if on_tpu:
        t0 = time.time()
        pipeline.simulate_sequence(seed, device_sim=True, **sim_kw)
        sim_cold_s = time.time() - t0
        t0 = time.time()
        pipeline.simulate_sequence(seed, device_sim=True, **sim_kw)
        sim_warm_s = time.time() - t0
        sim_fps = duration / sim_warm_s
        log(f"sim(f32 device): cold {sim_cold_s:.1f}s warm {sim_warm_s:.1f}s "
            f"({sim_fps:.0f} frames/s)")

    # ---- streaming OD: multi-window, real gaps ---------------------------
    # median of 5 timed runs: the single-run wall is dominated by remote
    # dispatch latency over the TPU tunnel and varied 6.1k-11.7k frames/s
    # across rounds (VERDICT r3 weak #3) — the median is comparable
    # round-over-round, the spread is reported alongside
    cfg = StreamingConfig(dtype=dtype)
    t0 = time.time()
    res = pipeline.run_streaming(seq, seed=seed, cfg=cfg)  # warm-up/compile
    warm_s = time.time() - t0
    run_walls = []
    for _ in range(5):
        t0 = time.time()
        res = pipeline.run_streaming(seq, seed=seed, cfg=cfg)
        run_walls.append(time.time() - t0)
    run_s = float(np.median(run_walls))
    frames_per_s = duration / run_s
    fps_all = sorted(duration / w for w in run_walls)
    t5 = ate.time_to_threshold(res.errors, res.times, 5.0)
    final_err = float(res.errors[-1]) if len(res.errors) else float("nan")
    log(f"stream: warm {warm_s:.1f}s run {run_s:.1f}s -> "
        f"{frames_per_s:.1f} frames/s (5-run spread "
        f"{fps_all[0]:.0f}-{fps_all[-1]:.0f}) windows={len(windows)} "
        f"time_to_5km={t5} final_err={final_err:.2f} km")

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
    base_times = []
    for _ in range(5):
        t0 = time.time()
        baseline_ba_iteration(states9, ii, uv, lm, max_gap=max_gap)
        base_times.append(time.time() - t0)
    # median of 5: a single-iteration numpy timing varies ~2x run to run
    # (measured 291-414x across r1/r2 bench runs), which made vs_baseline
    # noisy by construction
    base_iter = float(np.median(base_times))
    log(f"baseline: {base_iter*1e3:.1f} ms/iter (median of 5: "
        f"{[round(t*1e3) for t in base_times]})")

    vs_baseline = base_iter / ours_iter

    extra = {
        "frames_per_s_spread": [round(fps_all[0], 1), round(fps_all[-1], 1)],
        "time_to_5km_s": t5,
        "final_error_km": round(final_err, 3),
        "num_windows": len(windows),
        "sim_frames_per_s": round(sim_fps, 1),
        "ba_iter_ms": round(ours_iter * 1e3, 2),
        "baseline_iter_ms": round(base_iter * 1e3, 2),
        "platform": platform,
        "dtype": dtype,
    }

    full_eval_mode = os.environ.get("BENCH_FULL_EVAL", "")
    if full_eval_mode:
        # the reference's full evaluation: 16 random orbits over the 16
        # detector-active MGRS regions (od_pipe.py:1063-1086 +
        # errors_eval.py).  Two landmark configurations:
        #   synthetic — landmarks.synthesize (self-contained field);
        #   real      — the reference's actual 34-CSV landmark database
        #               (sim/landmark_csvs, 16,825 landmarks) with the
        #               detector-QA best-class downselect
        #               (eval_landmarks.py:259-286 rule).
        # BENCH_FULL_EVAL=1 runs both; =synthetic / =real selects one.
        # GT simulated in f64 on the CPU backend per orbit.
        from vinsat_tpu.evalx import ate as _ate

        lm_dir = os.environ.get("BENCH_LANDMARK_DIR",
                                "/root/reference/sim/landmark_csvs")
        phases = []
        if full_eval_mode in ("1", "both", "synthetic"):
            phases.append(("full_eval", None))
        if full_eval_mode in ("1", "both", "real") and os.path.isdir(lm_dir):
            from vinsat_tpu.sim import landmarks as _lm

            phases.append(("full_eval_real", _lm.load_reference_db(lm_dir)))

        for name, ev_db in phases:
            t0 = time.time()
            ev_errors, ev_times, per_orbit = [], [], []
            for s in range(int(os.environ.get("BENCH_EVAL_ORBITS", 16))):
                sq = pipeline.simulate_sequence(s, duration_s=duration,
                                                db=ev_db)
                if len(sq.det_rows) == 0:
                    log(f"{name} orbit {s}: no detections")
                    per_orbit.append({"seed": s, "n_dets": 0})
                    continue
                # retry once on transient remote-tunnel failures (a single
                # dropped compile RPC must not void a 30-min eval phase)
                try:
                    r = pipeline.run_streaming(sq, seed=s, cfg=cfg)
                except Exception as e:  # noqa: BLE001
                    log(f"{name} orbit {s}: retrying after {e!r}")
                    time.sleep(10.0)
                    r = pipeline.run_streaming(sq, seed=s, cfg=cfg)
                if len(r.errors):
                    ev_errors.append(r.errors)
                    ev_times.append(r.times)
                    # terminal information bound + efficiency column: how
                    # close the final error sits to the CRLB of this
                    # sequence's detection geometry (evalx/crlb.py)
                    from vinsat_tpu.estimation.window import _f64_prep_context
                    from vinsat_tpu.evalx import crlb as _crlb

                    with _f64_prep_context():
                        cb = _crlb.terminal_crlb_km(sq.orbit_pos_eci_km,
                                                    sq.det_rows)
                    eff = _crlb.efficiency(cb["crlb_final_km"],
                                           float(r.errors[-1]))
                    # efficiency_att: against the attitude-marginalized
                    # bound — the information limit of the estimator's OWN
                    # 9-dof rigid-chain parameterization (evalx/crlb.py)
                    eff_att = _crlb.efficiency(cb["crlb_att_final_km"],
                                               float(r.errors[-1]))
                    row = {
                        "seed": s, "n_dets": len(sq.det_rows),
                        "min_err_km": round(float(r.errors.min()), 3),
                        "final_err_km": round(float(r.errors[-1]), 3),
                        "crlb_final_km": round(cb["crlb_final_km"], 3),
                        "crlb_att_final_km": round(
                            cb["crlb_att_final_km"], 3),
                        "efficiency": round(eff, 3),
                        "efficiency_att": round(eff_att, 3),
                        "obs_span_s": cb["obs_span_s"],
                        "recovery_trips": int(r.recovery_trips),
                    }
                    # bias column (VERDICT r4 #7): for orbits far off their
                    # information bound, re-run the SAME stream in f64 on
                    # the CPU backend — final_f64_km separates estimator
                    # tail bias (f64 ~ f32, both >> CRLB) from precision
                    # loss (f64 << f32)
                    if on_tpu and eff < 0.3:
                        try:
                            cpu0 = jax.local_devices(backend="cpu")[0]
                            cfg64 = cfg._replace(dtype="float64")
                            with jax.enable_x64(True), \
                                    jax.default_device(cpu0):
                                r64 = pipeline.run_streaming(sq, seed=s,
                                                             cfg=cfg64)
                            if len(r64.errors):
                                row["final_f64_km"] = round(
                                    float(r64.errors[-1]), 3)
                        except Exception as e:  # noqa: BLE001
                            log(f"{name} orbit {s}: f64 cross-check "
                                f"failed: {e!r}")
                    per_orbit.append(row)
                    log(f"{name} orbit {s}: min {r.errors.min():.2f} km "
                        f"final {r.errors[-1]:.2f} km "
                        f"crlb {cb['crlb_final_km']:.2f} km eff {eff:.2f}"
                        + (f" f64 {row['final_f64_km']:.2f}"
                           if "final_f64_km" in row else "")
                        + (f" trips {r.recovery_trips}"
                           if r.recovery_trips else ""))
            summary = _ate.summarize(ev_errors, ev_times)
            extra[name] = {k: (round(v, 3) if isinstance(v, float) else v)
                           for k, v in summary.items()}
            extra[name + "_wall_s"] = round(time.time() - t0, 1)
            log(f"{name} 16-orbit eval: {summary}")
            # persist for fast default runs (attached as *_cached below)
            art = dict(extra[name])
            art["per_orbit"] = per_orbit
            art["wall_s"] = extra[name + "_wall_s"]
            art["platform"] = platform
            art["dtype"] = dtype
            if ev_db is not None:
                art["landmark_db"] = (f"reference_csvs({ev_db.num_landmarks}"
                                      f", best={float(np.asarray(ev_db.best).mean()):.2f})")
            art["run_utc"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
            try:
                import subprocess
                art["commit"] = subprocess.run(
                    ["git", "rev-parse", "--short", "HEAD"],
                    cwd=os.path.dirname(os.path.abspath(__file__)),
                    capture_output=True, text=True).stdout.strip()
            except Exception:
                pass
            path = _full_eval_artifact(name)
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(art, f, indent=1)
            os.replace(tmp, path)
    else:
        # attach the last persisted BENCH_FULL_EVAL results (each 16-orbit
        # accuracy eval is ~30 min of wall; default runs stay fast but still
        # report them, labeled as cached with their provenance)
        for name in ("full_eval", "full_eval_real"):
            try:
                with open(_full_eval_artifact(name)) as f:
                    art = json.load(f)
                art.pop("per_orbit", None)  # keep the JSON line readable
                extra[name + "_cached"] = art
            except (OSError, ValueError):
                pass

    print(json.dumps({
        "metric": "multi-window streaming OD throughput "
                  "(10800 s gapped arc, 1 chip)",
        "value": round(frames_per_s, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs_baseline, 2),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
