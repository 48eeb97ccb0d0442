"""Driver-phase accounting of the headline multi-window stream.

Runs the bench-shaped gapped arc through `stream_orbit` with a `StageTimer`
and prints wall time per driver phase (prep / propagate / pad_transfer /
solve / marginal).  Over the remote-TPU tunnel each phase's cost is
dominated by its host round trips, so this is the dispatch-accounting view
of the stream — the device-time per-op view is `utils.mfu`.

Run: `python -m vinsat_tpu.utils.stream_profile [--duration 10800]`
(TPU if the axon tunnel is live, CPU otherwise).
"""
from __future__ import annotations

import argparse
import os
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--duration", type=int,
                    default=int(os.environ.get("BENCH_DURATION_S", 10800)))
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--trials", type=int, default=2)
    args = ap.parse_args(argv)

    import jax

    env_plat = os.environ.get("JAX_PLATFORMS", "")
    if env_plat and "cpu" not in env_plat:
        # expose the CPU backend next to axon for the f64 GT simulation
        jax.config.update("jax_platforms", env_plat + ",cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    from vinsat_tpu.utils.cache import (cache_dir,
                                        install_multidevice_cpu_cache_guard)

    jax.config.update("jax_compilation_cache_dir",
                      cache_dir("/root/repo/.jax_cache"))
    install_multidevice_cpu_cache_guard()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from vinsat_tpu import pipeline
    from vinsat_tpu.estimation.window import StreamingConfig, stream_orbit
    from vinsat_tpu.utils.profiling import StageTimer

    platform = jax.devices()[0].platform
    on_tpu = platform != "cpu"
    dtype = "float32" if on_tpu else "float64"
    print("platform:", platform, flush=True)

    # bench.py's gapped-arc shape: detection passes every 1800 s
    seq = pipeline.simulate_sequence(args.seed, duration_s=args.duration,
                                     along_track=True, frame_stride=5,
                                     pass_every_s=1800, pass_len_s=300)

    cfg = StreamingConfig(dtype=dtype)
    t0 = time.time()
    res = stream_orbit(seq.det_rows, seq.orbit_pos_eci_km, seed=args.seed,
                       cfg=cfg)
    print(f"warm: {time.time() - t0:.1f}s final={res.errors[-1]:.3f} km",
          flush=True)

    for trial in range(args.trials):
        timer = StageTimer()
        t0 = time.time()
        res = stream_orbit(seq.det_rows, seq.orbit_pos_eci_km,
                           seed=args.seed, cfg=cfg, timer=timer)
        total = time.time() - t0
        rep = timer.report()
        acc = sum(v["total_s"] for v in rep.values())
        print(f"\nrun {trial}: total {total:.3f}s  accounted {acc:.3f}s  "
              f"final {res.errors[-1]:.3f} km")
        for k, v in sorted(rep.items(), key=lambda kv: -kv[1]["total_s"]):
            print(f"  {k:14s} {v['total_s'] * 1e3:8.1f} ms  "
                  f"x{v['count']:3d}  ({v['mean_ms']:.1f} ms/call)")


if __name__ == "__main__":
    main()
