"""Multi-process scaling evidence artifact (SCALING_r*.json).

Real pod hardware is not attached in this environment, so the honest
best-available evidence for the >=80% multi-host BA scaling target is
recorded here as one JSON artifact combining:

  1. the arc-parallel OVERHEAD RATIO at P in {2,4,8} shards on the
     single-process virtual mesh (dist/bench_scaling.py: sharded step vs
     the identical unsharded computation — halo + psum + SPIKE reduced
     solve are the only additions; projected weak-scaling efficiency is
     ~1/overhead since real shards own their own chips);
  2. REAL MULTI-PROCESS runs (jax.distributed + gloo) at P in {2,4,8}
     processes: the SPIKE-solve selftest, one sharded BA step, and the
     full real-sequence distributed window solve (launch.py `stream`),
     with pass/fail and wall time (wall includes process spawn + XLA
     compile; it is run evidence, not a scaling metric).

Run: python -m vinsat_tpu.dist.scaling_artifact [--out SCALING_r03.json]
(sets its own CPU/virtual-device env for the overhead step; ~10-20 min.)
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _run_overhead(repeats: int = 10, base_knots: int = 64,
                  dispatch_scan: bool = False):
    """dist/bench_scaling.py in a subprocess (needs its own XLA_FLAGS)."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon_site" not in p) or os.getcwd()
    cmd = [sys.executable, "-m", "vinsat_tpu.dist.bench_scaling",
           "--repeats", str(repeats), "--base-knots", str(base_knots)]
    if dispatch_scan:
        cmd.append("--dispatch-scan")
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=1800)
    rows = []
    for line in out.stdout.splitlines():
        try:
            rows.append(json.loads(line) | ({} if dispatch_scan
                                            else {"base_knots": base_knots}))
        except ValueError:
            pass
    return rows, out.returncode


def _run_multiproc(num_processes: int, local_devices: int, program: str,
                   timeout_s: int = 900):
    from vinsat_tpu.dist import launch

    t0 = time.time()
    rc = launch.spawn(num_processes, local_devices, program,
                      timeout_s=timeout_s)
    return {"processes": num_processes, "local_devices": local_devices,
            "program": program, "ok": rc == 0,
            "wall_s": round(time.time() - t0, 1)}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="SCALING_r04.json")
    ap.add_argument("--repeats", type=int, default=10)
    args = ap.parse_args(argv)

    artifact = {"run_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())}
    try:
        commit = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                                capture_output=True, text=True).stdout.strip()
        artifact["commit"] = commit
    except Exception:
        pass

    rows = []
    for bk in (64, 256):
        r, rc = _run_overhead(args.repeats, base_knots=bk)
        rows.extend(r)
        print(json.dumps({"overhead_rows": r, "rc": rc}), flush=True)
    artifact["virtual_mesh_overhead"] = rows
    artifact["overhead_note"] = (
        "this host has 4 cores for 8 virtual devices: small (64-knot) "
        "shards are dominated by per-device fixed overhead under 2x core "
        "oversubscription; the 256-knot rows are the meaningful collective-"
        "overhead measurement (ratio < 1 = the SPIKE sequential-depth cut "
        "outweighs halo/psum cost)")

    scan, rc = _run_overhead(args.repeats, dispatch_scan=True)
    artifact["window_dispatch_scan"] = scan
    print(json.dumps({"dispatch_scan": scan, "rc": rc}), flush=True)
    crossover = next((r["window_knots"] for r in scan
                      if r.get("shard_wins")), None)
    artifact["dispatch_policy"] = {
        "shard_min_knots_default": 256,
        "measured_crossover_knots": crossover,
        "note": ("stream_orbit_sharded solves windows below the threshold "
                 "on ONE device (no halo/psum/SPIKE overhead) and shards "
                 "only above it — no regime where the distributed driver "
                 "is slower than single-chip on the same window "
                 "(dist/stream.SHARD_MIN_KNOTS_DEFAULT)"),
    }

    runs = []
    for P, ld in ((2, 2), (4, 2), (8, 1)):
        for program in ("selftest", "ba-step", "stream"):
            row = _run_multiproc(P, ld, program)
            runs.append(row)
            print(json.dumps(row), flush=True)
    artifact["multiprocess_gloo_runs"] = runs
    artifact["all_ok"] = all(r["ok"] for r in runs)

    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(f"wrote {args.out}: all_ok={artifact['all_ok']}")


if __name__ == "__main__":
    main()
