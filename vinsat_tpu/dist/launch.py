"""Multi-process (multi-host) launcher for distributed OD runs.

The reference has no distributed backend at all (SURVEY.md §5: parallelism =
`process_map` with no IPC).  This launcher provides the TPU-native
equivalent: `jax.distributed.initialize` + XLA collectives over a global
mesh.  It has two roles:

  * **spawner** (`--spawn P`): fork P worker processes of this same script
    on the local host (the multi-process CPU fake of a pod slice, SURVEY.md
    §4 "distributed tests with jax.distributed on multi-process CPU"), wire
    coordinator env, wait, and propagate failures.  On a real TPU pod each
    host runs one worker with the same flags instead.
  * **worker**: initialize the distributed runtime, build the global
    (orbit × arc) mesh spanning every process's devices, and run the
    requested program.

Programs:
  selftest — sharded block-tridiagonal solve across the global mesh,
             verified against the local sequential solve on every process.
  ba-step  — one sharded BA iteration (dist/sharded_ba) on a synthetic
             problem spanning all processes; verifies finiteness and
             cross-process agreement of the replicated λ output.

Usage (2 processes × 2 virtual CPU devices each):
  python -m vinsat_tpu.dist.launch --spawn 2 --local-devices 2 selftest
"""
from __future__ import annotations

import argparse
import os
import socket
import subprocess
import sys


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def spawn(num_processes: int, local_devices: int, program: str,
          timeout_s: int = 600) -> int:
    """Fork num_processes workers of this module and wait for all.

    Returns 0 iff every worker exited 0.  Workers inherit the coordinator
    address via env (the same contract a real multi-host launcher uses)."""
    port = _free_port()
    procs = []
    for pid in range(num_processes):
        env = dict(os.environ)
        env["VINSAT_COORDINATOR"] = f"127.0.0.1:{port}"
        env["VINSAT_NUM_PROCESSES"] = str(num_processes)
        env["VINSAT_PROCESS_ID"] = str(pid)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "").replace(
                "--xla_force_host_platform_device_count=8", ""
            )
            + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()
        # drop the remote-TPU sitecustomize from the workers: it would
        # initialize the XLA backend at import, before
        # jax.distributed.initialize can run
        env.pop("PYTHONSTARTUP", None)
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and "axon_site" not in p
        )
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "vinsat_tpu.dist.launch", program],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        ))
    rc = 0
    for i, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            rc = rc or 124
        sys.stdout.write(f"--- worker {i} (rc={p.returncode}) ---\n"
                         + out.decode(errors="replace"))
        rc = rc or p.returncode
    return rc


def init_worker():
    """jax.distributed.initialize from the env contract; returns jax."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.distributed.initialize(
        coordinator_address=os.environ["VINSAT_COORDINATOR"],
        num_processes=int(os.environ["VINSAT_NUM_PROCESSES"]),
        process_id=int(os.environ["VINSAT_PROCESS_ID"]),
    )
    return jax


def _global_mesh(jax, axis: str = "arc"):
    from jax.sharding import Mesh
    import numpy as np

    devs = np.array(jax.devices())
    return Mesh(devs, (axis,))


def run_selftest() -> None:
    """Distributed SPIKE solve across all processes vs local reference."""
    jax = init_worker()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vinsat_tpu.dist.tridiag import sharded_block_tridiag_solve
    from vinsat_tpu.estimation.ba import block_tridiag_solve

    mesh = _global_mesh(jax)
    nshards = mesh.shape["arc"]
    k, m = 9, 6
    N = nshards * m
    rng = np.random.default_rng(0)  # same data on every process
    A = rng.normal(size=(N, k, k))
    D = np.einsum("nij,nkj->nik", A, A) + 10.0 * np.eye(k)[None]
    U = rng.normal(size=(N, k, k)) * 0.1
    U[-1] = 0.0
    b = rng.normal(size=(N, k))

    spec = NamedSharding(mesh, P("arc"))

    def mk(x):
        xj = jnp.asarray(x)
        return jax.make_array_from_callback(
            xj.shape, spec, lambda idx: xj[idx])

    x = sharded_block_tridiag_solve(mesh, mk(D), mk(U), mk(b))
    # every process holds its own shards; compare them to the local solve
    x_ref = np.asarray(block_tridiag_solve(
        jnp.asarray(D), jnp.asarray(U[:-1]), jnp.asarray(b)))
    for shard in x.addressable_shards:
        sl = shard.index[0]
        np.testing.assert_allclose(
            np.asarray(shard.data), x_ref[sl], rtol=1e-8, atol=1e-8)
    pid = jax.process_index()
    print(f"selftest OK: process {pid}/{jax.process_count()} "
          f"mesh=arc:{nshards} N={N} max_shard_err="
          f"{max(float(abs(np.asarray(s.data) - x_ref[s.index[0]]).max()) for s in x.addressable_shards):.2e}")


def run_ba_step() -> None:
    """One sharded BA iteration spanning every process's devices."""
    jax = init_worker()
    import jax.numpy as jnp
    import numpy as np

    from vinsat_tpu.dist import mesh as mesh_mod
    from vinsat_tpu.dist import sharded_ba
    from vinsat_tpu.estimation import ba

    n_dev = len(jax.devices())
    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=n_dev)
    dtype = jnp.float64
    B, N, D = 1, n_dev * 4, 4
    rng = np.random.default_rng(0)
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

    sharding = mesh_mod.batch_arc_sharding(mesh)
    obatch = mesh_mod.orbit_sharding(mesh)

    def put(x, s):
        xj = jnp.asarray(x, dtype)
        return jax.make_array_from_callback(xj.shape, s, lambda i: xj[i])

    prob = sharded_ba.ShardedProblem(
        states=put(states, sharding), gaps=put(gaps, sharding),
        cum_rot=put(cum, sharding), lm_xyz=put(lm, sharding),
        uv=put(uv, sharding), conf=put(conf, sharding),
        obs_valid=put(ov, sharding), pair_valid=put(pv, sharding),
        intrinsics=jnp.asarray([3547.851, 3547.851, 2304.0, 1296.0], dtype),
    )
    lamda_b = put(np.full((B,), 1e-4), obatch)
    params = ba.SolverParams(num_hops=3, max_substep=100.0)
    step = sharded_ba.make_sharded_ba_step(mesh, params)
    new_states, new_lamda = step(jnp.asarray(0), lamda_b, prob)
    jax.block_until_ready((new_states, new_lamda))
    local = np.concatenate(
        [np.asarray(s.data).reshape(-1) for s in new_states.addressable_shards])
    assert np.isfinite(local).all(), "non-finite sharded states"
    lam = float(np.asarray(new_lamda.addressable_shards[0].data).ravel()[0])
    print(f"ba-step OK: process {jax.process_index()}/{jax.process_count()} "
          f"mesh=arc:{mesh.shape['arc']} lamda={lam:.2e}")


def run_stream() -> None:
    """REAL-sequence distributed solve spanning every process: a simulated
    detection sequence (pipeline.simulate_sequence) solved by the
    multi-iteration sharded window solver (run-to-max best-iterate) on the
    global cross-process mesh.  Exercises the full config-5 shape — halo
    exchanges, distributed median, SPIKE solve, psum'd residual means,
    best-iterate tracking — through jax.distributed + gloo, not just the
    synthetic 16-knot toys of selftest/ba-step."""
    jax = init_worker()
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vinsat_tpu import pipeline
    from vinsat_tpu.dist import long_arc, mesh as mesh_mod, sharded_ba
    from vinsat_tpu.estimation import ba

    n_dev = len(jax.devices())
    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=n_dev)
    # identical deterministic sequence on every process.  Pin the prep to a
    # LOCAL device: in multi-process mode a bare jit produces arrays
    # spanning all global devices, which host code cannot fetch.
    with jax.default_device(jax.local_devices()[0]):
        seq = pipeline.simulate_sequence(1, duration_s=1800, frame_stride=10,
                                         along_track=True)
        prob0, gt_states, knot_t, n_real = long_arc.build_sharded_problem(
            seq, n_arc=n_dev, dtype=jnp.float64, noise_pos_km=20.0)
        prob0 = jax.tree_util.tree_map(np.asarray, prob0)
    bspec = NamedSharding(mesh, P("orbit", "arc"))
    ospec = NamedSharding(mesh, P("orbit"))

    def put(x, s):
        xh = np.asarray(x)
        return jax.make_array_from_callback(xh.shape, s, lambda i: xh[i])

    N = prob0.gaps.shape[1]
    kv = np.zeros((1, N))
    kv[:, :n_real] = 1.0
    prob = sharded_ba.ShardedProblem(
        states=put(prob0.states, bspec), gaps=put(prob0.gaps, bspec),
        cum_rot=put(prob0.cum_rot, bspec), lm_xyz=put(prob0.lm_xyz, bspec),
        uv=put(prob0.uv, bspec), conf=put(prob0.conf, bspec),
        obs_valid=put(prob0.obs_valid, bspec),
        pair_valid=put(prob0.pair_valid, bspec),
        intrinsics=jnp.asarray(prob0.intrinsics),
        knot_valid=put(kv, bspec),
    )
    max_gap = float(np.asarray(prob0.gaps).max())
    params = ba.SolverParams(num_hops=int(np.ceil(max_gap / 100.0)) + 1,
                             max_iters=16)
    solve = sharded_ba.make_sharded_window_solver(
        mesh, params, num_iters=12, init_iters=6)
    lam = put(np.full((1,), 1e-4), ospec)
    states, lam_f, res = solve(lam, prob)
    jax.block_until_ready(states)
    # each process checks ITS local knot shards against the shared GT
    errs = []
    for shard in states.addressable_shards:
        sl = shard.index[1]
        lo = sl.start or 0
        local = np.asarray(shard.data)[0]
        for j in range(local.shape[0]):
            if lo + j < n_real:
                errs.append(float(np.linalg.norm(
                    local[j, :3] - gt_states[lo + j, :3])))
    assert errs, "process owns no real knots"
    med = float(np.median(errs))
    assert np.isfinite(med) and med < 5.0, f"median local error {med} km"
    print(f"stream OK: process {jax.process_index()}/{jax.process_count()} "
          f"mesh=arc:{n_dev} knots={n_real} local_median_err={med:.2f} km "
          f"res={float(np.asarray(res.addressable_shards[0].data).ravel()[0]):.3f}")


PROGRAMS = {"selftest": run_selftest, "ba-step": run_ba_step,
            "stream": run_stream}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("program", choices=list(PROGRAMS))
    ap.add_argument("--spawn", type=int, default=0,
                    help="fork N worker processes on this host")
    ap.add_argument("--local-devices", type=int, default=2,
                    help="virtual CPU devices per worker (spawn mode)")
    ap.add_argument("--timeout", type=int, default=600)
    args = ap.parse_args(argv)
    if args.spawn:
        sys.exit(spawn(args.spawn, args.local_devices, args.program,
                       args.timeout))
    PROGRAMS[args.program]()


if __name__ == "__main__":
    main()
