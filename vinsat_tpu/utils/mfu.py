"""Device-time / FLOP / MFU accounting for the solver hot path.

The BASELINE north star is "kernels at speed-of-light per chip", which
requires *measuring* distance from roofline, not wall-clock anecdotes.  This
module times each solver stage as its own jitted program (steady-state, after
compile), pulls XLA's own FLOP/byte estimates from `compiled.cost_analysis()`
and reports:

  * device time per call (median of repeats, block_until_ready-fenced),
  * FLOPs/call and achieved GFLOP/s,
  * bytes/call and achieved GB/s,
  * percent of peak FLOP/s and HBM bandwidth (model-FLOP/bandwidth
    utilization) for the detected chip.

Stages correspond to the pipeline of one LM iteration (ba.ba_iteration):
  factors   — reprojection + dynamics factor evaluation (with Jacobians)
  assemble  — robust weights + block normal-equation assembly (JᵀWJ, JᵀWr)
  solve     — Jacobi-scaled block-tridiagonal solve
  trial     — one λ-trial: solve + retraction + residual re-evaluation
  iteration — the full ba_iteration (everything incl. the λ while_loop)

Run: `python -m vinsat_tpu.utils.mfu [--sizes 64,256,1024,4096] [--dtype f32]`
Prints one JSON line per (stage, N).
"""
from __future__ import annotations

import time
from typing import Dict

import numpy as np

# peak specs per chip family (bf16 matmul TFLOP/s, HBM GB/s); the f32
# "highest"-precision matmul path runs the MXU in multi-pass mode, so
# percent-of-peak is reported against the bf16 peak — a conservative
# (lower) MFU figure.
_CHIP_PEAKS = {
    "v5 lite": (197.0, 819.0),  # TPU v5e
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v4": (275.0, 1228.0),
    "v6": (918.0, 1640.0),  # trillium
    "cpu": (0.5, 50.0),  # order-of-magnitude placeholders
}


def chip_peaks(device=None):
    import jax

    d = device or jax.devices()[0]
    kind = getattr(d, "device_kind", "cpu").lower()
    for key, peaks in _CHIP_PEAKS.items():
        if key in kind:
            return peaks
    return _CHIP_PEAKS["cpu"]


def compiled_cost(jitted, *args) -> Dict[str, float]:
    """XLA cost_analysis of a jitted callable at the given args:
    {'flops': ..., 'bytes': ...} (0.0 when the backend reports nothing)."""
    compiled = jitted.lower(*args).compile()
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return {"flops": 0.0, "bytes": 0.0}
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    bytes_ = float(ca.get("bytes accessed", 0.0))
    return {"flops": flops, "bytes": bytes_}


def time_call(fn, *args, repeats: int = 10, warmup: int = 2) -> float:
    """Median steady-state seconds per call (device-fenced).

    NOTE: over the remote-TPU tunnel a single dispatch costs ~30 ms and
    identical repeated calls can be served from a result cache, so per-op
    device time must be measured with `time_looped` instead."""
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def make_looped(step_fn, chain_fn, R: int):
    """Build a jitted program running `step_fn` R times with a DATA-DEPENDENT
    carry (chain_fn folds each output back into the input), so the device
    must genuinely execute R sequential instances — immune to dispatch
    overhead, result caching, and loop-invariant hoisting."""
    import jax

    @jax.jit
    def run(carry, *rest):
        def body(_, c):
            return chain_fn(c, step_fn(c, *rest))
        return jax.lax.fori_loop(0, R, body, carry)

    return run


def time_looped(step_fn, chain_fn, carry, *rest, R: int = 64,
                repeats: int = 5) -> float:
    """Per-op device seconds: (t(R ops) - t(1 op)) / (R - 1).

    Two tunnel hazards (measured on the axon remote backend) shape this:
      * repeated calls with IDENTICAL argument values can be served from a
        client-side result cache (zero device work) — every timed call gets
        a distinct input via a tiny multiplicative salt on the first
        floating carry leaf;
      * `block_until_ready` can return before the remote computation is
        actually complete — completion is forced by a true device→host
        fetch (`np.asarray`) of every output leaf.  The fetch/dispatch cost
        is identical for the R-op and 1-op programs, so it cancels in the
        difference.
    """
    import jax
    import jax.numpy as jnp

    run_R = make_looped(step_fn, chain_fn, R)
    run_1 = make_looped(step_fn, chain_fn, 1)

    def salted(i):
        leaves, treedef = jax.tree_util.tree_flatten(carry)
        for j, x in enumerate(leaves):
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
                leaves[j] = x * (1.0 + 1e-7 * i)
                break
        return jax.tree_util.tree_unflatten(treedef, leaves)

    def fetch(out):
        for x in jax.tree_util.tree_leaves(out):
            if hasattr(x, "dtype"):
                np.asarray(x)

    def med(f):
        fetch(f(carry, *rest))  # warm-up / compile
        ts = []
        for i in range(1, repeats + 1):
            c = salted(i)
            fetch(c)  # materialize the salted input before the clock
            t0 = time.perf_counter()
            fetch(f(c, *rest))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    tR = med(run_R)
    t1 = med(run_1)
    return max(tR - t1, 1e-9) / (R - 1)


def _example_problem(N: int, obs_per_knot: int, gap_s: float, dtype,
                     seed: int = 0):
    import jax.numpy as jnp

    from vinsat_tpu.estimation import ba

    M = N * obs_per_knot
    rng = np.random.default_rng(seed)
    pos = rng.normal(size=(N, 3)) * 30 + np.array([6900.0, 0, 0])
    q = rng.normal(size=(N, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vel = rng.normal(size=(N, 3)) * 0.1 + np.array([0, 7.5, 0])
    states = jnp.asarray(np.concatenate([pos, q, vel], axis=1), dtype)
    gaps = jnp.asarray(np.r_[np.full(N - 1, gap_s), 0.0], dtype)
    cum = jnp.zeros((N, 4), dtype).at[:, 3].set(1.0)
    lm = jnp.asarray(pos[rng.integers(0, N, M)] * 0.92, dtype)
    uv = jnp.asarray(rng.uniform(0, 2000, size=(M, 2)), dtype)
    conf = jnp.asarray(rng.uniform(0.85, 1.0, M), dtype)
    ii = jnp.asarray(np.sort(rng.integers(0, N, M)), jnp.int32)
    prob = ba.BAProblem(
        gaps=gaps, cum_rot=cum, landmarks_xyz=lm, landmarks_uv=uv,
        conf=conf, ii=ii, obs_valid=jnp.ones(M, dtype),
        knot_valid=jnp.ones(N, dtype), pair_valid=jnp.ones(N - 1, dtype),
        intrinsics=jnp.asarray([3547.851, 3547.851, 2304.0, 1296.0], dtype),
    )
    return states, prob


def stage_programs(params, dtype):
    """The per-stage jitted programs (each a self-contained device program)."""
    import jax
    import jax.numpy as jnp

    from vinsat_tpu.estimation import ba, factors

    @jax.jit
    def factors_stage(states, prob):
        rp = factors.reprojection_factor(
            states, prob.landmarks_xyz, prob.ii, prob.intrinsics)
        dyn = factors.dynamics_factor(
            states, prob.gaps, prob.cum_rot, params.quat_coeff,
            params.vel_coeff, valid_pair=prob.pair_valid,
            num_hops=params.num_hops, max_substep=params.max_substep,
            with_jacobian=True)
        return rp.uv, rp.J, dyn.res_pv, dyn.A, dyn.B

    @jax.jit
    def assemble_stage(states, prob):
        N = states.shape[0]
        rp = factors.reprojection_factor(
            states, prob.landmarks_xyz, prob.ii, prob.intrinsics)
        r_obs = (prob.landmarks_uv - rp.uv) * prob.obs_valid[:, None]
        w = ba.robust_weights(r_obs, prob.conf, prob.obs_valid,
                              jnp.asarray(2))
        JgW = rp.J * w[:, None, None]
        G_obs = jnp.einsum("mki,mkj->mij", JgW, rp.J)
        D = jax.ops.segment_sum(G_obs, prob.ii, num_segments=N)
        g = jax.ops.segment_sum(
            jnp.einsum("mki,mk->mi", JgW, r_obs), prob.ii, num_segments=N)
        return D, g

    @jax.jit
    def solve_stage(D, U, b):
        return ba.jacobi_scaled_tridiag_solve(
            D, U, b, variant=params.tridiag_variant)

    @jax.jit
    def iteration_stage(states, prob):
        step = ba.ba_iteration(jnp.asarray(2), states, prob,
                               jnp.asarray(1e-4, dtype), params=params)
        return step.states

    return {
        "factors": factors_stage,
        "assemble": assemble_stage,
        "solve": solve_stage,
        "iteration": iteration_stage,
    }


def measure(N: int, obs_per_knot: int = 8, gap_s: float = 350.0,
            dtype_str: str = "float32", repeats: int = 5, loop_R: int = 64,
            params=None, stages=None) -> Dict[str, Dict[str, float]]:
    """Measure all stages at one problem size.

    Per-op device time comes from `time_looped` (R data-chained instances
    inside one jit, differenced against R=1) — the only scheme that survives
    remote-tunnel dispatch overhead and result caching.  FLOP/byte counts
    come from XLA cost_analysis of the single-op program (a static LOWER
    bound: while/λ-loop bodies are counted once).

    Returns {stage: {device_ms, gflops, gflops_per_s, gbytes, gbytes_per_s,
                     pct_peak_flops, pct_peak_bw}}.
    """
    import jax
    import jax.numpy as jnp

    from vinsat_tpu.estimation import ba, factors

    dtype = jnp.dtype(dtype_str)
    if params is None:
        params = ba.SolverParams(
            num_hops=int(np.ceil(gap_s / 100.0)) + 1, max_substep=100.0)
    states, prob = _example_problem(N, obs_per_knot, gap_s, dtype)
    progs = stage_programs(params, dtype)
    tiny = jnp.asarray(1e-30, dtype)

    peak_tflops, peak_gbs = chip_peaks()
    out: Dict[str, Dict[str, float]] = {}
    want = (lambda name: stages is None or name in stages)

    def record(name, t, cost):
        flops, bytes_ = cost["flops"], cost["bytes"]
        out[name] = {
            "device_ms": 1e3 * t,
            "gflops": flops / 1e9,
            "gflops_per_s": flops / t / 1e9,
            "gbytes": bytes_ / 1e9,
            "gbytes_per_s": bytes_ / t / 1e9,
            "pct_peak_flops": 100.0 * flops / t / (peak_tflops * 1e12),
            "pct_peak_bw": 100.0 * bytes_ / t / (peak_gbs * 1e9),
        }

    # ---- factors ---------------------------------------------------------
    def factors_step(st, prob):
        rp = factors.reprojection_factor(
            st, prob.landmarks_xyz, prob.ii, prob.intrinsics)
        dyn = factors.dynamics_factor(
            st, prob.gaps, prob.cum_rot, params.quat_coeff, params.vel_coeff,
            valid_pair=prob.pair_valid, num_hops=params.num_hops,
            max_substep=params.max_substep, with_jacobian=True)
        return (rp.uv.sum() + rp.J.sum() + dyn.res_pv.sum() + dyn.A.sum())

    chain = (lambda st, s: st + tiny * s)
    if want("factors"):
        t = time_looped(factors_step, chain, states, prob, R=loop_R,
                        repeats=repeats)
        record("factors", t, compiled_cost(progs["factors"], states, prob))

    # ---- assemble --------------------------------------------------------
    def assemble_step(st, prob):
        D, g = progs["assemble"].__wrapped__(st, prob)
        return D.sum() + g.sum()

    if want("assemble"):
        t = time_looped(assemble_step, chain, states, prob, R=loop_R,
                        repeats=repeats)
        record("assemble", t, compiled_cost(progs["assemble"], states, prob))

    # ---- solve -----------------------------------------------------------
    D_blocks, g = progs["assemble"](states, prob)
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N - 1, 9, 9), dtype) * 0.1
    U = jnp.einsum("tij,tkj->tik", A, A) * 0.01
    D_spd = D_blocks + 10.0 * jnp.eye(9, dtype=dtype)[None]

    # nested jit = a call boundary around the solve, so XLA schedules the
    # deep BCR graph the same way a standalone dispatch would (matches the
    # bench_kernels tridiag harness within noise).
    solve_jit = jax.jit(
        lambda D, U, b: ba.jacobi_scaled_tridiag_solve(
            D, U, b, variant=params.tridiag_variant))

    def solve_step(carry, U):
        D, b = carry
        return solve_jit(D, U, b)

    def solve_chain(carry, x):
        # fold the solution back into BOTH D and b: with a loop-invariant D
        # XLA hoists every D/U-only stage (LU factors, SPIKE spikes, BCR
        # reduction) out of the timing loop and the measurement only sees
        # the back-substitution — the real solver re-solves with a fresh
        # D + lambda*I every trial
        D, b = carry
        return (D + tiny * x[:, :, None] * x[:, None, :], b + tiny * x)

    if want("solve"):
        t = time_looped(solve_step, solve_chain, (D_spd, g), U,
                        R=loop_R, repeats=repeats)
        record("solve", t, compiled_cost(progs["solve"], D_spd, U, g))

    # ---- full iteration (natural state chaining) -------------------------
    def iter_step(st, prob):
        step = ba.ba_iteration(jnp.asarray(2), st, prob,
                               jnp.asarray(1e-4, dtype), params=params)
        return step.states

    if want("iteration"):
        t = time_looped(iter_step, (lambda st, out_st: out_st), states, prob,
                        R=loop_R, repeats=repeats)
        record("iteration", t,
               compiled_cost(progs["iteration"], states, prob))
    return out


def main(argv=None):
    import argparse
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,256,1024,4096")
    ap.add_argument("--obs-per-knot", type=int, default=8)
    ap.add_argument("--dtype", default=None,
                    help="default: f32 on accelerators, f64 on cpu")
    ap.add_argument("--repeats", type=int, default=10)
    ap.add_argument("--loop-r", type=int, default=64,
                    help="chained ops per timing program (lower at very "
                         "large N to bound program run time)")
    ap.add_argument("--batched-lambda", type=int, default=0,
                    help="SolverParams.batched_lambda for the iteration "
                         "stage (0 = sequential while_loop)")
    ap.add_argument("--stages", default=None,
                    help="comma list of stages to measure (default: all)")
    ap.add_argument("--tridiag-variant", default="auto",
                    help="force the block-tridiag solve algorithm "
                         "(auto|thomas|chunked|bcr1|bcr16)")
    args = ap.parse_args(argv)

    import jax

    platform = jax.devices()[0].platform
    if args.dtype is None:
        args.dtype = "float32" if platform != "cpu" else "float64"
    if args.dtype == "float64" or platform == "cpu":
        jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_default_matmul_precision", "highest")

    dev = jax.devices()[0]
    peak_tflops, peak_gbs = chip_peaks(dev)
    print(json.dumps({
        "device": str(dev), "kind": getattr(dev, "device_kind", "?"),
        "peak_tflops_bf16": peak_tflops, "peak_hbm_gbs": peak_gbs,
        "dtype": args.dtype,
    }))
    from vinsat_tpu.estimation import ba as _ba

    stages = args.stages.split(",") if args.stages else None
    for n in [int(s) for s in args.sizes.split(",")]:
        gap_s = 350.0
        params = _ba.SolverParams(
            num_hops=int(np.ceil(gap_s / 100.0)) + 1, max_substep=100.0,
            batched_lambda=args.batched_lambda,
            tridiag_variant=args.tridiag_variant)
        rep = measure(n, obs_per_knot=args.obs_per_knot,
                      dtype_str=args.dtype, repeats=args.repeats,
                      loop_R=args.loop_r, params=params, stages=stages)
        for stage, row in rep.items():
            print(json.dumps({
                "N": n, "stage": stage,
                **{k: round(v, 4) for k, v in row.items()},
            }))


if __name__ == "__main__":
    main()
