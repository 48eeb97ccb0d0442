"""Measured Pallas-vs-XLA crossover for the two custom kernels.

VERDICT r1 #3: "no default-off kernels without data".  This benchmark times,
at a sweep of production sizes on the attached chip:

  * kernels/matching.visible_count (Pallas tiled visibility gate) vs the
    pure-XLA broadcast reference — the sim's per-frame imaging gate
    (F frames x L landmarks interval test);
  * kernels/normal_eq.assemble_normal_eq (fused robust-weight Gram +
    gradient) vs the XLA einsum pair — the per-knot-budget BA assembly
    used by the sharded path (dist/sharded_ba.py).

Prints one JSON line per (kernel, size) with steady-state times and the
winner.  Results are recorded in docs/BENCHMARKS.md; the production
defaults (use_pallas_gate / use_pallas_assembly) follow the measured
winner per regime.

Run: python -m vinsat_tpu.kernels.bench_kernels
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


INNER = 4  # per-dispatch amortization: remote-tunnel dispatch costs ~30 ms,
# so each timed call runs the op INNER times inside one jit (perturbed
# inputs to defeat CSE) and reports device time per op


def _time(fn, *args, repeats=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / INNER


def bench_visible_count(sizes=((1024, 2048), (4096, 8192), (16384, 16896))):
    import jax
    import jax.numpy as jnp

    from vinsat_tpu.kernels import matching

    on_tpu = jax.devices()[0].platform != "cpu"
    rows = []
    for F, L in sizes:
        rng = np.random.default_rng(0)
        bounds = np.stack([
            rng.uniform(-180, 175, F), rng.uniform(-80, 75, F),
            np.zeros(F), np.zeros(F)], axis=1)
        bounds[:, 2] = bounds[:, 0] + 5.0
        bounds[:, 3] = bounds[:, 1] + 4.0
        lon = jnp.asarray(rng.uniform(-180, 180, L), jnp.float32)
        lat = jnp.asarray(rng.uniform(-85, 85, L), jnp.float32)
        best = jnp.asarray(rng.random(L) < 0.3, jnp.float32)
        b = jnp.asarray(bounds, jnp.float32)

        def rep(kernel):
            @jax.jit
            def f(b, lon, lat, best):
                acc = jnp.zeros((), jnp.float32)
                for i in range(INNER):
                    acc = acc + kernel(b + i * 1e-4, lon, lat,
                                       best).sum().astype(jnp.float32)
                return acc
            return f

        ref = rep(matching.visible_count_reference)
        t_ref = _time(ref, b, lon, lat, best)
        if on_tpu:
            t_pal = _time(rep(matching.visible_count), b, lon, lat, best)
        else:
            t_pal = float("nan")
        # correctness cross-check
        r = np.asarray(matching.visible_count_reference(b, lon, lat, best))
        if on_tpu:
            p = np.asarray(matching.visible_count(b, lon, lat, best))
            assert (r == p).all(), "pallas/XLA visibility mismatch"
        rows.append({
            "kernel": "visible_count", "F": F, "L": L,
            "xla_ms": round(t_ref * 1e3, 3), "pallas_ms": round(t_pal * 1e3, 3),
            "speedup_pallas": round(t_ref / t_pal, 2) if t_pal == t_pal else None,
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_assemble(sizes=((256, 8), (1024, 8), (4096, 8), (4096, 16))):
    import jax
    import jax.numpy as jnp

    from vinsat_tpu.kernels import normal_eq

    on_tpu = jax.devices()[0].platform != "cpu"
    rows = []
    for N, D in sizes:
        rng = np.random.default_rng(0)
        J = jnp.asarray(rng.normal(size=(N, D, 2, 9)), jnp.float32)
        r = jnp.asarray(rng.normal(size=(N, D, 2)), jnp.float32)
        w = jnp.asarray(rng.random((N, D)), jnp.float32)

        def rep(kernel):
            @jax.jit
            def f(J, r, w):
                acc = jnp.zeros((), jnp.float32)
                for i in range(INNER):
                    G, g = kernel(J, r, w + i * 1e-4)
                    acc = acc + G.sum() + g.sum()
                return acc
            return f

        t_ref = _time(rep(normal_eq.assemble_normal_eq_reference), J, r, w)
        if on_tpu:
            t_pal = _time(rep(normal_eq.assemble_normal_eq), J, r, w)
            Gp, gp = normal_eq.assemble_normal_eq(J, r, w)
        else:
            t_pal = float("nan")
        Gr, gr = normal_eq.assemble_normal_eq_reference(J, r, w)
        if on_tpu:
            np.testing.assert_allclose(np.asarray(Gp), np.asarray(Gr),
                                       rtol=2e-4, atol=2e-3)
        rows.append({
            "kernel": "assemble_normal_eq", "N": N, "D": D,
            "xla_ms": round(t_ref * 1e3, 3), "pallas_ms": round(t_pal * 1e3, 3),
            "speedup_pallas": round(t_ref / t_pal, 2) if t_pal == t_pal else None,
        })
        print(json.dumps(rows[-1]), flush=True)
    return rows


def bench_tridiag(sizes=(256, 1024, 4096), k=9, R=32, repeats=3):
    """Block-tridiagonal solve variants (the jacobi_scaled dispatch data).

    D-chained loop differencing (utils.mfu.time_looped: the solution is
    folded back into D AND b each step, so no D/U-only stage — LU factors,
    SPIKE spikes, BCR reduction — can be hoisted out of the timing loop).
    Each variant is wrapped in a nested jit so XLA schedules it as a
    standalone dispatch.  Correctness is pinned to the Thomas scan.
    """
    import jax
    import jax.numpy as jnp

    from vinsat_tpu.estimation import ba
    from vinsat_tpu.utils import mfu

    rows = []
    for N in sizes:
        rng = np.random.default_rng(0)
        A = rng.normal(size=(N, k, k))
        D = jnp.asarray(np.einsum("tij,tkj->tik", A, A) + 10.0 * np.eye(k),
                        jnp.float32)
        U = jnp.asarray(rng.normal(size=(N - 1, k, k)) * 0.3, jnp.float32)
        b = jnp.asarray(rng.normal(size=(N, k)), jnp.float32)
        x_ref = np.asarray(ba.block_tridiag_solve(D, U, b))
        ref_norm = float(np.linalg.norm(x_ref))

        variants = {
            "thomas": ba.block_tridiag_solve,
            "chunked_spike": lambda D, U, b: ba.block_tridiag_solve_chunked(
                D, U, b, ba._auto_chunks(D.shape[0])),
            "bcr_base1": lambda D, U, b: ba.block_tridiag_solve_bcr(
                D, U, b, base=1),
            "bcr_base16": lambda D, U, b: ba.block_tridiag_solve_bcr(
                D, U, b, base=16),
        }
        for m in (8, 16, 32):
            if N % m == 0 and N // m >= 4:
                variants[f"chunked_bcrred_m{m}"] = (
                    lambda D, U, b, m=m: ba.block_tridiag_solve_chunked(
                        D, U, b, D.shape[0] // m, reduced="bcr"))
        # single-kernel PCR: batch-on-lanes layout, all levels VMEM-resident
        # (kernels/tridiag_pallas.py; the round-3 (t,9,9) CR layout it
        # replaces is documented in docs/PALLAS_TRIDIAG_NOTES.md)
        from vinsat_tpu.kernels.tridiag_pallas import (
            block_tridiag_solve_pallas)

        variants["pallas_pcr"] = block_tridiag_solve_pallas
        for name, fn in variants.items():
            f = jax.jit(fn)
            x = np.asarray(f(D, U, b))
            rel = float(np.linalg.norm(x - x_ref)) / ref_norm

            def step(carry, Uc, f=f):
                DD, bb = carry
                return f(DD, Uc, bb)

            def chain(carry, out):
                DD, bb = carry
                return (DD + 1e-30 * out[:, :, None] * out[:, None, :],
                        bb + 1e-30 * out)

            t = mfu.time_looped(step, chain, (D, b), U, R=R,
                                repeats=repeats)
            rows.append({"kernel": "block_tridiag", "variant": name, "N": N,
                         "device_ms": round(t * 1e3, 3),
                         "rel_err_vs_thomas": float(f"{rel:.2e}")})
            print(json.dumps(rows[-1]), flush=True)
    return rows


def main(argv=None):
    import argparse

    import jax

    ap = argparse.ArgumentParser()
    ap.add_argument("benches", nargs="*",
                    default=["visible_count", "assemble"],
                    choices=["visible_count", "assemble", "tridiag"],
                    help="which benchmarks to run (default: the two "
                         "Pallas-vs-XLA kernels; 'tridiag' sweeps the "
                         "block-tridiagonal solve variants)")
    args = ap.parse_args(argv)

    jax.config.update("jax_default_matmul_precision", "highest")
    from vinsat_tpu.utils.cache import configure_persistent_cache

    configure_persistent_cache("/root/repo/.jax_cache")
    print(json.dumps({"device": str(jax.devices()[0])}))
    if "visible_count" in args.benches:
        bench_visible_count()
    if "assemble" in args.benches:
        bench_assemble()
    if "tridiag" in args.benches:
        bench_tridiag()


if __name__ == "__main__":
    main()
