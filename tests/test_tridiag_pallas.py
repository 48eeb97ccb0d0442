"""Pallas single-kernel block cyclic reduction (kernels/tridiag_pallas).

The kernel is blocked on-TPU by Mosaic tile granularity (each (t, 9, 9)
block pads to a (16, 128) vector tile - 25x VMEM inflation, OOM above
N~128; docs/BENCHMARKS.md round 3), but its algorithm is kept validated in
interpret mode so it stays ready for future toolchains.
"""
import numpy as np
import jax.numpy as jnp

from vinsat_tpu.estimation import ba
from vinsat_tpu.kernels.tridiag_pallas import block_tridiag_solve_pallas


def test_pallas_bcr_matches_thomas_interpret(rng):
    for N in (5, 16, 64):
        k = 9
        A = rng.normal(size=(N, k, k)) * 0.1
        D = np.einsum("tij,tkj->tik", A, A) + np.eye(k)[None] * 3.0
        U = rng.normal(size=(N - 1, k, k)) * 0.05
        b = rng.normal(size=(N, k))
        want = np.asarray(ba.block_tridiag_solve(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(b)))
        got = np.asarray(block_tridiag_solve_pallas(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(b), interpret=True))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 1e-9, (N, err)
