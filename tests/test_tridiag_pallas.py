"""Pallas single-kernel block parallel cyclic reduction (kernels/
tridiag_pallas).

Round-4 rework: the round-3 classic-CR kernel on (t, 9, 9) block arrays was
blocked on-TPU by Mosaic tile granularity (each block padded to a (16, 128)
tile — 25x VMEM, OOM above N~128; findings in
docs/PALLAS_TRIDIAG_NOTES.md).  The PCR kernel puts the block index on the
LANE axis ((k, k, n) layout) and replaces even/odd decimation with static
lane shifts, which Mosaic lowers natively.  Correctness is pinned here in
interpret mode (CPU, f64); the on-TPU timing lives in
kernels/bench_kernels.py.
"""
import numpy as np
import jax.numpy as jnp

from vinsat_tpu.estimation import ba
from vinsat_tpu.kernels.tridiag_pallas import block_tridiag_solve_pallas


def _problem(rng, N, k=9):
    A = rng.normal(size=(N, k, k)) * 0.1
    D = np.einsum("tij,tkj->tik", A, A) + np.eye(k)[None] * 3.0
    U = rng.normal(size=(N - 1, k, k)) * 0.05
    b = rng.normal(size=(N, k))
    return D, U, b


def test_pallas_pcr_matches_thomas_interpret(rng):
    for N in (5, 16, 64, 200, 256):
        D, U, b = _problem(rng, N)
        want = np.asarray(ba.block_tridiag_solve(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(b)))
        got = np.asarray(block_tridiag_solve_pallas(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(b), interpret=True))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 1e-9, (N, err)


def test_pcr_variant_on_dispatch_path(rng):
    """THROUGH the production entry point: jacobi_scaled_tridiag_solve with
    variant="pcr" (the branch the TPU f32 auto dispatch selects at
    64 <= N <= 1024) must match the Thomas variant.  Off-TPU the same
    branch runs the kernel in interpret mode, so this exercises the exact
    dispatch code path the solver takes in production."""
    for N in (64, 130, 257):
        D, U, b = _problem(rng, N)
        scale = 10.0 ** rng.uniform(-3, 3, size=(N, 9))
        D = D * scale[:, :, None] * scale[:, None, :]
        U = U * scale[:-1, :, None] * scale[1:, None, :]
        b = b * scale
        want = np.asarray(ba.jacobi_scaled_tridiag_solve(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(b),
            variant="thomas"))
        got = np.asarray(ba.jacobi_scaled_tridiag_solve(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(b), variant="pcr"))
        err = np.abs(got - want).max() / np.abs(want).max()
        assert err < 1e-9, (N, err)


def test_pallas_pcr_jacobi_scaled_interpret(rng):
    """Through the production conditioning: Jacobi-scale the ill-conditioned
    normal-equation-like blocks (1e6 span) then PCR-solve — matches the
    scaled Thomas path."""
    N, k = 64, 9
    D, U, b = _problem(rng, N)
    scale = 10.0 ** rng.uniform(-3, 3, size=(N, k))
    D = D * scale[:, :, None] * scale[:, None, :]
    U = U * scale[:-1, :, None] * scale[1:, None, :]
    b = b * scale
    want = np.asarray(ba.jacobi_scaled_tridiag_solve(
        jnp.asarray(D), jnp.asarray(U), jnp.asarray(b), variant="thomas"))

    diag = np.diagonal(D, axis1=-2, axis2=-1)
    s = 1.0 / np.sqrt(np.maximum(diag, 1e-30))
    Ds = D * s[:, :, None] * s[:, None, :]
    Us = U * s[:-1, :, None] * s[1:, None, :]
    got = s * np.asarray(block_tridiag_solve_pallas(
        jnp.asarray(Ds), jnp.asarray(Us), jnp.asarray(b * s),
        interpret=True))
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 1e-9, err
