"""Robust Levenberg–Marquardt bundle adjustment, structure-exploiting.

One `ba_iteration` == one call of the reference's BA (BA_filtering.py:4-98):
robust-weighted reprojection term + RK4 dynamics term + exact quaternion
Newton term, damped solve, multiplicative quaternion retraction, λ escalation
until the residual drops.

TPU-first redesign vs the reference:
  * The normal matrix is never materialized dense.  JgᵀWJg is block-diagonal
    (segment-sum over observations), JfᵀΣJf and the quaternion Hessian are
    block-tridiagonal (dynamics couple only adjacent knots), so the damped
    system is solved with a **block-tridiagonal Thomas solver** — O(N·9³)
    instead of the reference's dense O((9N)³) torch.linalg.solve
    (BA_filtering.py:55).
  * All shapes are static: windows are padded to bucket sizes with validity
    masks (obs_valid / knot_valid / pair_valid), so the whole iteration jits
    once per bucket.
  * The λ loop is a lax.while_loop; the whole 20-iteration window solve is a
    lax.fori_loop (estimation/window.py) — zero host round-trips per window.

Schedules replicated exactly: robust α anneal 2→1 over 5 iters and
Σ = min(10000·(iter+1)², 1e6) (BA_filtering.py:22-26), λ ∈ [1e-4, 1e4] ×10
(BA_filtering.py:50-79), quat/vel coeff 100 (BA_filtering.py:11-12),
vision-only `initialize` short-circuit (BA_utils.py:463-466).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import numpy as np
import jax.numpy as jnp

from vinsat_tpu.core import quat
from vinsat_tpu.estimation import factors


class BAProblem(NamedTuple):
    """Static-shape (padded) window problem.

    N knots, M observations.  Padded observations must have obs_valid=0 and
    ii=0; padded knots knot_valid=0 and gaps=0; pair_valid masks dynamics
    pairs (t, t+1) that are fully inside the valid range.
    """

    gaps: jnp.ndarray  # (N,) seconds to next knot
    cum_rot: jnp.ndarray  # (N, 4) cumulative IMU rotation over each gap
    landmarks_xyz: jnp.ndarray  # (M, 3) km ECI
    landmarks_uv: jnp.ndarray  # (M, 2) px
    conf: jnp.ndarray  # (M,)
    ii: jnp.ndarray  # (M,) int32 obs -> knot
    obs_valid: jnp.ndarray  # (M,) 0/1
    knot_valid: jnp.ndarray  # (N,) 0/1
    pair_valid: jnp.ndarray  # (N-1,) 0/1
    intrinsics: jnp.ndarray  # (4,)


class SolverParams(NamedTuple):
    quat_coeff: float = 100.0
    vel_coeff: float = 100.0
    sigma_scale: float = 10000.0
    sigma_max: float = 1.0e6
    lambda_max: float = 1.0e4
    lambda_growth: float = 10.0
    num_hops: int = 16
    max_substep: float = 100.0
    # 0 = sequential λ escalation (reference-exact while_loop); K > 0 =
    # evaluate K λ candidates λ0·g^k in ONE vmapped solve+trial and select
    # the first accepted — same acceptance semantics, sequential depth of a
    # single trial.  K must cover the λ range: ceil(log_g(λ_max/1e-4)) + 1
    # = 9 at the default schedule (λ0 is clamped to ≥ 1e-4 between
    # iterations, window.py resets to lambda_init = 1e-4).
    batched_lambda: int = 0
    # Iteration extension past the reference-exact `num_iters`
    # (window._lm_loop): max_iters=0 disables (exact fixed-count
    # fori_loop, returns the LAST iterate).  max_iters > num_iters runs
    # extra iterations and returns the BEST-residual iterate.  With the
    # default conv_patience (>= any extra budget) the loop ALWAYS runs
    # max_iters — measured necessity: short weakly-observable windows (a
    # single ~4 min detection pass in a 3 h arc, seed-11 of the 16-orbit
    # eval) improve 38.7 km @ 20 iters -> 9.2 @ 40 -> 1.65 @ 60 (= the
    # f64 result) while the RESIDUAL moves < 1%, so residual-gated early
    # stopping returned a 30.4 km iterate (measured on the captured
    # window).  Setting conv_patience < max_iters - num_iters opts into
    # that residual-gated early stop where throughput matters more than
    # worst-case windows.
    max_iters: int = 0
    conv_rtol: float = 0.01
    conv_patience: int = 10_000
    # Block-tridiagonal solve algorithm: "auto" picks by N (see
    # jacobi_scaled_tridiag_solve); "thomas" / "chunked" / "chunked_bcr" /
    # "bcr1" / "bcr16" force a variant (benchmark + regression escape
    # hatch — all variants agree to f32 roundoff under Jacobi scaling).
    tridiag_variant: str = "auto"


def _masked_median(x, valid):
    """Median of |x| over valid entries (c_obs, BA_filtering.py:23)."""
    flat = jnp.abs(x).reshape(-1)
    vmask = jnp.broadcast_to(valid[..., None], x.shape).reshape(-1) > 0
    big = jnp.where(vmask, flat, jnp.inf)
    order = jnp.sort(big)
    n = vmask.sum()
    lo = jnp.clip((n - 1) // 2, 0, flat.shape[0] - 1)
    hi = jnp.clip(n // 2, 0, flat.shape[0] - 1)
    return 0.5 * (order[lo] + order[hi])


def robust_weights(r_obs, conf, obs_valid, sched_iter):
    """Adaptive Barron-style robust weights (BA_filtering.py:22-25).

    alpha anneals 2 -> 1 over iterations; weights are normalized by their max
    and scaled by detection confidence.
    """
    it = sched_iter.astype(r_obs.dtype)
    alpha = jnp.clip(1.0 - (2.0 * (it / 5.0) - 1.0), 1.0, 2.0)
    c = _masked_median(r_obs, obs_valid)
    c = jnp.maximum(c, 1e-12)
    x2 = (r_obs / c) ** 2
    denom = jnp.maximum(jnp.abs(alpha - 2.0), 1e-12)
    w_elem = ((x2 / denom + 1.0) ** (alpha / 2.0 - 1.0)) / (c * c)
    w_elem = jnp.where(alpha >= 2.0 - 1e-9, jnp.ones_like(w_elem) / (c * c), w_elem)
    w = w_elem.mean(axis=-1)  # (M,)
    w = w * obs_valid
    w = w / jnp.maximum(w.max(), 1e-30)
    return w * conf * obs_valid  # (M,)


def gj_solve_small(A, B, pivot: bool = False):
    """Batched small-block solve A x = B via UNROLLED Gauss-Jordan.

    XLA lowers `jnp.linalg.solve` on many tiny blocks to a sequential LU
    pivot loop that runs ~100x off bandwidth on TPU (measured on v5e:
    4.9 ms for a batch of 2048 9x9 solves vs ~20 us of data movement;
    cho_solve only 2x better).  k static pivot steps of fully batched
    elementwise ops instead — linear in batch size, no per-element
    sequential work.

    A (..., k, k), B (..., k, r).  pivot=True adds partial (row) pivoting
    with one batched argmax+gather per step; the Jacobi-scaled SPD blocks
    on the solver hot path are safe without it (diagonal pivots are the
    Schur-complement diagonals, bounded below by the scaled system's
    smallest eigenvalue).
    """
    k = A.shape[-1]
    M = jnp.concatenate([A, B], axis=-1)  # (..., k, k+r)
    rows = jnp.arange(k)
    for i in range(k):
        if pivot:
            col = jnp.abs(M[..., :, i])
            col = jnp.where(rows < i, -jnp.inf, col)
            p = jnp.argmax(col, axis=-1)  # (...,) best pivot row >= i
            perm = jnp.where(rows == i, p[..., None],
                             jnp.where(rows == p[..., None], i, rows))
            M = jnp.take_along_axis(M, perm[..., :, None], axis=-2)
        piv = M[..., i, i][..., None]
        row_i = M[..., i, :] / piv  # (..., k+r)
        M = M - M[..., :, i][..., None] * row_i[..., None, :]
        M = M.at[..., i, :].set(row_i)
    return M[..., k:]


def block_tridiag_solve(D, U, b):
    """Solve the symmetric block-tridiagonal system
        [D_0 U_0          ] [x_0]   [b_0]
        [U_0^T D_1 U_1    ] [x_1] = [b_1]   ...
    with 9x9 blocks via the Thomas algorithm (two lax.scans).

    D (N, k, k), U (N-1, k, k), b (N, k) -> x (N, k).
    For matrix right-hand sides (N, k, r) use block_tridiag_solve_multi.
    """
    x = block_tridiag_solve_blockrhs(D, U, b[..., None])
    return x[..., 0]


def block_tridiag_solve_blockrhs(D, U, B):
    """Thomas solve with a block RHS B (N, k, R) -> X (N, k, R).

    One LU factorization per row for ALL R right-hand-side columns plus the
    coupling block (a single jnp.linalg.solve with a (k, k+R) RHS) — the
    column-wise vmap variant factorizes the same 9x9 row block R+1 times.
    """
    N, k, _ = D.shape
    R = B.shape[-1]

    # Row t eliminates with U_{t-1} (the sub-diagonal block, = U_{t-1}^T) and
    # prepares C_t = denom^{-1} U_t for the next row.
    U_pad = jnp.concatenate([U, jnp.zeros((1, k, k), D.dtype)], axis=0)  # U_t
    U_prev = jnp.concatenate([jnp.zeros((1, k, k), D.dtype), U], axis=0)

    def fwd(carry, inp):
        C_prev, d_prev = carry
        Dt, Utm1, Ut, Bt = inp
        denom = Dt - Utm1.T @ C_prev
        rhs = jnp.concatenate([Ut, Bt - Utm1.T @ d_prev], axis=1)
        sol = gj_solve_small(denom, rhs)
        C_t, d_t = sol[:, :k], sol[:, k:]
        return (C_t, d_t), (C_t, d_t)

    # carries built with zeros_like so they inherit the inputs' manual-axis
    # varying-ness (required when this runs inside shard_map)
    init = (jnp.zeros_like(D[0]), jnp.zeros_like(B[0]))
    _, (Cs, ds) = jax.lax.scan(fwd, init, (D, U_prev, U_pad, B))

    def bwd(x_next, inp):
        C_t, d_t = inp
        x_t = d_t - C_t @ x_next
        return x_t, x_t

    _, xs_rev = jax.lax.scan(bwd, jnp.zeros_like(B[0]), (Cs, ds),
                             reverse=True)
    return xs_rev


def jacobi_scaled_tridiag_solve(D, U, b, variant: str = "auto"):
    """block_tridiag_solve with symmetric Jacobi (diagonal) preconditioning.

    The normal-equation blocks span ~1e12 in magnitude (pixel-scale
    JgᵀWJg vs Σ·AᵀA with 1000-s transition sensitivities), which is fatal in
    f32 — the TPU production dtype.  Scaling by s = diag(H)^{-1/2} brings
    the system to O(1) condition per block: solve (SHS)(S⁻¹x) = Sb.

    variant: "auto" dispatches on N (see below); "thomas" / "chunked" /
    "chunked_bcr" / "bcr1" / "bcr16" / "pcr" force an algorithm
    (SolverParams.tridiag_variant).
    """
    diag = jnp.diagonal(D, axis1=-2, axis2=-1)  # (N, k)
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    Ds = D * s[:, :, None] * s[:, None, :]
    Us = U * s[:-1, :, None] * s[1:, None, :]
    bs = b * s
    N = D.shape[0]
    # log-depth cyclic reduction: the sequential scan is the measured
    # latency bottleneck at production N (docs/BENCHMARKS.md MFU table).
    # v5e D-chained measurements (bench_kernels tridiag, reproducible ±15%):
    # bcr16 wins 64 <= N <= 512 (0.08/0.29/0.33/0.39 ms at 64/128/256/512
    # vs chunked SPIKE's 0.8/1.1/1.6/1.8).  Pure BCR beyond ~10 levels hits
    # an XLA composition pathology (150 ms at N=4096 / 12 levels while
    # every constituent batched op measures <0.25 ms; reproduces under
    # D-chained timing, so it is not a hoisting artifact).  At N >= 1024
    # the HYBRID — vmapped SPIKE chunks of m=32 + log-depth cyclic
    # reduction of the reduced boundary system (_tridiag_general_bcr,
    # <= ~8 levels, below the pathology threshold) — wins: 1.35/5.2 ms at
    # N=1024/4096 vs the Thomas-reduced chunked SPIKE's 3.5/8.8 ms.
    # Below 64 _auto_chunks degenerates to the plain Thomas scan: it
    # measures no slower in the full-iteration context, and it keeps the
    # single-chip solve algorithm-identical to the sharded SPIKE path at
    # the sizes test_sharded_ba pins bit-for-bit.
    #
    # TPU f32 at 64 <= N <= 1024 takes the single-kernel Pallas PCR solve
    # (kernels/tridiag_pallas): all ~2·log2(N) reduction levels run VMEM-
    # resident in ONE kernel, removing the per-level fusion-boundary/HBM
    # latency the XLA variants pay — v5e D-chained solve times 0.012 ms at
    # N=256 vs bcr16's 0.17, 0.079 ms at N=1024 vs chunked_bcr's 1.39
    # (docs/BENCHMARKS.md "Pallas PCR").  f64 streams (CPU, and the
    # recover_f64 escalation re-solve) keep the XLA crossovers; above
    # N=1024 the PCR scratch exceeds the 16 MB scoped-VMEM limit.
    if variant == "auto":
        if 64 <= N <= 1024 and D.dtype == jnp.float32 and _pcr_capable():
            variant = "pcr"
        elif 64 <= N < 1024:
            variant = "bcr16"
        elif N >= 1024 and N % 32 == 0:
            variant = "chunked_bcr"
        else:
            variant = "chunked"
    if variant == "pcr":
        from vinsat_tpu.kernels.tridiag_pallas import (
            block_tridiag_solve_pallas)

        # explicit "pcr" off-TPU runs in interpret mode (slow — test path)
        xs = block_tridiag_solve_pallas(Ds, Us, bs,
                                        interpret=not _pcr_capable())
    elif variant == "thomas":
        xs = block_tridiag_solve(Ds, Us, bs)
    elif variant == "chunked":
        xs = block_tridiag_solve_chunked(Ds, Us, bs, _auto_chunks(N))
    elif variant == "chunked_bcr":
        xs = block_tridiag_solve_chunked(Ds, Us, bs, _bcr_chunks(N),
                                         reduced="bcr")
    elif variant == "bcr1":
        xs = block_tridiag_solve_bcr(Ds, Us, bs, base=1)
    elif variant == "bcr16":
        xs = block_tridiag_solve_bcr(Ds, Us, bs, base=16)
    else:
        raise ValueError(f"unknown tridiag variant {variant!r}")
    return xs * s


def _pcr_capable() -> bool:
    """True when the default backend Mosaic-compiles the Pallas PCR kernel
    (TPU).  Evaluated at trace time: the jit trace cache keys on the
    default-device/backend context, and the one cross-backend hand-off on
    the hot path (the recover_f64 CPU escalation) re-solves in f64, which
    the auto dispatch already excludes by dtype."""
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _bcr_chunks(N: int) -> int:
    """Chunk count for the BCR-reduced chunked SPIKE: the largest power-of-
    two divisor of N keeping local chunks of m >= 32 rows — m=32 measured
    fastest on the v5e at N=1024/4096 (1.35/5.2 ms; the reduced BCR's
    <= ~8 levels stay below the deep-graph pathology threshold)."""
    c = 1
    while N % (2 * c) == 0 and N // (2 * c) >= 32:
        c *= 2
    return c


def _auto_chunks(N: int) -> int:
    """Largest power-of-two divisor of N that is <= sqrt(N) (and >= 2 only
    when worthwhile): minimizes sequential depth m + 2C of the chunked
    SPIKE solve.  Small windows stay on the plain scan."""
    if N < 128:
        return 1
    c = 1
    while (2 * c) * (2 * c) <= N and N % (2 * c) == 0:
        c *= 2
    return c


def block_tridiag_solve_multi(D, U, B):
    """block_tridiag_solve with a matrix RHS: B (N, k, r) -> X (N, k, r)."""
    return block_tridiag_solve_blockrhs(D, U, B)


def _tridiag_general(Dr, Ur, Lr, br):
    """General (nonsymmetric) block-tridiagonal Thomas: Lr[c] couples row c
    to row c-1 (Lr[0] ignored), Ur[c] couples row c to c+1 (Ur[-1] ignored).
    Dr (C, k, k), br (C, k)."""
    C, k, _ = Dr.shape
    Ur_pad = jnp.concatenate([Ur, jnp.zeros((1, k, k), Dr.dtype)], axis=0)

    def fwd(carry, inp):
        C_prev, d_prev = carry
        Dt, Lt, Ut, bt = inp
        denom = Dt - Lt @ C_prev
        rhs = jnp.concatenate([Ut, (bt - Lt @ d_prev)[:, None]], axis=1)
        # the general (SPIKE-reduced) blocks are near-identity but not SPD:
        # keep partial pivoting (cost: C tiny gathers per solve)
        sol = gj_solve_small(denom, rhs, pivot=True)
        return (sol[:, :k], sol[:, k]), (sol[:, :k], sol[:, k])

    # init carry from Lr (not Dr): when this runs inside shard_map the
    # diagonal may be a broadcast (unvaried) identity while the couplings
    # vary over the manual axis — the carry must inherit the varying-ness
    init = (jnp.zeros_like(Lr[0]), jnp.zeros_like(br[0]))
    _, (Cs, ds) = jax.lax.scan(fwd, init, (Dr, Lr, Ur_pad, br))

    def bwd(x_next, inp):
        C_t, d_t = inp
        x_t = d_t - C_t @ x_next
        return x_t, x_t

    _, xs = jax.lax.scan(bwd, jnp.zeros_like(br[0]), (Cs, ds), reverse=True)
    return xs


def _tridiag_general_bcr(Dr, Ur, Lr, br, base: int = 4):
    """General (nonsymmetric) block cyclic reduction: log-depth solve of
        L_t y_{t-1} + D_t y_t + U_t y_{t+1} = b_t
    (Lr[0] and Ur[-1] ignored).  The chunked-SPIKE reduced system is itself
    block-tridiagonal over the C chunks, and the C-step `_tridiag_general`
    Thomas recursion is the SEQUENTIAL-DEPTH floor of the whole chunked
    solve at large N — this cuts it to 2 log2(C/base) + base levels of
    fully batched ops, enabling many more (smaller) chunks.

    Elimination of the odd rows (o = 2t+1):
        y_o = D_o^{-1} (b_o - L_o y_e(t) - U_o y_e(t+1))
        D'_t = D_e - U_e D_{o(t)}^{-1} L_{o(t)} - L_e D_{o(t-1)}^{-1} U_{o(t-1)}
        U'_t = -U_e D_{o(t)}^{-1} U_{o(t)}
        L'_t = -L_e D_{o(t-1)}^{-1} L_{o(t-1)}
    C is padded to a power of two with identity diagonals.
    """
    C, k, _ = Dr.shape
    n = 1 << (max(C, 2) - 1).bit_length()
    eye = jnp.eye(k, dtype=Dr.dtype)
    Dp = jnp.broadcast_to(eye, (n, k, k)).at[:C].set(Dr)
    Up = jnp.zeros((n, k, k), Dr.dtype).at[: C - 1].set(Ur[: C - 1])
    Lp = jnp.zeros((n, k, k), Dr.dtype).at[1:C].set(Lr[1:C])
    bp = jnp.zeros((n, k), Dr.dtype).at[:C].set(br)

    stack = []
    while n > max(base, 1):
        D2 = Dp.reshape(n // 2, 2, k, k)
        U2 = Up.reshape(n // 2, 2, k, k)
        L2 = Lp.reshape(n // 2, 2, k, k)
        b2 = bp.reshape(n // 2, 2, k)
        D_e, D_o = D2[:, 0], D2[:, 1]
        U_e, U_o = U2[:, 0], U2[:, 1]  # U_e: even->odd(same t); U_o: odd->even(t+1)
        L_e, L_o = L2[:, 0], L2[:, 1]  # L_o: odd->even(same t); L_e: even->odd(t-1)
        b_e, b_o = b2[:, 0], b2[:, 1]

        # one batched solve of D_o against [L_o | U_o | b_o]
        rhs = jnp.concatenate([L_o, U_o, b_o[..., None]], axis=-1)
        sol = gj_solve_small(D_o, rhs, pivot=True)
        Dinv_L = sol[..., :k]
        Dinv_U = sol[..., k:2 * k]
        Dinv_b = sol[..., 2 * k]
        stack.append((Dinv_L, Dinv_U, Dinv_b))

        # same-t odd contributions (through U_e)
        D_new = D_e - jnp.einsum("tij,tjk->tik", U_e, Dinv_L)
        U_new = -jnp.einsum("tij,tjk->tik", U_e, Dinv_U)
        b_new = b_e - jnp.einsum("tij,tj->ti", U_e, Dinv_b)
        # previous-t odd contributions: even row 2t couples DOWN to odd
        # 2t-1 through L_e[t], which pairs with the t-1 odd's factors
        zkk = jnp.zeros((1, k, k), Dr.dtype)
        zk = jnp.zeros((1, k), Dr.dtype)
        Dinv_L_prev = jnp.concatenate([zkk, Dinv_L[:-1]], axis=0)
        Dinv_U_prev = jnp.concatenate([zkk, Dinv_U[:-1]], axis=0)
        Dinv_b_prev = jnp.concatenate([zk, Dinv_b[:-1]], axis=0)
        D_new = D_new - jnp.einsum("tij,tjk->tik", L_e, Dinv_U_prev)
        L_new = -jnp.einsum("tij,tjk->tik", L_e, Dinv_L_prev)
        b_new = b_new - jnp.einsum("tij,tj->ti", L_e, Dinv_b_prev)

        Dp, Up, Lp, bp = D_new, U_new, L_new, b_new
        n //= 2

    if n == 1:
        y = gj_solve_small(Dp[0], bp[0][:, None], pivot=True)[:, 0][None]
    else:
        y = _tridiag_general(Dp, Up[:-1], Lp, bp)

    for Dinv_L, Dinv_U, Dinv_b in reversed(stack):
        y_e = y
        y_e_next = jnp.concatenate(
            [y_e[1:], jnp.zeros((1, k), Dr.dtype)], axis=0)
        y_o = (Dinv_b
               - jnp.einsum("tij,tj->ti", Dinv_L, y_e)
               - jnp.einsum("tij,tj->ti", Dinv_U, y_e_next))
        y = jnp.stack([y_e, y_o], axis=1).reshape(2 * y_e.shape[0], k)
    return y[:C]


def block_tridiag_solve_chunked(D, U, b, num_chunks: int,
                                reduced: str = "thomas"):
    """Single-chip PARALLEL block-tridiagonal solve: SPIKE over vmapped
    chunks.

    The sequential Thomas scan is the latency bottleneck at large N (one
    9x9 solve per knot, serially).  Splitting the N rows into `num_chunks`
    chunks, Thomas-eliminating all chunks IN PARALLEL (vmap), solving the
    small 2*num_chunks boundary system sequentially, and back-substituting
    in parallel cuts the sequential depth from N to N/num_chunks +
    2*num_chunks.  Same math as the multi-chip SPIKE (dist/tridiag.py) with
    vmap standing in for the mesh.

    N must be divisible by num_chunks; pass num_chunks=1 to fall back to
    the plain scan.
    """
    N, k, _ = D.shape
    if num_chunks <= 1:
        return block_tridiag_solve(D, U, b)
    assert N % num_chunks == 0, (N, num_chunks)
    m = N // num_chunks
    U_pad = jnp.concatenate([U, jnp.zeros((1, k, k), D.dtype)], axis=0)
    Dc = D.reshape(num_chunks, m, k, k)
    Uc = U_pad.reshape(num_chunks, m, k, k)  # Uc[c, -1] couples to chunk c+1
    bc = b.reshape(num_chunks, m, k)
    # left-boundary coupling for each chunk = previous chunk's last U
    U_prev_last = jnp.concatenate(
        [jnp.zeros((1, k, k), D.dtype), Uc[:-1, -1]], axis=0
    )

    def local(Dl, Ul, bl, Upl):
        L_first = Upl.T
        U_inner = Ul[:-1]
        rhs = jnp.zeros((m, k, 1 + 2 * k), D.dtype)
        rhs = rhs.at[:, :, 0].set(bl)
        rhs = rhs.at[0, :, 1:1 + k].set(L_first)
        rhs = rhs.at[-1, :, 1 + k:].set(Ul[-1])
        sol = block_tridiag_solve_blockrhs(Dl, U_inner, rhs)
        return sol[..., 0], sol[..., 1:1 + k], sol[..., 1 + k:]

    g, V, W = jax.vmap(local)(Dc, Uc, bc, U_prev_last)  # (C, m, ...)

    # The reduced system in the boundary unknowns y_c = [x_first_c, x_last_c]
    # is ITSELF block tridiagonal with 2k x 2k blocks over the C chunks
    # (chunk c couples to c-1 through V and to c+1 through W), so solve it
    # with a C-step Thomas recursion — a dense 2Ck LU would serialize over
    # 2Ck pivots and dominate the whole solve.
    C = num_chunks
    k2 = 2 * k
    Dr = jnp.broadcast_to(jnp.eye(k2, dtype=D.dtype), (C, k2, k2))
    Lr = jnp.zeros((C, k2, k2), D.dtype)
    Lr = Lr.at[:, 0:k, k:].set(V[:, 0])
    Lr = Lr.at[:, k:, k:].set(V[:, -1])
    Ur = jnp.zeros((C, k2, k2), D.dtype)
    Ur = Ur.at[:, 0:k, 0:k].set(W[:, 0])
    Ur = Ur.at[:, k:, 0:k].set(W[:, -1])
    br = jnp.concatenate([g[:, 0], g[:, -1]], axis=1)  # (C, 2k)
    if reduced == "bcr":
        # log-depth reduced solve: at large C the C-step Thomas recursion
        # IS the sequential floor of the whole chunked solve; cyclic
        # reduction cuts it to 2 log2(C) batched levels, enabling many
        # more (smaller) chunks (measured v5e crossovers in
        # docs/BENCHMARKS.md)
        y2 = _tridiag_general_bcr(Dr, Ur, Lr, br)
    else:
        y2 = _tridiag_general(Dr, Ur[:-1], Lr, br)  # (C, 2k)

    x_left = jnp.concatenate(
        [jnp.zeros((1, k), D.dtype), y2[:-1, k:]], axis=0
    )  # last boundary of chunk c-1
    x_right = jnp.concatenate(
        [y2[1:, 0:k], jnp.zeros((1, k), D.dtype)], axis=0
    )  # first boundary of chunk c+1
    x = g - jnp.einsum("cmij,cj->cmi", V, x_left) - jnp.einsum(
        "cmij,cj->cmi", W, x_right
    )
    return x.reshape(N, k)


def block_tridiag_solve_bcr(D, U, b, base: int = 16):
    """Block CYCLIC REDUCTION solve: sequential depth 2·log2(N/base) + base
    of fully BATCHED 9x9 ops, vs the Thomas scan's N (or chunked SPIKE's
    N/C + 2C).  With `gj_solve_small` the per-level cost is pure batched
    elementwise work.  `base` stops the recursion early and finishes the
    reduced system with one short Thomas scan — v5e D-chained measurements
    (bench_kernels tridiag, docs/BENCHMARKS.md): base=16 beats base=1 at
    N=256/512 (the last ~4 levels operate on <=8 blocks, where per-level
    fixed overhead exceeds the scan's cost) and beats the chunked SPIKE
    2-6x at N=64..512.  At N >= 1024 BOTH bases lose to the chunked SPIKE
    (XLA composition pathology in the deep graph — see
    jacobi_scaled_tridiag_solve), so "auto" only picks BCR below 1024.

    The even/odd split and interleave use reshape (contiguity-preserving),
    not strided slicing — strided gathers/scatters measured erratically on
    v5e inside deep multi-level graphs.

    Each level eliminates the odd block-rows in parallel:
        D'_t = D_e[t] - U_oe[t-1]^T D_o[t-1]^{-1} U_oe[t-1]
                      - U_eo[t]   D_o[t]^{-1}   U_eo[t]^T
        U'_t = -U_eo[t] D_o[t]^{-1} U_oe[t]
        b'_t = b_e[t] - U_oe[t-1]^T D_o[t-1]^{-1} b_o[t-1]
                      - U_eo[t]   D_o[t]^{-1}   b_o[t]
    then back-substitutes the odd unknowns level by level.  N is padded to a
    power of two with identity diagonal blocks / zero couplings.
    """
    N, k, _ = D.shape
    n = 1 << (max(N, 2) - 1).bit_length()  # next pow2 >= N (>= 2)
    eye = jnp.eye(k, dtype=D.dtype)
    Dp = jnp.broadcast_to(eye, (n, k, k)).at[:N].set(D)
    Up = jnp.zeros((n, k, k), D.dtype).at[: N - 1].set(U)
    bp = jnp.zeros((n, k), D.dtype).at[:N].set(b)

    stack = []  # per level: (Dinv_Uoe, Dinv_UeoT, Dinv_b) for back-sub
    while n > max(base, 1):
        D2 = Dp.reshape(n // 2, 2, k, k)
        U2 = Up.reshape(n // 2, 2, k, k)
        b2 = bp.reshape(n // 2, 2, k)
        D_e, D_o = D2[:, 0], D2[:, 1]
        U_eo = U2[:, 0]  # even i -> odd i+1
        U_oe = U2[:, 1]  # odd o -> even o+1 (last entry is the zero pad)
        b_e, b_o = b2[:, 0], b2[:, 1]

        # one batched LU per odd row for all three right-hand sides
        rhs = jnp.concatenate(
            [U_oe, jnp.swapaxes(U_eo, -1, -2), b_o[..., None]], axis=-1
        )
        sol = gj_solve_small(D_o, rhs)
        Dinv_Uoe = sol[..., :k]            # D_o^{-1} U_oe
        Dinv_UeoT = sol[..., k:2 * k]      # D_o^{-1} U_eo^T
        Dinv_b = sol[..., 2 * k]           # D_o^{-1} b_o
        stack.append((Dinv_Uoe, Dinv_UeoT, Dinv_b))

        # right-neighbor contributions (odd o = 2t+1)
        D_new = D_e - jnp.einsum("tij,tjk->tik", U_eo, Dinv_UeoT)
        b_new = b_e - jnp.einsum("tij,tj->ti", U_eo, Dinv_b)
        U_new = -jnp.einsum("tij,tjk->tik", U_eo, Dinv_Uoe)
        # left-neighbor contributions (odd o = 2t-1), shifted by one
        L_term = jnp.einsum("tji,tjk->tik", U_oe, Dinv_Uoe)  # U_oe^T Dinv U_oe
        bL_term = jnp.einsum("tji,tj->ti", U_oe, Dinv_b)
        D_new = D_new.at[1:].add(-L_term[:-1])
        b_new = b_new.at[1:].add(-bL_term[:-1])

        Dp, Up, bp = D_new, U_new, b_new
        n //= 2

    if n == 1:
        x = gj_solve_small(Dp[0], bp[0][:, None])[:, 0][None]  # (1, k)
    else:
        x = block_tridiag_solve(Dp, Up[:-1], bp)  # (base, k) Thomas scan

    for Dinv_Uoe, Dinv_UeoT, Dinv_b in reversed(stack):
        m = Dinv_b.shape[0]
        x_e = x  # (m, k) solved evens of this level
        x_e_next = jnp.concatenate(
            [x_e[1:], jnp.zeros((1, k), D.dtype)], axis=0
        )
        x_o = (Dinv_b
               - jnp.einsum("tij,tj->ti", Dinv_UeoT, x_e)
               - jnp.einsum("tij,tj->ti", Dinv_Uoe, x_e_next))
        x = jnp.stack([x_e, x_o], axis=1).reshape(2 * m, k)

    return x[:N]


def dense_from_blocks(D, U):
    """Assemble the dense symmetric matrix from tridiagonal blocks (for
    validation against the reference's dense solve)."""
    N, k, _ = D.shape
    H = jnp.zeros((N * k, N * k), D.dtype)
    for t in range(N):
        H = H.at[t * k:(t + 1) * k, t * k:(t + 1) * k].set(D[t])
    for t in range(N - 1):
        H = H.at[t * k:(t + 1) * k, (t + 1) * k:(t + 2) * k].set(U[t])
        H = H.at[(t + 1) * k:(t + 2) * k, t * k:(t + 1) * k].set(U[t].T)
    return H


class BAStep(NamedTuple):
    states: jnp.ndarray  # (N, 10) updated states
    lamda_init: jnp.ndarray  # scalar, carried to the next iteration
    last_hessian: jnp.ndarray  # (9, 9) trailing diagonal block of JTwJ
    mean_residual: jnp.ndarray  # diagnostic


def _lambda_search(solve_with, trial_residual, init_residual, lamda0,
                   states, params: SolverParams):
    """The LM damping search shared by ba_iteration / ba_reg_iteration.

    Reference semantics (BA_filtering.py:50-79): try λ, accept iff the
    trial residual drops below the linearization-point residual, else
    λ ×= growth, capped at λ_max; the first trial always runs.  Returns
    (states_new, lamda_used, lamda_exit, trial_res) where lamda_exit is
    the loop-exit λ (accepted λ × growth) feeding the next iteration's
    warm λ.

    Two implementations with identical acceptance logic:
      * params.batched_lambda == 0 — the reference-exact sequential
        while_loop (one solve + one full residual re-evaluation per trial).
      * params.batched_lambda == K — all K candidates λ0·gᵏ solved and
        re-evaluated in ONE vmapped program; the first accepted (or, with
        none accepted, the last ≤ λ_max) is selected.  Sequential depth of
        a single trial; K× the FLOPs — pure batch width on a TPU, where
        the sequential trial chain is latency, not throughput.  Candidate
        λ values come from a cumulative-multiply scan, so they equal the
        while_loop's repeated products bit for bit.
    """
    K = params.batched_lambda
    if K <= 0:
        def cond(carry):
            lamda, done, _, _, _ = carry
            return jnp.logical_and(jnp.logical_not(done),
                                   lamda <= params.lambda_max)

        def body(carry):
            lamda, _, _, _, _ = carry
            states_new = solve_with(lamda)
            trial = trial_residual(states_new)
            accepted = trial < init_residual
            return (lamda * params.lambda_growth, accepted, states_new,
                    lamda, trial)

        first = body((lamda0, jnp.asarray(False), states, lamda0, lamda0))
        lamda_f, _, states_new, lamda_used, trial_res = jax.lax.while_loop(
            cond, body, first
        )
        return states_new, lamda_used, lamda_f, trial_res

    def mul(c, _):
        c2 = c * params.lambda_growth
        return c2, c2

    _, rest = jax.lax.scan(mul, lamda0, None, length=K - 1)
    lamdas = jnp.concatenate([lamda0[None], rest])  # (K,)

    def one(lamda):
        states_new = solve_with(lamda)
        return states_new, trial_residual(states_new)

    states_c, trials = jax.vmap(one)(lamdas)  # (K, N, 10), (K,)
    valid = (jnp.arange(K) == 0) | (lamdas <= params.lambda_max)
    accepted = valid & (trials < init_residual)
    first_acc = jnp.argmax(accepted)
    last_valid = K - 1 - jnp.argmax(valid[::-1])
    j = jnp.where(accepted.any(), first_acc, last_valid)
    return (states_c[j], lamdas[j], lamdas[j] * params.lambda_growth,
            trials[j])


def _residual_means(r_obs_w, r_pred_flat, obs_valid, pair_valid, sigma,
                    pred_dim):
    """mean |[r_obs ; r_pred*sqrt(Sigma)]| with padding-aware counts
    (BA_filtering.py:51,67-69)."""
    s_obs = (jnp.abs(r_obs_w) * obs_valid[:, None]).sum()
    n_obs = 2.0 * obs_valid.sum()
    s_pred = (jnp.abs(r_pred_flat) * jnp.sqrt(sigma)).sum()
    n_pred = pred_dim * pair_valid.sum()
    return (s_obs + s_pred) / jnp.maximum(n_obs + n_pred, 1.0)


def ba_iteration(sched_iter, states, prob: BAProblem, lamda_init,
                 params: SolverParams = SolverParams(),
                 initialize=False) -> BAStep:
    """One robust-LM iteration (BA, BA_filtering.py:4-98).

    sched_iter: the iteration index fed to the α/Σ schedules — may be
    negative, matching the reference's full-batch `BA(i-10, ...)` call
    (od_pipe.py:377).  `initialize` (python bool or 0/1 scalar) zeroes the
    dynamics factor (BA_utils.py:463-466), giving the vision-only warm start.
    """
    dtype = states.dtype
    N = states.shape[0]
    sched_iter = jnp.asarray(sched_iter)
    init_f = jnp.asarray(initialize, dtype=dtype)
    dyn_on = 1.0 - init_f

    # --- factors at the linearization point -------------------------------
    reproj = factors.reprojection_factor(
        states, prob.landmarks_xyz, prob.ii, prob.intrinsics
    )
    dyn = factors.dynamics_factor(
        states, prob.gaps, prob.cum_rot, params.quat_coeff, params.vel_coeff,
        valid_pair=prob.pair_valid, num_hops=params.num_hops,
        max_substep=params.max_substep, with_jacobian=True,
    )

    r_obs = (prob.landmarks_uv - reproj.uv) * prob.obs_valid[:, None]
    w = robust_weights(r_obs, prob.conf, prob.obs_valid, sched_iter)  # (M,)

    sigma = jnp.minimum(
        params.sigma_scale * (sched_iter.astype(dtype) + 1.0) ** 2,
        params.sigma_max,
    )

    res_pv = dyn.res_pv * dyn_on  # (N-1, 6)
    res_q = dyn.res_q * dyn_on  # (N-1,)
    A = dyn.A * dyn_on
    B = dyn.B * dyn_on
    qgrad = dyn.qgrad * dyn_on
    Hq_diag = dyn.Hq_diag * dyn_on
    Hq_off = dyn.Hq_off * dyn_on

    # --- normal-equation blocks ------------------------------------------
    Jg = reproj.J  # (M, 2, 9)
    JgW = Jg * w[:, None, None]
    G_obs = jnp.einsum("mki,mkj->mij", JgW, Jg)  # (M, 9, 9)
    JgTwJg = jax.ops.segment_sum(G_obs, prob.ii, num_segments=N)

    D = JgTwJg + sigma * Hq_diag
    D = D.at[:-1].add(sigma * jnp.einsum("tki,tkj->tij", A, A))
    D = D.at[1:].add(sigma * jnp.einsum("tki,tkj->tij", B, B))
    U = sigma * (jnp.einsum("tki,tkj->tij", A, B) + Hq_off)

    # --- gradient ---------------------------------------------------------
    JgT_robs = jax.ops.segment_sum(
        jnp.einsum("mki,mk->mi", JgW, r_obs), prob.ii, num_segments=N
    )
    JfT_r = jnp.zeros((N, 9), dtype)
    JfT_r = JfT_r.at[:-1].add(jnp.einsum("tki,tk->ti", A, res_pv))
    JfT_r = JfT_r.at[1:].add(jnp.einsum("tki,tk->ti", B, res_pv))
    JTr = JgT_robs - sigma * JfT_r - sigma * qgrad

    # --- initial residual (acceptance reference) --------------------------
    pred_dim = jnp.where(init_f > 0, 6.0, 7.0)
    r_pred_full = jnp.concatenate([res_pv, res_q[:, None]], axis=-1)
    r_pred_for_mean = jnp.where(init_f > 0, jnp.zeros_like(r_pred_full),
                                r_pred_full)
    init_residual = _residual_means(
        r_obs, r_pred_for_mean * prob.pair_valid[:, None], prob.obs_valid,
        prob.pair_valid, sigma, pred_dim
    )

    eye = jnp.eye(9, dtype=dtype)

    def trial_residual(states_new):
        uv_new = factors.project_landmarks(
            states_new, prob.landmarks_xyz, prob.ii, prob.intrinsics
        )
        r_obs1 = (prob.landmarks_uv - uv_new) * prob.obs_valid[:, None]
        r_obs1 = r_obs1 * w[:, None]  # weighted, BA_filtering.py:66
        dyn1 = factors.dynamics_factor(
            states_new, prob.gaps, prob.cum_rot, params.quat_coeff,
            params.vel_coeff, valid_pair=prob.pair_valid,
            num_hops=params.num_hops, max_substep=params.max_substep,
            with_jacobian=False,
        )
        r_pred1 = jnp.concatenate(
            [dyn1.res_pv, dyn1.res_q[:, None]], axis=-1
        ) * dyn_on * prob.pair_valid[:, None]
        r_pred1 = jnp.where(init_f > 0, jnp.zeros_like(r_pred1), r_pred1)
        return _residual_means(r_obs1, r_pred1, prob.obs_valid,
                               prob.pair_valid, sigma, pred_dim)

    def retract(dpose):
        position = states[:, :3] + dpose[:, 0:3]
        rotation = quat.box_plus(states[:, 3:7], dpose[:, 3:6])
        vels = states[:, 7:10] + dpose[:, 6:9]
        return jnp.concatenate([position, rotation, vels], axis=-1)

    def solve_with(lamda):
        Dl = D + lamda * eye[None]
        dpose = jacobi_scaled_tridiag_solve(Dl, U, JTr,
                                            variant=params.tridiag_variant)
        return retract(dpose)

    lamda0 = jnp.asarray(lamda_init, dtype=dtype)
    states_new, lamda_used, lamda_f, trial_res = _lambda_search(
        solve_with, trial_residual, init_residual, lamda0, states, params
    )

    lamda_init_new = jnp.maximum(jnp.minimum(1e-1, lamda_f * 0.01), 1e-4)
    # trailing diagonal block of the last VALID knot (BA_filtering.py:97) —
    # D[-1] would be a zero padding block in bucketed windows
    idx_last = jnp.maximum(prob.knot_valid.sum().astype(jnp.int32) - 1, 0)
    last_hessian = D[idx_last] + lamda_used * eye
    # the accepted trial's residual (already computed in-loop) is the
    # diagnostic — recomputing it would cost a full extra factor evaluation
    return BAStep(states_new, lamda_init_new, last_hessian, trial_res)


def terminal_marginal_info(states, prob: BAProblem,
                           params: SolverParams = SolverParams(),
                           sigma_obs_px: float = 4.0,
                           sigma_dyn: Optional[float] = None,
                           extra_diag=None):
    """TRUE marginal information (9, 9) of the last valid knot.

    The marginal covariance of knot N is (H⁻¹)_NN; for the block-tridiagonal
    H this equals inv(S_N) where S_N is the final Schur complement of the
    forward (Thomas) elimination — one extra forward scan, no full inverse.

    Unlike the reference's `last_hessian` (the raw trailing block of JTwJ,
    BA_filtering.py:97) this (a) accounts for correlation with all other
    knots, and (b) uses PHYSICAL noise weighting: observations at
    conf/σ_px² (not the max-normalized robust weights) and dynamics at
    σ_dyn (default: the solver's σ_max anneal endpoint).  It is the honest
    information to hand to the next window's prior/EKF.
    """
    dtype = states.dtype
    N = states.shape[0]
    sigma = jnp.asarray(params.sigma_max if sigma_dyn is None else sigma_dyn,
                        dtype)

    reproj = factors.reprojection_factor(
        states, prob.landmarks_xyz, prob.ii, prob.intrinsics
    )
    dyn = factors.dynamics_factor(
        states, prob.gaps, prob.cum_rot, params.quat_coeff, params.vel_coeff,
        valid_pair=prob.pair_valid, num_hops=params.num_hops,
        max_substep=params.max_substep, with_jacobian=True,
    )
    w = prob.conf * prob.obs_valid / (sigma_obs_px ** 2)
    Jg = reproj.J
    JgW = Jg * w[:, None, None]
    G_obs = jnp.einsum("mki,mkj->mij", JgW, Jg)
    D = jax.ops.segment_sum(G_obs, prob.ii, num_segments=N)
    D = D + sigma * dyn.Hq_diag
    D = D.at[:-1].add(sigma * jnp.einsum("tki,tkj->tij", dyn.A, dyn.A))
    D = D.at[1:].add(sigma * jnp.einsum("tki,tkj->tij", dyn.B, dyn.B))
    U = sigma * (jnp.einsum("tki,tkj->tij", dyn.A, dyn.B) + dyn.Hq_off)
    if extra_diag is not None:
        # e.g. the anchor-knot prior information of a marginalized window
        D = D + extra_diag
    # small diagonal floor so padding/unobserved blocks stay invertible
    D = D + 1e-9 * jnp.eye(9, dtype=dtype)[None]

    # forward elimination with Jacobi scaling (f32-safe), tracking only the
    # Schur complement; padding rows (knot_valid=0) are skipped by masking
    # their coupling (U into/out of padding is already zero via pair_valid)
    diag = jnp.diagonal(D, axis1=-2, axis2=-1)
    s = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    Ds = D * s[:, :, None] * s[:, None, :]
    Us = U * s[:-1, :, None] * s[1:, None, :]
    U_prev = jnp.concatenate([jnp.zeros((1, 9, 9), dtype), Us], axis=0)

    def fwd(S_prev, inp):
        Dt, Utm1 = inp
        S_t = Dt - Utm1.T @ jnp.linalg.solve(S_prev, Utm1)
        return S_t, S_t

    S0 = jnp.eye(9, dtype=dtype)
    _, S_all = jax.lax.scan(fwd, S0, (Ds, U_prev))
    idx_last = jnp.maximum(prob.knot_valid.sum().astype(jnp.int32) - 1, 0)
    S_last = S_all[idx_last]
    s_last = s[idx_last]
    # undo the Jacobi scaling: H_marg = s⁻¹ S s⁻¹ (info), i.e. scale back
    return S_last / (s_last[:, None] * s_last[None, :])


def inflate_info(H9, pos_floor_km: float, rot_floor: float,
                 vel_floor: float):
    """Apply covariance floors to a 9x9 information matrix.

    The least-squares marginal (terminal_marginal_info) is a CRLB-style
    uncertainty under independent pixel noise; the streaming estimator's
    ACTUAL terminal error is dominated by correlated/bias components the
    CRLB cannot see (measured ~10-30x larger in position).  Flooring
    cov = inv(H) + diag(floor²) keeps the prior honest: it preserves the
    marginal's correlations and velocity information while preventing the
    anchor from over-pinning the next window.  (The reference has no
    analog — its BA_reg prior uses the raw trailing hessian and was never
    run on its main path, BA_filtering.py:135's live ipdb.)
    """
    H9 = np.asarray(H9, dtype=np.float64)
    cov = np.linalg.inv(H9 + 1e-12 * np.eye(9))
    floors = np.concatenate([
        np.full(3, pos_floor_km ** 2),
        np.full(3, rot_floor ** 2),
        np.full(3, vel_floor ** 2),
    ])
    cov = cov + np.diag(floors)
    return np.linalg.inv(cov)


class PriorState(NamedTuple):
    """Propagated window-marginal prior (the streaming handoff state)."""

    prop_states: jnp.ndarray  # (N, 10)
    H_state: jnp.ndarray  # (N, 6, 6) pos/vel information
    H_rot: jnp.ndarray  # (N, 3, 3) rotation information
    valid: jnp.ndarray  # (N,) 0/1: which knots carry a prior


def propagate_prior(end_state, last_hessian, gaps_to_knots, cum_rots,
                    num_hops: int = 16, max_substep: float = 100.0
                    ) -> PriorState:
    """Propagate the previous window's terminal state + marginal covariance
    to each new knot (propagate_dynamics_cov_init, BA_utils.py:227-248).

    end_state (10,); last_hessian (9, 9) in [pos, phi, vel] tangent order;
    gaps_to_knots (N,) seconds from the window end to each new knot;
    cum_rots (N, 4) IMU rotation products over those spans.
    """
    from vinsat_tpu.core import dynamics, quat

    dtype = end_state.dtype
    N = gaps_to_knots.shape[0]
    # marginal covariances from the information matrix (BA_utils.py:230-235)
    Hs = jnp.concatenate(
        [jnp.concatenate([last_hessian[0:3, 0:3], last_hessian[0:3, 6:9]], 1),
         jnp.concatenate([last_hessian[6:9, 0:3], last_hessian[6:9, 6:9]], 1)],
        0,
    )
    cov_state = jnp.linalg.inv(Hs)
    cov_rot = jnp.linalg.inv(last_hessian[3:6, 3:6])

    pos = jnp.broadcast_to(end_state[:3], (N, 3))
    vel = jnp.broadcast_to(end_state[7:10], (N, 3))
    p, v, J = dynamics.propagate_gaps_with_jacobian(
        pos, vel, gaps_to_knots, num_hops=num_hops, max_substep=max_substep
    )
    cov_s = jnp.einsum("nij,jk,nlk->nil", J, cov_state, J)
    q = quat.normalize(quat.multiply(
        jnp.broadcast_to(end_state[3:7], (N, 4)), cum_rots
    ))
    Rc = jnp.swapaxes(quat.to_matrix(cum_rots), -1, -2)
    cov_r = jnp.einsum("nij,jk,nlk->nil", Rc, cov_rot, Rc)

    prop_states = jnp.concatenate([p, q, v], axis=-1)
    return PriorState(
        prop_states=prop_states,
        H_state=jnp.linalg.inv(cov_s),
        H_rot=jnp.linalg.inv(cov_r),
        valid=jnp.ones(N, dtype=dtype),
    )


def ba_reg_iteration(sched_iter, states, prob: BAProblem, prior, lamda_init,
                     params: SolverParams = SolverParams(),
                     quat_coeff_prior: float = 1.0,
                     vel_coeff_prior: float = 1.0,
                     initialize=False) -> BAStep:
    """One regularized LM iteration with the window-marginal prior factor
    (BA_reg, BA_filtering.py:100-210): ba_iteration + JpᵀJp (block-diagonal)
    and the prior rotation Newton terms.

    prior: PriorState covering all N knots (pad H with zeros for knots
    without a prior).
    """
    dtype = states.dtype
    N = states.shape[0]
    sched_iter = jnp.asarray(sched_iter)
    init_f = jnp.asarray(initialize, dtype=dtype)
    dyn_on = 1.0 - init_f

    reproj = factors.reprojection_factor(
        states, prob.landmarks_xyz, prob.ii, prob.intrinsics
    )
    dyn = factors.dynamics_factor(
        states, prob.gaps, prob.cum_rot, params.quat_coeff, params.vel_coeff,
        valid_pair=prob.pair_valid, num_hops=params.num_hops,
        max_substep=params.max_substep, with_jacobian=True,
    )
    pf = factors.prior_factor(
        states, prior.prop_states, prior.H_state, prior.H_rot,
        vel_coeff_prior, quat_coeff_prior,
        valid=prior.valid * prob.knot_valid,
    )

    r_obs = (prob.landmarks_uv - reproj.uv) * prob.obs_valid[:, None]
    w = robust_weights(r_obs, prob.conf, prob.obs_valid, sched_iter)
    sigma = jnp.minimum(
        params.sigma_scale * (sched_iter.astype(dtype) + 1.0) ** 2,
        params.sigma_max,
    )

    res_pv = dyn.res_pv * dyn_on
    res_q = dyn.res_q * dyn_on
    A = dyn.A * dyn_on
    B = dyn.B * dyn_on
    qgrad = dyn.qgrad * dyn_on
    Hq_diag = dyn.Hq_diag * dyn_on
    Hq_off = dyn.Hq_off * dyn_on

    Jg = reproj.J
    JgW = Jg * w[:, None, None]
    G_obs = jnp.einsum("mki,mkj->mij", JgW, Jg)
    JgTwJg = jax.ops.segment_sum(G_obs, prob.ii, num_segments=N)

    D = JgTwJg + sigma * Hq_diag
    D = D.at[:-1].add(sigma * jnp.einsum("tki,tkj->tij", A, A))
    D = D.at[1:].add(sigma * jnp.einsum("tki,tkj->tij", B, B))
    # prior terms: JpᵀJp block-diagonal + Hqp (BA_filtering.py:145,163)
    D = D + jnp.einsum("nki,nkj->nij", pf.Jp, pf.Jp) + pf.Hq_diag
    U = sigma * (jnp.einsum("tki,tkj->tij", A, B) + Hq_off)

    JgT_robs = jax.ops.segment_sum(
        jnp.einsum("mki,mk->mi", JgW, r_obs), prob.ii, num_segments=N
    )
    JfT_r = jnp.zeros((N, 9), dtype)
    JfT_r = JfT_r.at[:-1].add(jnp.einsum("tki,tk->ti", A, res_pv))
    JfT_r = JfT_r.at[1:].add(jnp.einsum("tki,tk->ti", B, res_pv))
    JpT_r = jnp.einsum("nki,nk->ni", pf.Jp, pf.res[:, :6])
    JTr = (JgT_robs - sigma * JfT_r - JpT_r - sigma * qgrad - pf.qgrad)

    pred_dim = jnp.where(init_f > 0, 6.0, 7.0)
    r_pred_full = jnp.concatenate([res_pv, res_q[:, None]], axis=-1)
    r_pred_for_mean = jnp.where(init_f > 0, jnp.zeros_like(r_pred_full),
                                r_pred_full)

    def mean_with_prior(r_obs_w, r_pred_flat, r_pri):
        s_obs = (jnp.abs(r_obs_w) * prob.obs_valid[:, None]).sum()
        n_obs = 2.0 * prob.obs_valid.sum()
        s_pred = (jnp.abs(r_pred_flat) * jnp.sqrt(sigma)).sum()
        n_pred = pred_dim * prob.pair_valid.sum()
        s_pri = (jnp.abs(r_pri) * prob.knot_valid[:, None]).sum()
        n_pri = 7.0 * prob.knot_valid.sum()
        return (s_obs + s_pred + s_pri) / jnp.maximum(
            n_obs + n_pred + n_pri, 1.0
        )

    init_residual = mean_with_prior(
        r_obs, r_pred_for_mean * prob.pair_valid[:, None], pf.res
    )

    eye = jnp.eye(9, dtype=dtype)

    def trial_residual(states_new):
        uv_new = factors.project_landmarks(
            states_new, prob.landmarks_xyz, prob.ii, prob.intrinsics
        )
        r_obs1 = (prob.landmarks_uv - uv_new) * prob.obs_valid[:, None]
        r_obs1 = r_obs1 * w[:, None]
        dyn1 = factors.dynamics_factor(
            states_new, prob.gaps, prob.cum_rot, params.quat_coeff,
            params.vel_coeff, valid_pair=prob.pair_valid,
            num_hops=params.num_hops, max_substep=params.max_substep,
            with_jacobian=False,
        )
        r_pred1 = jnp.concatenate(
            [dyn1.res_pv, dyn1.res_q[:, None]], axis=-1
        ) * dyn_on * prob.pair_valid[:, None]
        r_pred1 = jnp.where(init_f > 0, jnp.zeros_like(r_pred1), r_pred1)
        pf1 = factors.prior_factor(
            states_new, prior.prop_states, prior.H_state, prior.H_rot,
            vel_coeff_prior, quat_coeff_prior,
            valid=prior.valid * prob.knot_valid,
        )
        return mean_with_prior(r_obs1, r_pred1, pf1.res)

    def retract(dpose):
        position = states[:, :3] + dpose[:, 0:3]
        rotation = quat.box_plus(states[:, 3:7], dpose[:, 3:6])
        vels = states[:, 7:10] + dpose[:, 6:9]
        return jnp.concatenate([position, rotation, vels], axis=-1)

    def solve_with(lamda):
        Dl = D + lamda * eye[None]
        dpose = jacobi_scaled_tridiag_solve(Dl, U, JTr,
                                            variant=params.tridiag_variant)
        return retract(dpose)

    lamda0 = jnp.asarray(lamda_init, dtype=dtype)
    states_new, lamda_used, lamda_f, trial_res = _lambda_search(
        solve_with, trial_residual, init_residual, lamda0, states, params
    )
    lamda_init_new = jnp.maximum(jnp.minimum(1e-1, lamda_f * 0.01), 1e-4)
    idx_last = jnp.maximum(prob.knot_valid.sum().astype(jnp.int32) - 1, 0)
    last_hessian = D[idx_last] + lamda_used * eye
    return BAStep(states_new, lamda_init_new, last_hessian, trial_res)
