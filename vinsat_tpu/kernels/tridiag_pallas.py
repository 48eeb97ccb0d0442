"""Pallas block-tridiagonal solve: parallel cyclic reduction in ONE kernel.

The measured N>=1024 solve gap (docs/BENCHMARKS.md "MFU" table): XLA runs
the deep block-cyclic-reduction graph at 36-142 ms for N=2048-4096 while
every constituent batched op measures < 0.25 ms — a composition pathology
(fusion boundaries + HBM round-trips between the ~2·log2(N) levels), not a
compute limit.  The entire problem is TINY by VMEM standards
(N=4096: D+L+U+b < 6 MB « 16 MB), so one kernel keeps everything VMEM-
resident across all levels: zero HBM traffic between levels, zero per-level
dispatch.

Three layout/lifetime lessons shaped this kernel (the first two attempts
are retired in docs/PALLAS_TRIDIAG_NOTES.md):

  * batch on LANES: arrays are (k, k, n) with the block index on the
    128-lane axis, so a 9x9-block op is 81 unrolled (1, n)-plane FMAs at
    full lane utilization — no (16, 128) tile padding per tiny block
    (the (t, 9, 9) layout wasted 25x VMEM and OOM'd at N=256);
  * PCR instead of CR: parallel cyclic reduction never deinterleaves —
    each level couples i to i±2^l via STATIC LANE SHIFTS (concat of
    slices), the one data-movement primitive Mosaic handles natively.
    CR's even/odd decimation needs stride-2 lane gathers or per-level
    relayouts, which is exactly where the first attempt died.  PCR does
    O(n log n) work vs CR's O(n), but the work is dense VPU FMAs on
    VMEM-resident data — latency, not flops, is what the XLA path loses.
  * mutate SCRATCH REFS in place: the functional level body (fresh
    D/L/U/b arrays per level, fresh matrices per Gauss-Jordan pivot step)
    blew the 16 MB scoped-VMEM limit once unrolled (38 MB live at n=2048,
    20 MB for even a single level per call) — Mosaic allocates the
    unrolled graph's liveness, it does not reuse functional buffers.
    Eight fixed scratch buffers + static-index row stores bound live VMEM
    at ~8 MB for n=4096 INDEPENDENT of level count.

Algorithm (symmetric block tridiagonal, blocks k=9): at level s each row i
holds  L_i x_{i-s} + D_i x_i + U_i x_{i+s} = b_i.  One batched Gauss-Jordan
gives P = D^{-1}[L, U, b] for ALL rows; substituting rows i-s and i+s
eliminates the distance-s couplings and doubles the coupling distance:

    D'_i = D_i - L_i (D^{-1}U)_{i-s} - U_i (D^{-1}L)_{i+s}
    L'_i = -L_i (D^{-1}L)_{i-s}        U'_i = -U_i (D^{-1}U)_{i+s}
    b'_i = b_i - L_i (D^{-1}b)_{i-s} - U_i (D^{-1}b)_{i+s}

After ceil(log2 n) levels every row is decoupled: x_i = D_i^{-1} b_i.
Out-of-range neighbors are handled by the zero fill of the lane shifts
(L_i = 0 for i < s makes the boundary terms vanish identically).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# batch-on-lanes block algebra: arrays (k, k, n) / (k, n), block index on
# the last (lane) axis; k=9 loops are static unrolls of (1, n) plane ops
# ---------------------------------------------------------------------------

def _bmm_lanes(A, B):
    """Block product over lanes: C[i, c] = sum_j A[i, j] B[j, c]."""
    k = A.shape[0]
    acc = A[:, 0:1, :] * B[0][None]
    for j in range(1, k):
        acc = acc + A[:, j:j + 1, :] * B[j][None]
    return acc


def _bmv_lanes(A, v):
    """Block matvec over lanes: out[i] = sum_j A[i, j] v[j]."""
    k = A.shape[0]
    acc = A[:, 0, :] * v[0][None]
    for j in range(1, k):
        acc = acc + A[:, j, :] * v[j][None]
    return acc


def _sr(x, s: int):
    """Lane shift right by s: out[..., i] = x[..., i-s], zero-filled."""
    return jnp.concatenate(
        [jnp.zeros_like(x[..., :s]), x[..., :-s]], axis=-1)


def _sl(x, s: int):
    """Lane shift left by s: out[..., i] = x[..., i+s], zero-filled."""
    return jnp.concatenate(
        [x[..., s:], jnp.zeros_like(x[..., :s])], axis=-1)


def _transpose_blocks(A):
    """(k, k, n) -> per-block transpose (swap the two leading plane axes)."""
    return jnp.stack([A[:, j, :] for j in range(A.shape[1])], axis=0)


def _gj_refs(A, Ms, vs):
    """Pivot-free Gauss-Jordan, IN PLACE on scratch refs.

    A (k, k, n) is destroyed; each M in Ms (k, k, n) and v in vs (k, n)
    becomes A0^{-1} M / A0^{-1} v (A0 = A's value on entry).  Same
    elimination order as ba.gj_solve_small (the Jacobi-scaled SPD blocks
    keep diagonal pivots bounded, so no pivoting — bit-compatible
    elimination).  Static-index row loads/stores only; live temporaries
    are a handful of (k, n) planes regardless of k's unroll.
    """
    k = A.shape[0]
    for i in range(k):
        rowA_raw = A[i]                    # (k, n)
        piv = rowA_raw[i]                  # (n,)
        rowA = rowA_raw / piv[None]
        colA = A[:, i, :]                  # (k, n), read before overwrite
        for M in Ms:
            rowM = M[i] / piv[None]
            M[:] = M[:] - colA[:, None, :] * rowM[None]
            M[i] = rowM
        for v in vs:
            rowv = v[i] / piv
            v[:] = v[:] - colA * rowv[None]
            v[i] = rowv
        A[:] = A[:] - colA[:, None, :] * rowA[None]
        A[i] = rowA


def _kernel(D_ref, U_ref, b_ref, x_ref, wD, wU, wL, wb, sA, sL, sU, sb, *,
            n: int, k: int):
    """All PCR levels in one kernel on eight VMEM scratch buffers.

    w* hold the current level's system; s* hold the Gauss-Jordan products
    D^{-1}[L, U, b] (recomputed into the same buffers every level).
    """
    wD[:] = D_ref[:]
    wU[:] = U_ref[:]
    wb[:] = b_ref[:]
    # lower couplings from symmetry: L_i = U_{i-1}^T
    wL[:] = _transpose_blocks(_sr(U_ref[:], 1))
    s = 1
    while s < n:
        sA[:] = wD[:]
        sL[:] = wL[:]
        sU[:] = wU[:]
        sb[:] = wb[:]
        _gj_refs(sA, [sL, sU], [sb])  # sL/sU/sb <- D^{-1} [L, U, b]
        wD[:] = (wD[:] - _bmm_lanes(wL[:], _sr(sU[:], s))
                 - _bmm_lanes(wU[:], _sl(sL[:], s)))
        wb[:] = (wb[:] - _bmv_lanes(wL[:], _sr(sb[:], s))
                 - _bmv_lanes(wU[:], _sl(sb[:], s)))
        wL[:] = -_bmm_lanes(wL[:], _sr(sL[:], s))
        wU[:] = -_bmm_lanes(wU[:], _sl(sU[:], s))
        s *= 2
    # decoupled back-solve x_i = D_i^{-1} b_i
    _gj_refs(wD, [], [wb])
    x_ref[:] = wb[:]


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_tridiag_solve_pallas(D, U, b, interpret: bool = False):
    """Solve the symmetric block-tridiagonal system in one Pallas kernel.

    D (N, k, k); U (N-1, k, k) — U[i] couples row i to i+1; b (N, k).
    Jacobi-scale first for f32 conditioning (ba.jacobi_scaled_tridiag_solve
    does) — the pivot-free elimination assumes O(1)-conditioned blocks.
    Equivalent to ba.block_tridiag_solve to roundoff.
    """
    N, k, _ = D.shape
    n = max(((N + 127) // 128) * 128, 128)  # lane-multiple padding
    eye = jnp.eye(k, dtype=D.dtype)
    Dp = jnp.broadcast_to(eye, (n, k, k)).at[:N].set(D)
    Up = jnp.zeros((n, k, k), D.dtype).at[: N - 1].set(U)
    bp = jnp.zeros((n, k), D.dtype).at[:N].set(b)
    # batch -> lanes
    Dl = jnp.moveaxis(Dp, 0, -1)   # (k, k, n)
    Ul = jnp.moveaxis(Up, 0, -1)
    bl = jnp.moveaxis(bp, 0, -1)   # (k, n)

    mat = pltpu.VMEM((k, k, n), D.dtype)
    vec = pltpu.VMEM((k, n), D.dtype)
    x = pl.pallas_call(
        functools.partial(_kernel, n=n, k=k),
        out_shape=jax.ShapeDtypeStruct((k, n), D.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[mat, mat, mat, vec, mat, mat, mat, vec],
        interpret=interpret,
    )(Dl, Ul, bl)
    return jnp.moveaxis(x, -1, 0)[:N]
