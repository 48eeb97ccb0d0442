"""Pallas block-tridiagonal solve: parallel cyclic reduction in ONE kernel.

The measured N>=1024 solve gap (docs/BENCHMARKS.md "MFU" table): XLA runs
the deep block-cyclic-reduction graph at 36-142 ms for N=2048-4096 while
every constituent batched op measures < 0.25 ms — a composition pathology
(fusion boundaries + HBM round-trips between the ~2·log2(N) levels), not a
compute limit.  The entire problem is TINY by VMEM standards
(N=2048: D+L+U+b < 3 MB « 16 MB), so one kernel keeps everything VMEM-
resident across all levels: zero HBM traffic between levels, zero per-level
dispatch.

Two layout lessons shaped this kernel (the first attempt — classic cyclic
reduction on (t, 9, 9) block arrays — is retired in
docs/PALLAS_TRIDIAG_NOTES.md):

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

def _set_row(A, i: int, row):
    """A with leading-axis plane i replaced by `row` (static index; stack of
    unrolled planes — no scatter, no iota select)."""
    planes = [A[j] for j in range(A.shape[0])]
    planes[i] = row
    return jnp.stack(planes, axis=0)


def _gj_lanes(A, Bs):
    """Pivot-free Gauss-Jordan solve A X = B batched over lanes.

    A (k, k, n); Bs a list of (k, r, n).  Same elimination order as
    ba.gj_solve_small (the Jacobi-scaled SPD blocks keep diagonal pivots
    bounded, so no pivoting — bit-compatible elimination).
    """
    k = A.shape[0]
    for i in range(k):
        piv = A[i, i]                      # (n,)
        rowA = A[i] / piv[None]            # (k, n)
        colA = A[:, i, :]                  # (k, n)
        A = _set_row(A - colA[:, None, :] * rowA[None, :, :], i, rowA)
        new_Bs = []
        for B in Bs:
            rowB = B[i] / piv[None]        # (r, n)
            new_Bs.append(_set_row(B - colA[:, None, :] * rowB[None, :, :],
                                   i, rowB))
        Bs = new_Bs
    return Bs


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


def _pcr_body(D, U, b, n: int, k: int):
    """All PCR levels on VMEM-resident (k, k, n)/(k, n) values -> x (k, n)."""
    # lower couplings from symmetry: L_i = U_{i-1}^T
    L = _transpose_blocks(_sr(U, 1))
    s = 1
    while s < n:
        DinvL, DinvU, Dinvb1 = _gj_lanes(D, [L, U, b[:, None, :]])
        Dinvb = Dinvb1[:, 0, :]
        D = (D - _bmm_lanes(L, _sr(DinvU, s)) - _bmm_lanes(U, _sl(DinvL, s)))
        b = (b - _bmv_lanes(L, _sr(Dinvb, s)) - _bmv_lanes(U, _sl(Dinvb, s)))
        L = -_bmm_lanes(L, _sr(DinvL, s))
        U = -_bmm_lanes(U, _sl(DinvU, s))
        s *= 2
    (x1,) = _gj_lanes(D, [b[:, None, :]])
    return x1[:, 0, :]


def _kernel(D_ref, U_ref, b_ref, x_ref, *, n: int, k: int):
    x_ref[:] = _pcr_body(D_ref[:], U_ref[:], b_ref[:], n, k)


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

    x = pl.pallas_call(
        functools.partial(_kernel, n=n, k=k),
        out_shape=jax.ShapeDtypeStruct((k, n), D.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Dl, Ul, bl)
    return jnp.moveaxis(x, -1, 0)[:N]
