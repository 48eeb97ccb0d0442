"""Pallas block-tridiagonal solve: the whole cyclic reduction in ONE kernel.

The measured N>=1024 solve gap (docs/BENCHMARKS.md "MFU" table): XLA runs
the deep block-cyclic-reduction graph at 36-142 ms for N=2048-4096 while
every constituent batched op measures < 0.25 ms — a composition pathology
(fusion boundaries + HBM round-trips between the ~2·log2(N) levels), not a
compute limit.  The entire problem is TINY by VMEM standards:

    N=4096: D (N,9,9) + U (N,9,9) + b (N,9) = 2.8 MB  « 16 MB VMEM

so this kernel loads everything into VMEM ONCE and runs all reduction +
back-substitution levels on-chip — zero HBM traffic between levels, zero
per-level dispatch.  The level loop is a static Python unroll (shapes halve
per level), each level the same fully batched 9x9 Gauss-Jordan + products
as the XLA path (ba.block_tridiag_solve_bcr, validated bit-for-bit against
the Thomas scan in tests).

Speed-of-light reference: one read of D+U+b at 819 GB/s (v5e) is ~3.5 us
for N=4096 — the kernel's floor is VPU throughput on ~2N batched 9x9
eliminations, not bandwidth.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gj_solve_multi(A, Bs):
    """Batched unrolled Gauss-Jordan solve A X = B for several right-hand
    sides (ba.gj_solve_small, pivot-free: the Jacobi-scaled SPD blocks keep
    diagonal pivots bounded).  A (..., k, k); Bs a list of (..., k, r_i).

    Mosaic-friendly formulation: NO scatter (.at[].set -> masked select on
    a row-index iota), NO lane-axis concatenation (each RHS carries the row
    ops separately instead of being glued onto A), only elementwise
    broadcast ops on (..., k, r) tiles."""
    k = A.shape[-1]

    def rows_of(M):
        return jax.lax.broadcasted_iota(jnp.int32, M.shape[-2:], 0)

    for i in range(k):
        piv = A[..., i:i + 1, i:i + 1]  # (..., 1, 1)
        colA = A[..., :, i:i + 1]  # (..., k, 1)
        rowA = A[..., i:i + 1, :] / piv  # (..., 1, k)
        A_new = A - colA * rowA
        A = jnp.where(rows_of(A) == i, rowA, A_new)
        new_Bs = []
        for B in Bs:
            rowB = B[..., i:i + 1, :] / piv  # (..., 1, r)
            B_new = B - colA * rowB
            new_Bs.append(jnp.where(rows_of(B) == i, rowB, B_new))
        Bs = new_Bs
    return Bs


def _shift_down(x):
    """[0, x_0, ..., x_{n-2}] along axis 0 (scatter-free .at[1:].add).
    Mosaic rejects zero-size vector slices, so the length-1 case is its
    own branch."""
    if x.shape[0] == 1:
        return jnp.zeros_like(x)
    return jnp.concatenate(
        [jnp.zeros_like(x[:1]), x[:-1]], axis=0)


def _shift_up(x):
    """[x_1, ..., x_{n-1}, 0] along axis 0 (zero-size-slice safe)."""
    if x.shape[0] == 1:
        return jnp.zeros_like(x)
    return jnp.concatenate(
        [x[1:], jnp.zeros_like(x[:1])], axis=0)


# Batched tiny-block products as explicit broadcast-FMA loops over the
# 9-dim contraction: Mosaic's tpu.matmul requires the contraction on the
# LAST dim with vector-like rhs, which the transposed batched forms below
# violate — and a 9-step unrolled FMA over (t, 9, 9) tiles is pure VPU
# work anyway (no MXU win at k=9).

def _bmm(A, B):
    """(..., k, k) @ (..., k, k): sum_j A[..., i, j] B[..., j, kk]."""
    k = A.shape[-1]
    acc = A[..., :, 0:1] * B[..., 0:1, :]
    for j in range(1, k):
        acc = acc + A[..., :, j:j + 1] * B[..., j:j + 1, :]
    return acc


def _bmm_T(A, B):
    """A^T @ B: sum_j A[..., j, i] B[..., j, kk]."""
    k = A.shape[-1]
    acc = jnp.swapaxes(A[..., 0:1, :], -1, -2) * B[..., 0:1, :]
    for j in range(1, k):
        acc = acc + jnp.swapaxes(A[..., j:j + 1, :], -1, -2) * B[..., j:j + 1, :]
    return acc


def _bmv(A, b):
    """(..., k, k) @ (..., k): sum_j A[..., i, j] b[..., j]."""
    return (A * b[..., None, :]).sum(-1)


def _bmv_T(A, b):
    """A^T @ b: sum_j A[..., j, i] b[..., j]."""
    return (A * b[..., :, None]).sum(-2)


def _bcr_body(D, U, b, n: int, k: int):
    """Full cyclic reduction on VMEM-resident values; returns x (n, k).
    Static unroll over levels (n halves each level down to 1)."""
    dtype = D.dtype
    stack = []
    while n > 1:
        D2 = D.reshape(n // 2, 2, k, k)
        U2 = U.reshape(n // 2, 2, k, k)
        b2 = b.reshape(n // 2, 2, k)
        D_e, D_o = D2[:, 0], D2[:, 1]
        U_eo = U2[:, 0]
        U_oe = U2[:, 1]
        b_e, b_o = b2[:, 0], b2[:, 1]

        Dinv_Uoe, Dinv_UeoT, Dinv_b1 = _gj_solve_multi(
            D_o, [U_oe, jnp.swapaxes(U_eo, -1, -2), b_o[..., None]])
        Dinv_b = Dinv_b1[..., 0]
        stack.append((Dinv_Uoe, Dinv_UeoT, Dinv_b))

        D_new = D_e - _bmm(U_eo, Dinv_UeoT)
        b_new = b_e - _bmv(U_eo, Dinv_b)
        U_new = -_bmm(U_eo, Dinv_Uoe)
        L_term = _bmm_T(U_oe, Dinv_Uoe)
        bL_term = _bmv_T(U_oe, Dinv_b)
        D_new = D_new - _shift_down(L_term)
        b_new = b_new - _shift_down(bL_term)

        D, U, b = D_new, U_new, b_new
        n //= 2

    (x1,) = _gj_solve_multi(D[0:1], [b[0:1][..., None]])
    x = x1[..., 0]  # (1, k)

    for Dinv_Uoe, Dinv_UeoT, Dinv_b in reversed(stack):
        x_e = x
        x_e_next = _shift_up(x_e)
        x_o = (Dinv_b
               - _bmv(Dinv_UeoT, x_e)
               - _bmv(Dinv_Uoe, x_e_next))
        x = jnp.stack([x_e, x_o], axis=1).reshape(2 * x_e.shape[0], k)
    return x


def _kernel(D_ref, U_ref, b_ref, x_ref, *, n: int, k: int):
    x_ref[:] = _bcr_body(D_ref[:], U_ref[:], b_ref[:], n, k)


@functools.partial(jax.jit, static_argnames=("interpret",))
def block_tridiag_solve_pallas(D, U, b, interpret: bool = False):
    """Solve the symmetric block-tridiagonal system in one Pallas kernel.

    D (N, k, k); U (N-1, k, k) — U[i] couples row i to i+1; b (N, k).
    N is padded to the next power of two with identity/zero blocks.
    Equivalent to ba.block_tridiag_solve to f32 roundoff (Jacobi-scale
    first for f32 conditioning — ba.jacobi_scaled_tridiag_solve does).
    """
    N, k, _ = D.shape
    n = 1 << (max(N, 2) - 1).bit_length()
    eye = jnp.eye(k, dtype=D.dtype)
    Dp = jnp.broadcast_to(eye, (n, k, k)).at[:N].set(D)
    Up = jnp.zeros((n, k, k), D.dtype).at[: N - 1].set(U)
    bp = jnp.zeros((n, k), D.dtype).at[:N].set(b)

    x = pl.pallas_call(
        functools.partial(_kernel, n=n, k=k),
        out_shape=jax.ShapeDtypeStruct((n, k), D.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Dp, Up, bp)
    return x[:N]
