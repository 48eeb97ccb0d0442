"""Pallas TPU kernel: fused robust-weighted normal-equation assembly.

Fuses, in one VMEM pass per knot tile, what the single-chip path does as
separate XLA ops (ba.ba_iteration): per-observation robust weight
application, the 9x9 Gram blocks JᵀWJ, and the gradient JᵀWr — i.e. the
torch_scatter + bmm stage of the reference (BA_filtering.py:30-44) — for
the per-knot-budget observation layout (N, D, 2, 9).

Layout: knots on the grid axis (tile of 8 on sublanes), the D*18 Jacobian
entries of a knot flattened on lanes.  Outputs per knot: G (9, 9) and
g (9,), packed into a 96-lane row (81 + 9 + padding).

At streaming problem sizes this stage is dispatch-bound, not FLOP-bound, so
the kernel is OFF by default (`ba_iteration` keeps plain XLA ops) and
exposed for the large-N / high-D regimes where the fusion pays.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

KNOT_TILE = 8


def _assemble_kernel(J_ref, r_ref, w_ref, out_ref, *, D: int):
    """J (8, D*18); r (8, D*2); w (8, D); out (8, 128): [G(81), g(9), pad].

    All operations are kept strictly 2-D (8 x lanes) — Mosaic's vector
    layout inference rejects both 3-D reshapes across the lane dim and
    batched dot_generals with non-vector rhs, so the 9x9 Gram block is
    built column-by-column with broadcasted VPU multiplies.
    """
    G_cols = [jnp.zeros((KNOT_TILE, 9), jnp.float32) for _ in range(9)]
    g = jnp.zeros((KNOT_TILE, 9), jnp.float32)
    for d in range(D):
        wd = w_ref[:, d][:, None]  # (8, 1)
        rows = [J_ref[:, d * 18 + k * 9: d * 18 + (k + 1) * 9]
                for k in range(2)]  # two (8, 9) Jacobian rows
        rs = [r_ref[:, d * 2 + k][:, None] for k in range(2)]  # (8, 1) each
        for k in range(2):
            JkW = rows[k] * wd  # (8, 9)
            g = g + JkW * rs[k]
            for j in range(9):
                G_cols[j] = G_cols[j] + JkW * rows[k][:, j][:, None]
    out = jnp.concatenate(
        G_cols + [g, jnp.zeros((KNOT_TILE, 128 - 90), jnp.float32)], axis=1
    )
    out_ref[:, :] = out


@functools.partial(jax.jit, static_argnames=("interpret",))
def assemble_normal_eq(J, r, w, interpret: bool = False):
    """Fused JᵀWJ + JᵀWr for per-knot observation budgets.

    J (N, D, 2, 9); r (N, D, 2) residuals; w (N, D) weights (0 for invalid
    slots).  Returns (G (N, 9, 9), g (N, 9)).
    """
    from jax.experimental import pallas as pl

    N, D = J.shape[0], J.shape[1]
    n_pad = ((N + KNOT_TILE - 1) // KNOT_TILE) * KNOT_TILE
    Jf = jnp.zeros((n_pad, D * 18), jnp.float32).at[:N].set(
        J.reshape(N, D * 18).astype(jnp.float32))
    rf = jnp.zeros((n_pad, D * 2), jnp.float32).at[:N].set(
        r.reshape(N, D * 2).astype(jnp.float32))
    wf = jnp.zeros((n_pad, D), jnp.float32).at[:N].set(w.astype(jnp.float32))

    out = pl.pallas_call(
        functools.partial(_assemble_kernel, D=D),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
        grid=(n_pad // KNOT_TILE,),
        in_specs=[
            pl.BlockSpec((KNOT_TILE, D * 18), lambda i: (i, 0)),
            pl.BlockSpec((KNOT_TILE, D * 2), lambda i: (i, 0)),
            pl.BlockSpec((KNOT_TILE, D), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((KNOT_TILE, 128), lambda i: (i, 0)),
        interpret=interpret,
    )(Jf, rf, wf)
    G = out[:N, :81].reshape(N, 9, 9).astype(J.dtype)
    g = out[:N, 81:90].astype(J.dtype)
    return G, g


def assemble_normal_eq_reference(J, r, w):
    """Pure-jnp oracle."""
    JW = J * w[..., None, None]
    G = jnp.einsum("ndki,ndkj->nij", JW, J)
    g = jnp.einsum("ndki,ndk->ni", JW, r)
    return G, g
