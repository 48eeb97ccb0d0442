"""Distributed symmetric block-tridiagonal solver (SPIKE / Schur reduction).

This is the "arc parallelism" core (BASELINE.json config 5): the BA normal
matrix is block-tridiagonal in knots (dynamics couple only adjacent knots —
SURVEY.md §7 "Solver structure"), so a long arc sharded across devices is
solved by:

  1. each device Thomas-eliminating its local chunk (O(m·k³) sequential,
     fully parallel across devices),
  2. forming its 2-boundary Schur "spikes" V, W,
  3. one all_gather of the (P, 2, k, k) boundary spikes over the ICI ring,
  4. a replicated dense solve of the tiny 2P·k reduced system,
  5. local back-substitution.

Communication: one ppermute (halo of the coupling block) + one all_gather of
O(P·k²) floats — bandwidth-trivial on ICI.  This replaces the reference's
dense (9N)³ torch.linalg.solve (BA_filtering.py:55), which cannot be
distributed at all.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from vinsat_tpu.estimation.ba import (_tridiag_general, block_tridiag_solve,
                                      block_tridiag_solve_multi)


def _local_spike(D_l, U_l, b_l, U_prev_last):
    """Per-device SPIKE factor: returns (g, V, W) with
    x_local = g - V @ x_leftboundary - W @ x_rightboundary."""
    m, k, _ = D_l.shape
    L_first = U_prev_last.T
    U_inner = U_l[:-1]
    U_last = U_l[-1]
    g = block_tridiag_solve(D_l, U_inner, b_l)
    rhsV = jnp.zeros((m, k, k), D_l.dtype).at[0].set(L_first)
    rhsW = jnp.zeros((m, k, k), D_l.dtype).at[-1].set(U_last)
    V = block_tridiag_solve_multi(D_l, U_inner, rhsV)
    W = block_tridiag_solve_multi(D_l, U_inner, rhsW)
    return g, V, W


def _shard_body(nshards: int, axis: str, D_l, U_l, b_l):
    k = D_l.shape[-1]
    p_idx = jax.lax.axis_index(axis)

    # halo: left neighbor's last coupling block (zeros for shard 0)
    U_last = U_l[-1]
    perm = [(i, i + 1) for i in range(nshards - 1)]
    U_prev_last = jax.lax.ppermute(U_last, axis, perm)

    g, V, W = _local_spike(D_l, U_l, b_l, U_prev_last)

    bound = jnp.stack([
        V[0], V[-1], W[0], W[-1],
    ])  # (4, k, k)
    gb = jnp.stack([g[0], g[-1]])  # (2, k)
    all_bound = jax.lax.all_gather(bound, axis)  # (P, 4, k, k)
    all_g = jax.lax.all_gather(gb, axis)  # (P, 2, k)

    # The reduced system in the boundary unknowns y_p = [x_first_p, x_last_p]
    # is ITSELF block tridiagonal with 2k x 2k blocks over the P shards
    # (shard p couples to p-1 through V and to p+1 through W), so solve it
    # with a P-step Thomas recursion — same structure as the single-chip
    # chunked SPIKE (ba.block_tridiag_solve_chunked); the earlier dense
    # 2Pk LU serialized over 2P·k pivots and dominated at large P.
    k2 = 2 * k
    Vf, Vl = all_bound[:, 0], all_bound[:, 1]  # (P, k, k)
    Wf, Wl = all_bound[:, 2], all_bound[:, 3]
    Dr = jnp.broadcast_to(jnp.eye(k2, dtype=D_l.dtype), (nshards, k2, k2))
    Lr = jnp.zeros((nshards, k2, k2), D_l.dtype)
    Lr = Lr.at[:, 0:k, k:].set(Vf)
    Lr = Lr.at[:, k:, k:].set(Vl)
    Ur = jnp.zeros((nshards, k2, k2), D_l.dtype)
    Ur = Ur.at[:, 0:k, 0:k].set(Wf)
    Ur = Ur.at[:, k:, 0:k].set(Wl)
    br = jnp.concatenate([all_g[:, 0], all_g[:, 1]], axis=1)  # (P, 2k)
    y2 = _tridiag_general(Dr, Ur[:-1], Lr, br)  # (P, 2k) replicated

    # x_left = last-boundary of the left neighbor; x_right = first-boundary
    # of the right neighbor (zeros at the ends)
    left_idx = jnp.clip(p_idx - 1, 0, nshards - 1)
    right_idx = jnp.clip(p_idx + 1, 0, nshards - 1)
    x_left = jnp.where(p_idx > 0, y2[left_idx, k:],
                       jnp.zeros(k, D_l.dtype))
    x_right = jnp.where(p_idx < nshards - 1, y2[right_idx, 0:k],
                        jnp.zeros(k, D_l.dtype))
    x = g - jnp.einsum("mij,j->mi", V, x_left) - jnp.einsum(
        "mij,j->mi", W, x_right
    )
    return x


def sharded_block_tridiag_solve(mesh: Mesh, D, U, b, axis: str = "arc"):
    """Solve the symmetric block-tridiagonal system with block rows sharded
    over `axis` of `mesh`.

    D (N, k, k), U (N, k, k) — U[i] couples row i to row i+1; U[N-1] MUST be
    zero — and b (N, k).  N must divide by the axis size.  Returns x (N, k)
    with the same sharding.
    """
    nshards = mesh.shape[axis]
    body = functools.partial(_shard_body, nshards, axis)
    spec = P(axis)
    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(D, U, b)
