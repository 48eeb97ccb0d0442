"""Long-arc distributed OD (BASELINE.json config 5): a 10k-frame orbit arc
whose knots are sharded across the "arc" mesh axis, solved by iterating the
sharded LM step.

The host prepares the per-knot-budget ShardedProblem from a simulated
sequence; every LM iteration runs fully on-device across the mesh (halo
exchanges + SPIKE solve, dist/sharded_ba.py).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vinsat_tpu.core import quat
from vinsat_tpu.dist import sharded_ba
from vinsat_tpu.estimation import ba, factors


class LongArcResult(NamedTuple):
    states: np.ndarray  # (N, 10)
    errors_km: np.ndarray  # (N,) final per-knot position errors
    knot_times: np.ndarray


def build_sharded_problem(seq, n_arc: int, max_dets_per_knot: int = 4,
                          noise_pos_km: float = 100.0,
                          noise_ori_rad: float = 0.2,
                          noise_vel_rel: float = 0.1,
                          dtype=jnp.float32, seed: int = 0):
    """Simulated sequence -> (ShardedProblem, gt_states, knot_times,
    n_real).  Initial (noised) states live in prob.states.

    Knots are padded to a multiple of n_arc; observations are re-bucketed to
    a fixed per-knot budget (the scatter-free layout of dist/sharded_ba).
    """
    from vinsat_tpu.estimation import ingest

    rng = np.random.default_rng(seed)
    T = seq.orbit_pos_eci_km.shape[0]
    graph = ingest.build_graph(seq.det_rows, T)
    gt = ingest.process_ground_truths(seq.orbit_pos_eci_km, graph)
    from vinsat_tpu.config import REFERENCE_INTRINSICS

    intr = np.array(REFERENCE_INTRINSICS)
    uv_proj = np.asarray(factors.project_landmarks(
        jnp.asarray(gt.states), jnp.asarray(gt.landmarks_xyz),
        jnp.asarray(graph.ii), jnp.asarray(intr)))
    graph, gt, _ = ingest.gate_and_compact(graph, gt, uv_proj)
    N0 = len(graph.time_idx)
    N = ((N0 + n_arc - 1) // n_arc) * n_arc
    D = max_dets_per_knot

    # re-bucket ragged obs into per-knot slots
    lm_xyz = np.zeros((N, D, 3))
    uv = np.zeros((N, D, 2))
    conf = np.zeros((N, D))
    ov = np.zeros((N, D))
    fill = np.zeros(N, dtype=int)
    for j, k in enumerate(graph.ii):
        s = fill[k]
        if s >= D:
            continue
        lm_xyz[k, s] = gt.landmarks_xyz[j]
        uv[k, s] = graph.uv[j]
        conf[k, s] = graph.conf[j]
        ov[k, s] = 1.0
        fill[k] += 1

    gaps = np.zeros(N)
    gaps[:N0 - 1] = np.diff(graph.time_idx)
    cum = np.zeros((N, 4))
    cum[:, 3] = 1.0
    cum[:N0] = np.asarray(factors.cumulative_rotations(
        jnp.asarray(gt.omega_full), 1.0, jnp.asarray(graph.time_idx)))
    pv = np.zeros(N)
    pv[:N0 - 1] = 1.0

    pos0 = gt.states[:, :3] + rng.standard_normal((N0, 3)) * noise_pos_km
    phi = np.asarray(quat.log(jnp.asarray(gt.states[:, 3:7])))
    phi = phi + rng.standard_normal((N0, 3)) * noise_ori_rad
    q0 = np.asarray(quat.exp(jnp.asarray(phi)))
    vs = np.abs(gt.states[:, 7:10]).mean()
    vel0 = gt.states[:, 7:10] + rng.standard_normal((N0, 3)) * vs * noise_vel_rel
    st = np.zeros((N, 10))
    st[:, 6] = 1.0
    st[:N0] = np.concatenate([pos0, q0, vel0], axis=1)

    jd = jnp.dtype(dtype)
    prob = sharded_ba.ShardedProblem(
        states=jnp.asarray(st, jd)[None],
        gaps=jnp.asarray(gaps, jd)[None],
        cum_rot=jnp.asarray(cum, jd)[None],
        lm_xyz=jnp.asarray(lm_xyz, jd)[None],
        uv=jnp.asarray(uv, jd)[None],
        conf=jnp.asarray(conf, jd)[None],
        obs_valid=jnp.asarray(ov, jd)[None],
        pair_valid=jnp.asarray(pv, jd)[None],
        intrinsics=jnp.asarray(intr, jd),
    )
    return prob, gt.states, graph.time_idx, N0


def solve_long_arc(mesh, prob: sharded_ba.ShardedProblem, gt_states,
                   knot_t, n_real: int, num_iters: int = 20,
                   init_iters: int = 10,
                   params: Optional[ba.SolverParams] = None) -> LongArcResult:
    """Iterate the sharded LM step over one long arc."""
    if params is None:
        max_gap = float(np.asarray(prob.gaps).max())
        params = ba.SolverParams(
            num_hops=int(np.ceil(max_gap / 100.0)) + 1
        )
    step = sharded_ba.make_sharded_ba_step(mesh, params)
    dtype = prob.states.dtype
    lam = jnp.full((1,), 1e-4, dtype)
    states = prob.states
    for i in range(num_iters):
        prob_i = prob._replace(states=states)
        new_states, lam = step(jnp.asarray(i), lam, prob_i,
                               initialize=float(i < init_iters))
        states = new_states
    out = np.asarray(states[0])[:n_real]
    errs = np.linalg.norm(out[:, :3] - gt_states[:n_real, :3], axis=-1)
    return LongArcResult(out, errs, knot_t)
