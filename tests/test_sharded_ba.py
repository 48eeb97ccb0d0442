"""Numerical agreement: the multi-chip sharded BA step vs the single-chip
ba_iteration on the same problem.

At sched_iter=0 the robust alpha is 2, so the weight normalization cancels
the scale estimate and both paths (median vs distributed-mean scale) produce
IDENTICAL weights — the only remaining differences are the halo exchanges
and the SPIKE solve, which must match the sequential Thomas solve.
"""
import numpy as np
import jax
import jax.numpy as jnp

from vinsat_tpu.core import quat
from vinsat_tpu.dist import mesh as mesh_mod
from vinsat_tpu.dist import sharded_ba
from vinsat_tpu.estimation import ba, factors
from vinsat_tpu.sim import orbits

INTR = jnp.array([3547.8512126219637, 3547.8512126219637, 2304.0, 1296.0])


def _build_problem(rng, n_knots=16, D=4, gap=150.0):
    duration = int(gap * (n_knots - 1))
    traj = orbits.generate_trajectory(jax.random.PRNGKey(11),
                                      duration_s=duration)
    t_idx = (np.arange(n_knots) * gap).astype(int)
    pos = np.asarray(traj.pos_eci)[t_idx]
    q = np.asarray(traj.quat_nadir_eci)[t_idx]
    vel = np.asarray(traj.vel_eci)[t_idx]
    states_gt = jnp.array(np.concatenate([pos, q, vel], axis=1))

    omega = quat.omega_from_sequence(traj.quat_nadir_eci, 1.0)
    cum = factors.cumulative_rotations(omega, 1.0, jnp.array(t_idx))

    lm = np.zeros((n_knots, D, 3))
    for k in range(n_knots):
        ground = pos[k] * (6378.0 / np.linalg.norm(pos[k]))
        lm[k] = ground + rng.normal(size=(D, 3)) * 30.0
    lm_flat = jnp.array(lm.reshape(-1, 3))
    ii = jnp.repeat(jnp.arange(n_knots), D).astype(jnp.int32)
    uv_true = factors.project_landmarks(states_gt, lm_flat, ii, INTR)
    uv = uv_true + jnp.array(rng.normal(size=uv_true.shape)) * 1.0
    conf = jnp.array(rng.uniform(0.85, 1.0, n_knots * D))

    gaps = jnp.array([gap] * (n_knots - 1) + [0.0])
    # perturbed init
    st = states_gt.at[:, :3].add(jnp.array(rng.normal(size=(n_knots, 3)) * 5))
    st = jnp.concatenate(
        [st[:, :3],
         quat.box_plus(st[:, 3:7], jnp.array(rng.normal(size=(n_knots, 3)) * 0.01)),
         st[:, 7:]], axis=-1)
    return st, gaps, cum, lm, uv, conf, ii, lm_flat


def test_sharded_step_matches_single_chip(rng):
    n_knots, D = 16, 4
    st, gaps, cum, lm, uv, conf, ii, lm_flat = _build_problem(rng, n_knots, D)
    params = ba.SolverParams(num_hops=3, max_substep=100.0)

    # single-chip reference
    prob = ba.BAProblem(
        gaps=gaps, cum_rot=cum, landmarks_xyz=lm_flat,
        landmarks_uv=uv, conf=conf, ii=ii,
        obs_valid=jnp.ones(n_knots * D), knot_valid=jnp.ones(n_knots),
        pair_valid=jnp.ones(n_knots - 1), intrinsics=INTR,
    )
    step_ref = ba.ba_iteration(jnp.asarray(0), st, prob, 1e-4, params=params)

    # sharded: 1 orbit x 4 arc shards
    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=4)
    pv = np.ones((1, n_knots))
    pv[:, -1] = 0.0
    sprob = sharded_ba.ShardedProblem(
        states=st[None],
        gaps=gaps[None],
        cum_rot=cum[None],
        lm_xyz=jnp.array(lm)[None],
        uv=uv.reshape(n_knots, D, 2)[None],
        conf=conf.reshape(n_knots, D)[None],
        obs_valid=jnp.ones((1, n_knots, D)),
        pair_valid=jnp.array(pv),
        intrinsics=INTR,
    )
    step_fn = sharded_ba.make_sharded_ba_step(mesh, params)
    new_states, new_lam = step_fn(
        jnp.asarray(0), jnp.full((1,), 1e-4), sprob
    )
    got = np.asarray(new_states[0])
    want = np.asarray(step_ref.states)
    np.testing.assert_allclose(got[:, :3], want[:, :3], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(got[:, 7:], want[:, 7:], rtol=1e-6, atol=1e-8)
    # quaternions up to sign
    s = np.sign(np.sum(got[:, 3:7] * want[:, 3:7], axis=-1, keepdims=True))
    np.testing.assert_allclose(got[:, 3:7] * s, want[:, 3:7], atol=1e-8)
    np.testing.assert_allclose(float(new_lam[0]), float(step_ref.lamda_init),
                               rtol=1e-9)


def test_sharded_step_batch_independent(rng):
    """Two identical orbits in the batch produce identical updates."""
    n_knots, D = 8, 3
    st, gaps, cum, lm, uv, conf, ii, lm_flat = _build_problem(rng, n_knots, D)
    params = ba.SolverParams(num_hops=3, max_substep=100.0)
    mesh = mesh_mod.make_mesh(n_orbit=2, n_arc=4)
    pv = np.ones((2, n_knots))
    pv[:, -1] = 0.0

    def dup(x):
        return jnp.stack([x, x])

    sprob = sharded_ba.ShardedProblem(
        states=dup(st), gaps=dup(gaps), cum_rot=dup(cum),
        lm_xyz=dup(jnp.array(lm)), uv=dup(uv.reshape(n_knots, D, 2)),
        conf=dup(conf.reshape(n_knots, D)),
        obs_valid=jnp.ones((2, n_knots, D)), pair_valid=jnp.array(pv),
        intrinsics=INTR,
    )
    step_fn = sharded_ba.make_sharded_ba_step(mesh, params)
    new_states, _ = step_fn(jnp.asarray(0), jnp.full((2,), 1e-4), sprob)
    np.testing.assert_allclose(np.asarray(new_states[0]),
                               np.asarray(new_states[1]), rtol=1e-12)


def test_sharded_robust_scale_with_outliers(rng):
    """The distributed median scale must keep the sharded path's outlier
    robustness comparable to the single-chip median (a mean scale was
    measured ~10x worse with 10% gross outliers)."""
    n_knots, D = 16, 6
    st, gaps, cum, lm, uv, conf, ii, lm_flat = _build_problem(rng, n_knots, D)
    M = n_knots * D
    out_idx = rng.choice(M, M // 10, replace=False)
    uv = np.array(uv, copy=True)
    uv[out_idx] += rng.uniform(200, 800, (len(out_idx), 2)) * rng.choice(
        [-1, 1], (len(out_idx), 2))
    uv = jnp.asarray(uv)
    params = ba.SolverParams(num_hops=3, max_substep=100.0)

    prob = ba.BAProblem(
        gaps=gaps, cum_rot=cum, landmarks_xyz=lm_flat, landmarks_uv=uv,
        conf=conf, ii=ii, obs_valid=jnp.ones(M),
        knot_valid=jnp.ones(n_knots), pair_valid=jnp.ones(n_knots - 1),
        intrinsics=INTR,
    )
    states_s, lam = st, jnp.asarray(1e-4)
    for i in range(12):
        step = ba.ba_iteration(jnp.asarray(i), states_s, prob, lam,
                               params=params)
        states_s, lam = step.states, step.lamda_init

    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=4)
    pv = np.ones((1, n_knots))
    pv[:, -1] = 0.0
    sprob = sharded_ba.ShardedProblem(
        states=st[None], gaps=gaps[None], cum_rot=cum[None],
        lm_xyz=jnp.array(lm)[None], uv=uv.reshape(n_knots, D, 2)[None],
        conf=conf.reshape(n_knots, D)[None],
        obs_valid=jnp.ones((1, n_knots, D)), pair_valid=jnp.array(pv),
        intrinsics=INTR,
    )
    step_fn = sharded_ba.make_sharded_ba_step(mesh, params)
    states_m, lam_b = sprob.states, jnp.full((1,), 1e-4)
    for i in range(12):
        states_m, lam_b = step_fn(jnp.asarray(i), lam_b,
                                  sprob._replace(states=states_m))

    d_pos = np.linalg.norm(
        np.asarray(states_m)[0][:, :3] - np.asarray(states_s)[:, :3],
        axis=-1)
    # same robust optimum as the single-chip median-scale path
    assert np.median(d_pos) < 0.5, f"median state gap {np.median(d_pos)} km"
