"""Subsystem-isolation solves — the formalization of the reference's debug
entry points (attitude_debugging / dynamics_debugging, od_pipe.py:381-778;
SURVEY.md §4 "debug entry points as tests")."""
import numpy as np
import jax.numpy as jnp

from vinsat_tpu.estimation import ba
from tests.test_ba import _make_problem


def _run(states, prob, params, iters=10, init=3):
    lam = jnp.asarray(1e-4)
    for it in range(iters):
        step = ba.ba_iteration(jnp.asarray(it), states, prob, lam,
                               params=params, initialize=(it < init))
        states, lam = step.states, step.lamda_init
    return states


def test_orbit_only_mode(rng):
    """quat_coeff=0 disables the attitude dynamics factor; position/velocity
    still converge through vision + orbit dynamics (dynamics_debugging
    analog, od_pipe.py:538-778)."""
    states_gt, prob = _make_problem(rng, noise_px=1.0)
    n = states_gt.shape[0]
    states = states_gt.at[:, :3].add(jnp.array(rng.normal(size=(n, 3)) * 8.0))
    params = ba.SolverParams(quat_coeff=0.0)
    out = _run(states, prob, params)
    err = np.linalg.norm(np.asarray(out[:, :3] - states_gt[:, :3]),
                         axis=-1).mean()
    assert err < 1.0, f"orbit-only mean error {err} km"


def test_attitude_recovery_mode(rng):
    """Perturb only the attitude; with positions at GT the solver recovers
    the quaternions from reprojection + the quaternion factor
    (attitude_debugging analog, od_pipe.py:381-533)."""
    from vinsat_tpu.core import quat

    states_gt, prob = _make_problem(rng, noise_px=0.5)
    n = states_gt.shape[0]
    phi = jnp.array(rng.normal(size=(n, 3)) * 0.02)
    states = jnp.concatenate(
        [states_gt[:, :3], quat.box_plus(states_gt[:, 3:7], phi),
         states_gt[:, 7:]], axis=-1)
    d0 = 1 - np.abs(np.sum(np.asarray(states[:, 3:7] * states_gt[:, 3:7]),
                           axis=-1)).mean()
    out = _run(states, prob, ba.SolverParams(), iters=12, init=6)
    d1 = 1 - np.abs(np.sum(np.asarray(out[:, 3:7] * states_gt[:, 3:7]),
                           axis=-1)).mean()
    assert d1 < 0.1 * d0, f"attitude error {d1} vs initial {d0}"
