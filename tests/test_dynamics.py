import numpy as np
import jax
import jax.numpy as jnp

from vinsat_tpu.core import dynamics


def np_orbit_dynamics(x, mu=398600.4418, j2=1.75553e10):
    """Independent numpy oracle of the reference acceleration formula
    (sim/orbit_gen.py:130-143)."""
    r, v = x[:3], x[3:]
    r_mat = np.array([[6, -1.5, -1.5], [6, -1.5, -1.5], [3, -4.5, -4.5]])
    rn = np.linalg.norm(r)
    v_dot = -(mu / rn**3) * r + (j2 / rn**7) * (r_mat @ (r**2)) * r
    return np.concatenate([v, v_dot])


def np_rk4(x, h):
    f1 = np_orbit_dynamics(x)
    f2 = np_orbit_dynamics(x + 0.5 * h * f1)
    f3 = np_orbit_dynamics(x + 0.5 * h * f2)
    f4 = np_orbit_dynamics(x + h * f3)
    return x + (h / 6.0) * (f1 + 2 * f2 + 2 * f3 + f4)


LEO_STATE = np.array([6900.0, 100.0, -50.0, 0.1, 7.5, 0.5])


def test_accel_matches_numpy_oracle(rng):
    xs = LEO_STATE[None] + rng.normal(size=(16, 6)) * 10.0
    got = np.asarray(dynamics.orbit_dynamics(jnp.array(xs)))
    want = np.stack([np_orbit_dynamics(x) for x in xs])
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_rk4_step_matches_numpy(rng):
    x = jnp.array(LEO_STATE)
    got = np.asarray(dynamics.rk4_step(x, 1.0))
    np.testing.assert_allclose(got, np_rk4(LEO_STATE, 1.0), rtol=1e-12)


def test_rollout_energy_sanity():
    """Orbit should stay bounded near its initial radius over one period."""
    x0 = jnp.array([6900.0, 0.0, 0.0, 0.0, 7.6, 0.0])
    traj = np.asarray(dynamics.rollout_orbit(x0, 6000, 1.0))
    radii = np.linalg.norm(traj[:, :3], axis=-1)
    assert radii.min() > 6500.0 and radii.max() < 7500.0


def test_textbook_j2_close_to_two_body():
    r = jnp.array([[7000.0, 0.0, 0.0]])
    a_tb = np.asarray(dynamics.orbit_accel_textbook(r))
    a_2bp = -398600.4418 / 7000.0**2
    # J2 perturbation is ~1e-3 relative
    np.testing.assert_allclose(a_tb[0, 0], a_2bp, rtol=5e-3)
    assert abs(a_tb[0, 0] - a_2bp) > 1e-7


def test_propagate_gaps_matches_dense_rollout():
    """Hop-based gap propagation == 1 Hz dense rollout when substep=1."""
    x0 = LEO_STATE
    gaps = jnp.array([5.0, 3.0, 0.0, 7.0])
    pos = jnp.tile(jnp.array(x0[:3]), (4, 1))
    vel = jnp.tile(jnp.array(x0[3:]), (4, 1))
    p, v = dynamics.propagate_gaps(pos, vel, gaps, num_hops=8, max_substep=1.0)
    for i, g in enumerate([5, 3, 0, 7]):
        dense = np.asarray(dynamics.propagate_dense(jnp.array(x0[:3]), jnp.array(x0[3:]), g))
        np.testing.assert_allclose(np.asarray(p)[i], dense[-1, :3], rtol=1e-12)
        np.testing.assert_allclose(np.asarray(v)[i], dense[-1, 3:], rtol=1e-12)


def test_propagate_gaps_large_substep_accuracy():
    """100 s hops vs 1 s steps over a 1000 s gap: sub-metre agreement."""
    pos = jnp.array([LEO_STATE[:3]])
    vel = jnp.array([LEO_STATE[3:]])
    gaps = jnp.array([1000.0])
    p_hop, v_hop = dynamics.propagate_gaps(pos, vel, gaps, num_hops=11, max_substep=100.0)
    dense = np.asarray(dynamics.propagate_dense(pos[0], vel[0], 1000))
    err_km = np.linalg.norm(np.asarray(p_hop)[0] - dense[-1, :3])
    # ~10 m over 1000 s: matches the reference GPU skip path's accuracy
    # regime (BA_utils.py:52-71) and is negligible vs the 5 km ATE target.
    assert err_km < 0.02, f"hop error {err_km} km"


def test_propagate_jacobian_matches_autodiff():
    pos = jnp.array([LEO_STATE[:3], LEO_STATE[:3] + 5.0])
    vel = jnp.array([LEO_STATE[3:], LEO_STATE[3:] * 1.01])
    gaps = jnp.array([250.0, 130.0])

    p, v, J = dynamics.propagate_gaps_with_jacobian(pos, vel, gaps, num_hops=4, max_substep=100.0)
    # positions must equal the non-jacobian path
    p2, v2 = dynamics.propagate_gaps(pos, vel, gaps, num_hops=4, max_substep=100.0)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p2), rtol=1e-12)

    def f(x, gap):
        pp, vv = dynamics.propagate_gaps(x[None, :3], x[None, 3:], gap[None], num_hops=4, max_substep=100.0)
        return jnp.concatenate([pp[0], vv[0]])

    for i in range(2):
        x = jnp.concatenate([pos[i], vel[i]])
        J_ad = jax.jacfwd(f)(x, gaps[i])
        np.testing.assert_allclose(np.asarray(J)[i], np.asarray(J_ad), rtol=1e-9, atol=1e-12)


def test_attitude_rollout_preserves_norm_and_momentum():
    q0 = jnp.array([0.1, 0.2, -0.3, 0.9])
    q0 = q0 / jnp.linalg.norm(q0)
    w0 = jnp.array([0.02, -0.01, 0.03])
    x0 = jnp.concatenate([q0, w0])
    traj = np.asarray(dynamics.rollout_attitude(x0, 500, 1.0))
    norms = np.linalg.norm(traj[:, :4], axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-9)
    # |J omega| conserved for torque-free rigid body
    J = np.asarray(dynamics.INERTIA_3U)
    h = np.linalg.norm(traj[:, 4:] * J, axis=-1)
    np.testing.assert_allclose(h, h[0], rtol=1e-6)
