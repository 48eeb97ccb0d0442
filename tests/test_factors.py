import numpy as np
import jax
import jax.numpy as jnp

from vinsat_tpu.core import dynamics, frames, quat
from vinsat_tpu.estimation import factors
from vinsat_tpu.sim import orbits


def make_states(rng, n):
    pos = rng.normal(size=(n, 3)) * 50 + np.array([6900.0, 0, 0])
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    vel = rng.normal(size=(n, 3)) + np.array([0, 7.5, 0])
    return jnp.array(np.concatenate([pos, q, vel], axis=-1))


INTR = jnp.array([3547.85, 3547.85, 2304.0, 1296.0])


def test_reprojection_zero_residual_at_gt():
    """Project GT landmarks through GT nadir poses: ~0 px residual
    (the reference's core sanity check, od_pipe.py:66-69,939)."""
    traj = orbits.generate_trajectory(jax.random.PRNGKey(0), duration_s=100)
    t = jnp.array([10, 50])
    pos = traj.pos_eci[t]
    q = traj.quat_nadir_eci[t]
    states = jnp.concatenate([pos, q, traj.vel_eci[t]], axis=-1)
    # landmarks: ground points slightly off-boresight
    ground = pos * (6378.0 / jnp.linalg.norm(pos, axis=-1, keepdims=True))
    lm = jnp.concatenate([ground + 20.0, ground - 15.0], axis=0)
    ii = jnp.array([0, 1, 0, 1])
    uv = factors.project_landmarks(states, lm, ii, INTR)
    uv2 = factors.reprojection_factor(states, lm, ii, INTR).uv
    np.testing.assert_allclose(np.asarray(uv), np.asarray(uv2), rtol=1e-12)
    # all near image centre-ish and finite
    assert np.isfinite(np.asarray(uv)).all()


def test_reprojection_jacobian_matches_lifted_autodiff(rng):
    """Analytic J == autodiff of the reference's lifted composition:
    pos columns = true derivative; quat columns = ambient-grad @ Gq, which is
    2x the true tangent derivative (reference convention, BA_utils.py:45-48).
    """
    states = make_states(rng, 3)
    lm = jnp.array(rng.normal(size=(5, 3)) * 100 + np.array([6378.0, 0, 0]))
    ii = jnp.array([0, 1, 2, 0, 1])
    out = factors.reprojection_factor(states, lm, ii, INTR)

    def f(dpose):
        pos = states[:, :3] + dpose[:, :3]
        q = quat.multiply(states[:, 3:7], quat.exp(dpose[:, 3:6]))
        st = jnp.concatenate([pos, q, states[:, 7:]], axis=-1)
        return factors.project_landmarks(st, lm, ii, INTR)

    J_ad = jax.jacfwd(f)(jnp.zeros((3, 6)))  # (M, 2, N, 6)
    J_ad = np.asarray(J_ad)
    J = np.asarray(out.J)
    for m, n in enumerate(np.asarray(ii)):
        np.testing.assert_allclose(J[m, :, 0:3], J_ad[m, :, n, 0:3], atol=1e-8)
        np.testing.assert_allclose(J[m, :, 3:6], 2.0 * J_ad[m, :, n, 3:6],
                                   atol=1e-8)
        np.testing.assert_allclose(J[m, :, 6:9], 0.0, atol=0)


def _ref_lifted_quat_terms(states, cum_rot, quat_coeff):
    """Autodiff replica of the reference's res_preds_sum_grad / Hessian
    computation (BA_utils.py:481-523) for validation."""
    N = states.shape[0]

    def rq_sum(q_flat):
        q = q_flat.reshape(N, 4)
        q_hat = quat.multiply(q[:-1], cum_rot[:-1])
        d = jnp.sum(q_hat * q[1:], axis=-1)
        return (quat_coeff * (1.0 - jnp.abs(d))).sum()

    def lifted_grad(q_flat):
        q = q_flat.reshape(N, 4)
        g = jax.grad(rq_sum)(q_flat).reshape(N, 4)
        Gq = quat.attitude_jacobian(q)
        return jnp.einsum("nij,ni->nj", Gq, g).reshape(-1)

    q_flat = states[:, 3:7].reshape(-1)
    g3 = lifted_grad(q_flat).reshape(N, 3)
    Hamb = jax.jacfwd(lifted_grad)(q_flat).reshape(N, 3, N, 4)
    Gq = quat.attitude_jacobian(states[:, 3:7])
    H3 = jnp.einsum("ainj,njb->ainb", Hamb, Gq)
    return g3, H3


def test_quat_residual_terms_match_reference_autodiff(rng):
    states = make_states(rng, 5)
    c = rng.normal(size=(5, 4)) * 0.1 + np.array([0, 0, 0, 1.0])
    c /= np.linalg.norm(c, axis=-1, keepdims=True)
    cum_rot = jnp.array(c)
    qc = 100.0
    res_q, qgrad, Hd, Ho, _ = factors._quat_residual_terms(
        states[:, 3:7], cum_rot, qc, jnp.ones(4)
    )
    g3_ref, H3_ref = _ref_lifted_quat_terms(states, cum_rot, qc)
    np.testing.assert_allclose(np.asarray(qgrad[:, 3:6]), np.asarray(g3_ref),
                               atol=1e-9)
    H3_ref = np.asarray(H3_ref)
    Hd = np.asarray(Hd)
    Ho = np.asarray(Ho)
    for t in range(5):
        np.testing.assert_allclose(Hd[t, 3:6, 3:6], H3_ref[t, :, t, :],
                                   atol=1e-9, err_msg=f"diag {t}")
    for t in range(4):
        np.testing.assert_allclose(Ho[t, 3:6, 3:6], H3_ref[t, :, t + 1, :],
                                   atol=1e-9, err_msg=f"off {t}")
        # symmetry of the full Hessian
        np.testing.assert_allclose(H3_ref[t + 1, :, t, :],
                                   H3_ref[t, :, t + 1, :].T, atol=1e-9)
    # residual value
    d = np.sum(np.asarray(quat.multiply(states[:-1, 3:7], cum_rot[:-1]))
               * np.asarray(states[1:, 3:7]), axis=-1)
    np.testing.assert_allclose(np.asarray(res_q), qc * (1 - np.abs(d)),
                               atol=1e-12)


def test_dynamics_factor_residual_and_jacobian(rng):
    """res_pv equals direct propagation difference; A equals autodiff of the
    propagation wrt the source knot; B is the constant -W block."""
    traj = orbits.generate_trajectory(jax.random.PRNGKey(1), duration_s=900)
    t_idx = jnp.array([0, 250, 600, 900])
    gaps = jnp.array([250.0, 350.0, 300.0, 0.0])
    states = jnp.concatenate(
        [traj.pos_eci[t_idx], traj.quat_nadir_eci[t_idx], traj.vel_eci[t_idx]],
        axis=-1,
    )
    ident = jnp.zeros((4, 4)).at[:, 3].set(1.0)
    vc = 100.0
    fac = factors.dynamics_factor(states, gaps, ident, 100.0, vc)

    # GT knots from the same integrator: residuals should be ~0 except for
    # the hop-size difference (1 s sim vs 100 s hops): < 20 m / tiny vel
    res = np.asarray(fac.res_pv)
    assert np.abs(res[:, :3]).max() < 0.02
    assert np.abs(res[:, 3:]).max() / vc < 2e-5

    # Jacobian check vs autodiff through the same hop propagation
    def prop(x, gap):
        p, v = dynamics.propagate_gaps(x[None, :3], x[None, 3:], gap[None],
                                       num_hops=16, max_substep=100.0)
        return jnp.concatenate([p[0], vc * v[0]])

    for t in range(3):
        x = jnp.concatenate([states[t, :3], states[t, 7:10]])
        J_ad = np.asarray(jax.jacfwd(prop)(x, gaps[t]))
        A = np.asarray(fac.A[t])
        np.testing.assert_allclose(A[:, 0:3], J_ad[:, 0:3], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(A[:, 6:9], J_ad[:, 3:6], rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(A[:, 3:6], 0.0, atol=0)
        B = np.asarray(fac.B[t])
        np.testing.assert_allclose(B[0:3, 0:3], -np.eye(3), atol=0)
        np.testing.assert_allclose(B[3:6, 6:9], -vc * np.eye(3), atol=0)


def test_cumulative_rotations_match_sequential(rng):
    T = 50
    om = jnp.array(rng.normal(size=(T, 3)) * 0.01)
    knots = jnp.array([0, 7, 23, 49])
    c = factors.cumulative_rotations(om, 1.0, knots)
    # sequential oracle
    for i, (a, b) in enumerate(zip([0, 7, 23], [7, 23, 49])):
        prod = jnp.array([0.0, 0, 0, 1])
        for k in range(a, b):
            prod = quat.multiply(prod, quat.exp(om[k]))
        sign = np.sign(np.sum(np.asarray(prod) * np.asarray(c[i])))
        np.testing.assert_allclose(np.asarray(c[i]) * sign, np.asarray(prod),
                                   atol=1e-12)
    # last entry identity
    np.testing.assert_allclose(np.asarray(c[-1]), [0, 0, 0, 1], atol=1e-12)


def test_prior_factor_state_terms(rng):
    states = make_states(rng, 4)
    prop = make_states(rng, 4)
    Hs = jnp.array(np.tile(np.eye(6) * 2.0, (4, 1, 1)))
    Hr = jnp.array(np.tile(np.eye(3), (4, 1, 1)))
    pf = factors.prior_factor(states, prop, Hs, Hr, 1.0, 1.0)
    dr = np.concatenate(
        [np.asarray(prop[:, :3] - states[:, :3]),
         np.asarray(prop[:, 7:] - states[:, 7:])], axis=-1
    )
    np.testing.assert_allclose(np.asarray(pf.res[:, :6]), 2.0 * dr, atol=1e-9)

    # Jacobian vs autodiff
    def f(dpose):
        pos = states[:, :3] + dpose[:, :3]
        vel = states[:, 7:] + dpose[:, 6:9]
        st = jnp.concatenate([pos, states[:, 3:7], vel], axis=-1)
        return factors.prior_factor(st, prop, Hs, Hr, 1.0, 1.0).res[:, :6]

    J_ad = np.asarray(jax.jacfwd(f)(jnp.zeros((4, 9))))
    Jp = np.asarray(pf.Jp)
    for n in range(4):
        np.testing.assert_allclose(Jp[n], J_ad[n, :, n, :], atol=1e-9)
