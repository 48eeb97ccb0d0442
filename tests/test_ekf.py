import numpy as np
import jax
import jax.numpy as jnp

from vinsat_tpu.core import quat
from vinsat_tpu.estimation import ekf, factors
from vinsat_tpu.sim import orbits

INTR = jnp.array([3547.8512126219637, 3547.8512126219637, 2304.0, 1296.0])


def _knot_problem(n_knots=12, gap=100, obs_per_knot=6, noise_px=2.0, seed=0):
    rng = np.random.default_rng(seed)
    traj = orbits.generate_trajectory(jax.random.PRNGKey(5),
                                      duration_s=gap * n_knots)
    t_idx = (np.arange(n_knots) * gap).astype(int)
    pos = np.asarray(traj.pos_eci)[t_idx]
    q = np.asarray(traj.quat_nadir_eci)[t_idx]
    vel = np.asarray(traj.vel_eci)[t_idx]
    states_gt = np.concatenate([pos, q, vel], axis=1)

    omega = quat.omega_from_sequence(traj.quat_nadir_eci, 1.0)
    knots = jnp.array(t_idx)
    cum = factors.cumulative_rotations(omega, 1.0, knots)
    # cum rotation for the gap BEFORE each knot = previous knot's gap product
    cum_before = jnp.concatenate(
        [jnp.zeros((1, 4)).at[0, 3].set(1.0), cum[:-1]], axis=0
    )

    D = obs_per_knot
    lm = np.zeros((n_knots, D, 3))
    uv = np.zeros((n_knots, D, 2))
    for k in range(n_knots):
        ground = pos[k] * (6378.0 / np.linalg.norm(pos[k]))
        lm[k] = ground + rng.normal(size=(D, 3)) * 30.0
        st = jnp.array(states_gt[k:k + 1])
        uvk = factors.project_landmarks(
            st, jnp.array(lm[k]), jnp.zeros(D, dtype=jnp.int32), INTR
        )
        uv[k] = np.asarray(uvk) + rng.normal(size=(D, 2)) * noise_px
    gaps = np.concatenate([[0.0], np.full(n_knots - 1, float(gap))])
    return states_gt, gaps, cum_before, lm, uv


def test_ekf_converges_from_offset():
    states_gt, gaps, cum_before, lm, uv = _knot_problem()
    n = states_gt.shape[0]
    x0 = states_gt[0].copy()
    x0[:3] += np.array([20.0, -15.0, 10.0])  # 27 km initial error
    x0[7:] += np.array([0.01, -0.02, 0.01])
    cov0 = jnp.diag(jnp.array([1e3] * 3 + [1e-2] * 3 + [1e-1] * 3))

    states, covs = ekf.run_filter(
        jnp.array(x0), cov0, jnp.array(gaps), cum_before,
        jnp.array(lm), jnp.array(uv), jnp.ones((n, uv.shape[1])), INTR,
        ekf.EKFConfig(meas_noise_px=3.0),
    )
    err = np.linalg.norm(np.asarray(states)[:, :3] - states_gt[:, :3], axis=-1)
    assert err[0] < 27.0  # first update already improves
    # filter-only OD reaches the <5 km headline regime (batch BA refines
    # further); see test_streaming for the <1 km batch result
    assert err[-1] < 5.0, f"final EKF error {err[-1]} km"
    # covariance contracts
    tr0 = float(jnp.trace(covs[0][:3, :3]))
    trN = float(jnp.trace(covs[-1][:3, :3]))
    assert trN < tr0


def test_ekf_predict_grows_covariance():
    states_gt, gaps, cum_before, lm, uv = _knot_problem(n_knots=3)
    st = ekf.EKFState(jnp.array(states_gt[0]),
                      jnp.eye(9) * 1e-4)
    out = ekf.predict(st, jnp.asarray(500.0), jnp.array([0.0, 0, 0, 1.0]))
    assert float(jnp.trace(out.cov)) > float(jnp.trace(st.cov))
    # state stays on orbit
    r = float(jnp.linalg.norm(out.state[:3]))
    assert 6500 < r < 7300


def test_rts_smoother_beats_filter():
    """Smoothed estimates condition on all observations: accuracy at early
    knots must improve markedly over the forward filter."""
    states_gt, gaps, cum_before, lm, uv = _knot_problem(n_knots=14, seed=2)
    n = states_gt.shape[0]
    x0 = states_gt[0].copy()
    x0[:3] += np.array([15.0, -10.0, 8.0])
    x0[7:] += np.array([0.01, -0.01, 0.005])
    cov0 = jnp.diag(jnp.array([1e3] * 3 + [1e-2] * 3 + [1e-1] * 3))
    args = (jnp.array(x0), cov0, jnp.array(gaps), cum_before,
            jnp.array(lm), jnp.array(uv), jnp.ones((n, uv.shape[1])), INTR)
    cfg = ekf.EKFConfig(meas_noise_px=3.0)
    xf, Pf = ekf.run_filter(*args, cfg)
    xs, Ps = ekf.run_smoother(*args, cfg)
    ef = np.linalg.norm(np.asarray(xf)[:, :3] - states_gt[:, :3], axis=-1)
    es = np.linalg.norm(np.asarray(xs)[:, :3] - states_gt[:, :3], axis=-1)
    # last knot identical (smoother anchor)
    np.testing.assert_allclose(es[-1], ef[-1], rtol=1e-9)
    # early knots improve substantially; overall mean improves
    assert es[: n // 2].mean() < 0.6 * ef[: n // 2].mean(), (
        f"smoother {es[:n//2].mean():.3f} vs filter {ef[:n//2].mean():.3f}"
    )
    assert es.mean() <= ef.mean() * 1.01
