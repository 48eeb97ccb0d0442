import numpy as np
import jax
import jax.numpy as jnp

from vinsat_tpu.core import quat
from vinsat_tpu.estimation import ba, factors
from vinsat_tpu.sim import orbits

INTR = jnp.array([3547.8512126219637, 3547.8512126219637, 2304.0, 1296.0])


def test_block_tridiag_solve_matches_dense(rng):
    N, k = 7, 9
    D = rng.normal(size=(N, k, k))
    D = D @ D.transpose(0, 2, 1) + 10 * np.eye(k)  # SPD diag blocks
    U = rng.normal(size=(N - 1, k, k)) * 0.3
    b = rng.normal(size=(N, k))
    Dj, Uj, bj = jnp.array(D), jnp.array(U), jnp.array(b)
    x = np.asarray(ba.block_tridiag_solve(Dj, Uj, bj))
    H = np.asarray(ba.dense_from_blocks(Dj, Uj))
    x_dense = np.linalg.solve(H, b.reshape(-1)).reshape(N, k)
    np.testing.assert_allclose(x, x_dense, rtol=1e-8, atol=1e-10)


def test_masked_median():
    x = jnp.array([[1.0, 2.0], [3.0, 4.0], [100.0, 200.0]])
    valid = jnp.array([1.0, 1.0, 0.0])
    m = float(ba._masked_median(x, valid))
    assert m == 2.5


def test_robust_weights_alpha2_uniform():
    """At sched_iter=0 (alpha=2) weights should be conf-proportional."""
    r = jnp.array([[1.0, 2.0], [5.0, 1.0], [0.5, 0.1]])
    conf = jnp.array([0.9, 0.8, 1.0])
    w = np.asarray(ba.robust_weights(r, conf, jnp.ones(3), jnp.asarray(0)))
    np.testing.assert_allclose(w, np.asarray(conf), atol=1e-12)


def test_robust_weights_downweight_outliers():
    """At alpha=1 large residuals get smaller weights."""
    r = jnp.array([[1.0, 1.0], [1.0, 1.0], [50.0, 50.0]])
    conf = jnp.ones(3)
    w = np.asarray(ba.robust_weights(r, conf, jnp.ones(3), jnp.asarray(10)))
    assert w[2] < 0.5 * w[0]


def _make_problem(rng, noise_px=0.0, n_knots=6, obs_per_knot=8,
                  gap=200.0):
    """Synthetic BA problem along a real simulated orbit with visible
    landmarks placed near each knot's nadir point."""
    duration = int(gap * (n_knots - 1))
    traj = orbits.generate_trajectory(jax.random.PRNGKey(7),
                                      duration_s=duration)
    t_idx = (np.arange(n_knots) * gap).astype(int)
    pos = np.asarray(traj.pos_eci)[t_idx]
    q = np.asarray(traj.quat_nadir_eci)[t_idx]
    vel = np.asarray(traj.vel_eci)[t_idx]
    states_gt = jnp.array(np.concatenate([pos, q, vel], axis=1))

    # landmarks: ground points near each knot's sub-satellite point
    lms, ii = [], []
    for k in range(n_knots):
        ground = pos[k] * (6378.0 / np.linalg.norm(pos[k]))
        for _ in range(obs_per_knot):
            lms.append(ground + rng.normal(size=3) * 30.0)
            ii.append(k)
    lm_xyz = jnp.array(np.stack(lms))
    ii = jnp.array(np.array(ii, dtype=np.int32))
    uv_true = factors.project_landmarks(states_gt, lm_xyz, ii, INTR)
    uv_meas = uv_true + noise_px * jnp.array(
        rng.normal(size=uv_true.shape)
    )
    M = lm_xyz.shape[0]
    gaps = jnp.array([gap] * (n_knots - 1) + [0.0])
    # cumulative IMU rotations over each gap from the GT attitude sequence
    omega_full = quat.omega_from_sequence(traj.quat_nadir_eci, 1.0)
    cum_rot = factors.cumulative_rotations(omega_full, 1.0, jnp.array(t_idx))
    prob = ba.BAProblem(
        gaps=gaps,
        cum_rot=cum_rot,
        landmarks_xyz=lm_xyz,
        landmarks_uv=uv_meas,
        conf=jnp.ones(M) * 0.95,
        ii=ii,
        obs_valid=jnp.ones(M),
        knot_valid=jnp.ones(n_knots),
        pair_valid=jnp.ones(n_knots - 1),
        intrinsics=INTR,
    )
    return states_gt, prob


def test_ba_iteration_stays_at_gt_with_zero_noise(rng):
    """noise=0 ⇒ residuals ~0 at GT ⇒ the LM step keeps states at GT
    (the reference's noise_level=0 invariant, od_pipe.py:342-343,412)."""
    states_gt, prob = _make_problem(rng, noise_px=0.0)
    step = ba.ba_iteration(jnp.asarray(0), states_gt, prob, 1e-4)
    dp = np.abs(np.asarray(step.states[:, :3] - states_gt[:, :3])).max()
    assert dp < 2e-3, f"position drifted {dp} km from GT"
    assert float(step.mean_residual) < 1.0


def test_ba_converges_from_perturbed_init(rng):
    """Perturbed init (10 km / 0.02 rad / 1% vel) converges back to GT."""
    states_gt, prob = _make_problem(rng, noise_px=1.0)
    n = states_gt.shape[0]
    pos0 = states_gt[:, :3] + jnp.array(rng.normal(size=(n, 3)) * 10.0)
    phi = jnp.array(rng.normal(size=(n, 3)) * 0.02)
    q0 = quat.box_plus(states_gt[:, 3:7], phi)
    vel0 = states_gt[:, 7:] * (1 + jnp.array(rng.normal(size=(n, 3)) * 0.01))
    states = jnp.concatenate([pos0, q0, vel0], axis=-1)

    err0 = np.linalg.norm(np.asarray(states[:, :3] - states_gt[:, :3]),
                          axis=-1).mean()
    lam = jnp.asarray(1e-4)
    for it in range(15):
        step = ba.ba_iteration(jnp.asarray(it), states, prob, lam,
                               initialize=(it < 5))
        states, lam = step.states, step.lamda_init
    err = np.linalg.norm(np.asarray(states[:, :3] - states_gt[:, :3]),
                         axis=-1).mean()
    assert err < 0.15 * err0, f"err {err} km vs initial {err0} km"
    assert err < 1.0, f"final mean position error {err} km"


def test_ba_padding_invariance(rng):
    """Padded problem (extra knots + obs with valid=0) gives the same update
    on the real knots."""
    states_gt, prob = _make_problem(rng, noise_px=1.0, n_knots=4)
    n = states_gt.shape[0]
    states = states_gt.at[:, :3].add(jnp.array(rng.normal(size=(n, 3)) * 5.0))

    step_ref = ba.ba_iteration(jnp.asarray(3), states, prob, 1e-4)

    # pad to 6 knots / +16 obs
    n_pad, extra_m = 6, 16
    M = prob.landmarks_uv.shape[0]
    st_p = jnp.concatenate(
        [states, jnp.tile(jnp.array([0.0, 0, 0, 0, 0, 0, 1.0, 0, 0, 0]), (2, 1))]
    )
    prob_p = ba.BAProblem(
        gaps=jnp.concatenate([prob.gaps, jnp.zeros(2)]),
        cum_rot=jnp.concatenate(
            [prob.cum_rot, jnp.zeros((2, 4)).at[:, 3].set(1.0)]
        ),
        landmarks_xyz=jnp.concatenate([prob.landmarks_xyz, jnp.zeros((extra_m, 3))]),
        landmarks_uv=jnp.concatenate([prob.landmarks_uv, jnp.zeros((extra_m, 2))]),
        conf=jnp.concatenate([prob.conf, jnp.zeros(extra_m)]),
        ii=jnp.concatenate([prob.ii, jnp.zeros(extra_m, dtype=jnp.int32)]),
        obs_valid=jnp.concatenate([prob.obs_valid, jnp.zeros(extra_m)]),
        knot_valid=jnp.concatenate([prob.knot_valid, jnp.zeros(2)]),
        pair_valid=jnp.concatenate([prob.pair_valid, jnp.zeros(2)]),
        intrinsics=prob.intrinsics,
    )
    step_pad = ba.ba_iteration(jnp.asarray(3), st_p, prob_p, 1e-4)
    np.testing.assert_allclose(
        np.asarray(step_pad.states[:n]), np.asarray(step_ref.states),
        rtol=1e-7, atol=1e-9,
    )


def test_ba_initialize_mode_vision_only(rng):
    """initialize=True must ignore dynamics: perturbing velocities hugely
    changes nothing in the update."""
    states_gt, prob = _make_problem(rng, noise_px=0.5, n_knots=4)
    states = states_gt.at[:, :3].add(1.0)
    s1 = ba.ba_iteration(jnp.asarray(0), states, prob, 1e-4, initialize=True)
    states_badvel = states.at[:, 7:].multiply(50.0)
    s2 = ba.ba_iteration(jnp.asarray(0), states_badvel, prob, 1e-4,
                         initialize=True)
    np.testing.assert_allclose(
        np.asarray(s1.states[:, :7]), np.asarray(s2.states[:, :7]),
        rtol=1e-9, atol=1e-9,
    )


def test_chunked_tridiag_matches_sequential(rng):
    for N, C in [(32, 4), (64, 8), (96, 4)]:
        k = 9
        D = rng.normal(size=(N, k, k))
        D = D @ D.transpose(0, 2, 1) + 10 * np.eye(k)
        U = rng.normal(size=(N - 1, k, k)) * 0.3
        b = rng.normal(size=(N, k))
        Dj, Uj, bj = jnp.array(D), jnp.array(U), jnp.array(b)
        x_seq = np.asarray(ba.block_tridiag_solve(Dj, Uj, bj))
        x_chn = np.asarray(ba.block_tridiag_solve_chunked(Dj, Uj, bj, C))
        np.testing.assert_allclose(x_chn, x_seq, rtol=1e-7, atol=1e-9)


def test_auto_chunks():
    assert ba._auto_chunks(64) == 1
    assert ba._auto_chunks(128) == 8
    assert ba._auto_chunks(256) == 16
    assert ba._auto_chunks(2560) == 32
    # sequential depth m + 2C stays near-minimal and N divisible
    for n in (128, 256, 512, 2560):
        c = ba._auto_chunks(n)
        assert n % c == 0 and c * c <= n
    # odd sizes fall back to few chunks without breaking divisibility
    assert ba._auto_chunks(130) == 2


def test_bcr_matches_thomas(rng):
    """Block cyclic reduction is exact vs the Thomas scan (any N, padded
    internally to a power of two)."""
    import jax.numpy as jnp

    from vinsat_tpu.estimation import ba

    for N in (5, 16, 37, 129):
        k = 9
        A = rng.normal(size=(N, k, k))
        D = np.einsum("nij,nkj->nik", A, A) + 8 * np.eye(k)
        U = rng.normal(size=(N - 1, k, k)) * 0.4
        b = rng.normal(size=(N, k))
        x_ref = np.asarray(ba.block_tridiag_solve(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(b)))
        x_bcr = np.asarray(ba.block_tridiag_solve_bcr(
            jnp.asarray(D), jnp.asarray(U), jnp.asarray(b)))
        np.testing.assert_allclose(x_bcr, x_ref, rtol=1e-10, atol=1e-12)


def test_tridiag_variant_dispatch(rng):
    """Every SolverParams.tridiag_variant solves the same system to machine
    precision (the knob only selects the algorithm, never the answer), and
    an unknown variant raises."""
    import jax.numpy as jnp
    import pytest

    from vinsat_tpu.estimation import ba

    N, k = 100, 9
    A = rng.normal(size=(N, k, k))
    D = jnp.asarray(np.einsum("nij,nkj->nik", A, A) + 8 * np.eye(k))
    U = jnp.asarray(rng.normal(size=(N - 1, k, k)) * 0.3)
    b = jnp.asarray(rng.normal(size=(N, k)))
    ref = np.asarray(ba.jacobi_scaled_tridiag_solve(D, U, b,
                                                    variant="thomas"))
    for v in ("auto", "chunked", "chunked_bcr", "bcr1", "bcr16"):
        x = np.asarray(ba.jacobi_scaled_tridiag_solve(D, U, b, variant=v))
        np.testing.assert_allclose(x, ref, rtol=1e-9, atol=1e-11)
    with pytest.raises(ValueError, match="unknown tridiag variant"):
        ba.jacobi_scaled_tridiag_solve(D, U, b, variant="qr")


def test_bcr_f32_with_jacobi_scaling(rng):
    """BCR stays accurate in f32 on realistically ill-scaled normal-equation
    blocks once Jacobi-scaled (the TPU production configuration)."""
    import jax.numpy as jnp

    from vinsat_tpu.estimation import ba

    N, k = 128, 9
    # blocks spanning ~1e10 in magnitude like sigma-weighted dynamics terms
    scales = 10.0 ** rng.uniform(0, 5, (N, k))
    A = rng.normal(size=(N, k, k))
    D = np.einsum("nij,nkj->nik", A, A) + 5 * np.eye(k)
    D = D * scales[:, :, None] * scales[:, None, :]
    U = rng.normal(size=(N - 1, k, k)) * 0.2
    U = U * scales[:-1, :, None] * scales[1:, None, :] * 0.01
    b = rng.normal(size=(N, k)) * scales
    x64 = np.asarray(ba.jacobi_scaled_tridiag_solve(
        jnp.asarray(D), jnp.asarray(U), jnp.asarray(b)))
    x32 = np.asarray(ba.jacobi_scaled_tridiag_solve(
        jnp.asarray(D, jnp.float32), jnp.asarray(U, jnp.float32),
        jnp.asarray(b, jnp.float32)))
    rel = np.abs(x32 - x64) / np.maximum(np.abs(x64), 1e-12)
    assert np.median(rel) < 1e-3, f"median rel err {np.median(rel)}"


def test_gj_solve_small(rng):
    """Unrolled Gauss-Jordan matches linalg.solve: SPD without pivoting,
    general matrices with partial pivoting, any leading batch shape."""
    import jax.numpy as jnp

    from vinsat_tpu.estimation import ba

    A = rng.normal(size=(17, 9, 9))
    S = np.einsum("nij,nkj->nik", A, A) + 5 * np.eye(9)
    B = rng.normal(size=(17, 9, 4))
    np.testing.assert_allclose(
        np.asarray(ba.gj_solve_small(jnp.asarray(S), jnp.asarray(B))),
        np.linalg.solve(S, B), rtol=1e-9, atol=1e-11)
    G = rng.normal(size=(6, 18, 18))  # general, needs pivoting
    Bg = rng.normal(size=(6, 18, 2))
    np.testing.assert_allclose(
        np.asarray(ba.gj_solve_small(jnp.asarray(G), jnp.asarray(Bg),
                                     pivot=True)),
        np.linalg.solve(G, Bg), rtol=1e-8, atol=1e-10)
    # unbatched
    np.testing.assert_allclose(
        np.asarray(ba.gj_solve_small(jnp.asarray(S[0]), jnp.asarray(B[0]))),
        np.linalg.solve(S[0], B[0]), rtol=1e-9, atol=1e-11)


def test_batched_lambda_matches_sequential(rng):
    """batched_lambda=K selects the same λ and (to fp tolerance) the same
    states as the sequential while_loop, across iterations that both accept
    immediately and iterations that escalate λ."""
    states_gt, prob = _make_problem(rng, noise_px=1.0)
    n = states_gt.shape[0]
    pos0 = states_gt[:, :3] + jnp.array(rng.normal(size=(n, 3)) * 10.0)
    q0 = quat.box_plus(states_gt[:, 3:7],
                       jnp.array(rng.normal(size=(n, 3)) * 0.02))
    vel0 = states_gt[:, 7:] * (1 + jnp.array(rng.normal(size=(n, 3)) * 0.01))
    states_s = jnp.concatenate([pos0, q0, vel0], axis=-1)
    states_b = states_s

    p_seq = ba.SolverParams()
    p_bat = ba.SolverParams(batched_lambda=9)
    lam_s = lam_b = jnp.asarray(1e-4)
    for it in range(8):
        st_s = ba.ba_iteration(jnp.asarray(it), states_s, prob, lam_s,
                               params=p_seq)
        st_b = ba.ba_iteration(jnp.asarray(it), states_b, prob, lam_b,
                               params=p_bat)
        # identical λ bookkeeping (the search must pick the same candidate)
        np.testing.assert_allclose(float(st_s.lamda_init),
                                   float(st_b.lamda_init), rtol=1e-12)
        np.testing.assert_allclose(np.asarray(st_s.states),
                                   np.asarray(st_b.states),
                                   rtol=1e-6, atol=1e-8)
        states_s, lam_s = st_s.states, st_s.lamda_init
        states_b, lam_b = st_b.states, st_b.lamda_init


def test_batched_lambda_escalates(rng):
    """A deliberately bad linearization (huge λ_init would accept at once;
    tiny λ with an overshooting step must escalate): both searches walk the
    same λ ladder and land on the same rung."""
    states_gt, prob = _make_problem(rng, noise_px=30.0, n_knots=5)
    n = states_gt.shape[0]
    # large perturbation makes the first GN trial overshoot at small λ
    pos0 = states_gt[:, :3] + jnp.array(rng.normal(size=(n, 3)) * 300.0)
    q0 = quat.box_plus(states_gt[:, 3:7],
                       jnp.array(rng.normal(size=(n, 3)) * 0.3))
    vel0 = states_gt[:, 7:] * (1 + jnp.array(rng.normal(size=(n, 3)) * 0.2))
    states = jnp.concatenate([pos0, q0, vel0], axis=-1)

    st_s = ba.ba_iteration(jnp.asarray(3), states, prob, jnp.asarray(1e-4),
                           params=ba.SolverParams())
    st_b = ba.ba_iteration(jnp.asarray(3), states, prob, jnp.asarray(1e-4),
                           params=ba.SolverParams(batched_lambda=9))
    np.testing.assert_allclose(float(st_s.lamda_init),
                               float(st_b.lamda_init), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(st_s.states),
                               np.asarray(st_b.states), rtol=1e-6, atol=1e-8)
