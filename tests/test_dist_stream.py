"""Distributed solver parity: the sharded window solver and streaming
driver against the single-chip path (VERDICT r2 items 3-4).

The bit-pins at sched_iter=0 (alpha=2 cancels the robust scale) extend the
single-iteration pin of test_sharded_ba to the BA_reg prior path; the
end-to-end test runs a REAL simulated sequence through both streaming
drivers and requires final-error agreement — not just the 5 km target.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from vinsat_tpu import pipeline
from vinsat_tpu.dist import mesh as mesh_mod
from vinsat_tpu.dist import sharded_ba, stream as dist_stream
from vinsat_tpu.estimation import ba, window
from tests.test_sharded_ba import INTR, _build_problem


def _sharded_problem_of(st, gaps, cum, lm, uv, conf, n_knots, D):
    pv = np.ones((1, n_knots))
    pv[:, -1] = 0.0
    return sharded_ba.ShardedProblem(
        states=st[None], gaps=gaps[None], cum_rot=cum[None],
        lm_xyz=jnp.array(lm)[None], uv=uv.reshape(n_knots, D, 2)[None],
        conf=conf.reshape(n_knots, D)[None],
        obs_valid=jnp.ones((1, n_knots, D)), pair_valid=jnp.array(pv),
        intrinsics=INTR,
    )


def _rand_prior(rng, st, n_knots):
    """A well-conditioned per-knot prior centered near the current states."""
    ps = np.asarray(st).copy()
    ps[:, :3] += rng.normal(size=(n_knots, 3)) * 2.0
    Hs = np.zeros((n_knots, 6, 6))
    Hr = np.zeros((n_knots, 3, 3))
    for k in range(n_knots):
        A = rng.normal(size=(6, 6)) * 0.1
        Hs[k] = A @ A.T + np.eye(6) * 0.5
        B = rng.normal(size=(3, 3)) * 0.1
        Hr[k] = B @ B.T + np.eye(3) * 0.5
    val = np.ones(n_knots)
    return ps, Hs, Hr, val


def test_sharded_prior_step_matches_ba_reg(rng):
    """BA_reg parity at sched_iter=0: one sharded prior iteration ==
    ba.ba_reg_iteration bit-for-bit (the prior factor is block-diagonal, so
    sharding adds no roundoff beyond the SPIKE solve)."""
    n_knots, D = 16, 4
    st, gaps, cum, lm, uv, conf, ii, lm_flat = _build_problem(rng, n_knots, D)
    params = ba.SolverParams(num_hops=3, max_substep=100.0)
    ps, Hs, Hr, val = _rand_prior(rng, st, n_knots)

    prob = ba.BAProblem(
        gaps=gaps, cum_rot=cum, landmarks_xyz=lm_flat, landmarks_uv=uv,
        conf=conf, ii=ii, obs_valid=jnp.ones(n_knots * D),
        knot_valid=jnp.ones(n_knots), pair_valid=jnp.ones(n_knots - 1),
        intrinsics=INTR,
    )
    prior_ref = ba.PriorState(jnp.asarray(ps), jnp.asarray(Hs),
                              jnp.asarray(Hr), jnp.asarray(val))
    step_ref = ba.ba_reg_iteration(jnp.asarray(0), st, prob, prior_ref, 1e-4,
                                   params=params)

    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=4)
    sprob = _sharded_problem_of(st, gaps, cum, lm, uv, conf, n_knots, D)
    sprior = sharded_ba.ShardedPrior(
        prop_states=jnp.asarray(ps)[None], H_state=jnp.asarray(Hs)[None],
        H_rot=jnp.asarray(Hr)[None], valid=jnp.asarray(val)[None],
    )
    solve = sharded_ba.make_sharded_window_solver(
        mesh, params, num_iters=1, init_iters=0, with_prior=True)
    out, lam, res = solve(jnp.full((1,), 1e-4), sprob, sprior)
    got = np.asarray(out[0])
    want = np.asarray(step_ref.states)
    np.testing.assert_allclose(got[:, :3], want[:, :3], rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(got[:, 7:], want[:, 7:], rtol=1e-6, atol=1e-8)
    s = np.sign(np.sum(got[:, 3:7] * want[:, 3:7], axis=-1, keepdims=True))
    np.testing.assert_allclose(got[:, 3:7] * s, want[:, 3:7], atol=1e-8)


def test_sharded_window_solver_matches_solve_window(rng):
    """Multi-iteration window solve: the in-mesh LM chain (fixed-count AND
    run-to-max best-iterate) tracks window._solve_window.  Past sched_iter=0
    the robust scales differ by the bisection-median resolution, so the pin
    is a tight tolerance rather than bit-equality."""
    n_knots, D = 16, 4
    st, gaps, cum, lm, uv, conf, ii, lm_flat = _build_problem(rng, n_knots, D)

    for max_iters, num_iters in ((0, 6), (10, 6)):
        params = ba.SolverParams(num_hops=3, max_substep=100.0,
                                 max_iters=max_iters)
        prob = ba.BAProblem(
            gaps=gaps, cum_rot=cum, landmarks_xyz=lm_flat, landmarks_uv=uv,
            conf=conf, ii=ii, obs_valid=jnp.ones(n_knots * D),
            knot_valid=jnp.ones(n_knots), pair_valid=jnp.ones(n_knots - 1),
            intrinsics=INTR,
        )
        out_ref, lam_ref, _, res_ref = window._solve_window(
            st, prob, 1e-4, jnp.asarray(2), num_iters, params)

        mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=4)
        sprob = _sharded_problem_of(st, gaps, cum, lm, uv, conf, n_knots, D)
        solve = sharded_ba.make_sharded_window_solver(
            mesh, params, num_iters=num_iters, init_iters=2)
        out, lam, res = solve(jnp.full((1,), 1e-4), sprob)
        # measured: the 2^-30 bisection-median scale delta amplifies to
        # ~2 m through 6 nonlinear iterations — pin at 10 m
        d = np.linalg.norm(
            np.asarray(out[0])[:, :3] - np.asarray(out_ref)[:, :3], axis=-1)
        assert d.max() < 1e-2, (max_iters, d.max())
        # the residual METRIC embeds the robust scale, so it carries the
        # median-estimate delta directly (~1%) even with matching states
        np.testing.assert_allclose(float(res[0]), float(res_ref), rtol=3e-2)


def test_sharded_stream_matches_single_chip():
    """End-to-end: a real simulated sequence through the DISTRIBUTED
    streaming driver vs the single-chip stream — final errors must agree
    (f32-class tolerance on a f64 CPU mesh run), not merely beat 5 km."""
    seq = pipeline.simulate_sequence(3, duration_s=1800, frame_stride=10,
                                     along_track=True)
    cfg = window.StreamingConfig(max_iters=30)
    res_single = window.stream_orbit(seq.det_rows, seq.orbit_pos_eci_km,
                                     seed=3, cfg=cfg, fast=False)
    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=4)
    # shard_min_knots=0 forces EVERY window through the sharded solver (the
    # dispatch policy would keep these sub-256-knot windows on one device)
    res_shard = dist_stream.stream_orbit_sharded(
        seq.det_rows, seq.orbit_pos_eci_km, mesh, seed=3, cfg=cfg,
        shard_min_knots=0)

    assert len(res_shard.errors) == len(res_single.errors)
    np.testing.assert_array_equal(res_shard.times, res_single.times)
    e_s, e_d = res_single.errors[-1], res_shard.errors[-1]
    # identical prep + schedules; remaining deltas are the SPIKE solve vs
    # the auto single-chip variant and the bisection median robust scale
    assert abs(e_d - e_s) < max(0.05 * max(e_s, 1.0), 0.05), (e_s, e_d)
    # per-knot final states agree to sub-km
    d = np.linalg.norm(res_shard.final_states[:, :3]
                       - res_single.final_states[:, :3], axis=-1)
    assert np.median(d) < 0.1, np.median(d)


def test_sharded_stream_marginalized_converges():
    """Bounded-memory distributed streaming (anchor marginal prior sharded
    over the mesh) reaches the same accuracy class as the single-chip
    marginalized stream."""
    seq = pipeline.simulate_sequence(3, duration_s=1800, frame_stride=10,
                                     along_track=True)
    cfg = window.StreamingConfig(max_iters=30, marginalize=True)
    res_single = window.stream_orbit(seq.det_rows, seq.orbit_pos_eci_km,
                                     seed=3, cfg=cfg, fast=False)
    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=4)
    res_shard = dist_stream.stream_orbit_sharded(
        seq.det_rows, seq.orbit_pos_eci_km, mesh, seed=3, cfg=cfg,
        shard_min_knots=0)
    e_s, e_d = res_single.errors[-1], res_shard.errors[-1]
    assert e_d < 5.0, e_d
    assert abs(e_d - e_s) < max(0.25 * max(e_s, 1.0), 0.25), (e_s, e_d)


_REF_CSV_DIR = "/root/reference/sim/landmark_csvs"


@pytest.mark.skipif(not os.path.isdir(_REF_CSV_DIR),
                    reason="reference landmark CSVs not present")
def test_sharded_stream_real_db_parity():
    """Real-CSV landmark geometry through the DISTRIBUTED streaming driver
    (VERDICT r4 #8): the last never-exercised combination — real data x
    sharded path.  The clustered real-DB detection geometry is exactly
    what made window-0 inits marginal on the accelerator, so the parity
    requirement (final ATE match vs single-chip) runs on it directly."""
    from vinsat_tpu.sim import landmarks as lm_mod

    db = lm_mod.load_reference_db(_REF_CSV_DIR)
    seq = None
    for seed in (0, 1, 3, 4, 8):
        s = pipeline.simulate_sequence(seed, duration_s=3600,
                                       frame_stride=10, db=db)
        if len(s.det_rows) >= 40:
            seq, used_seed = s, seed
            break
    assert seq is not None, "no real-DB seed yielded detections"

    cfg = window.StreamingConfig(max_iters=30)
    res_single = window.stream_orbit(seq.det_rows, seq.orbit_pos_eci_km,
                                     seed=used_seed, cfg=cfg, fast=False)
    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=4)
    res_shard = dist_stream.stream_orbit_sharded(
        seq.det_rows, seq.orbit_pos_eci_km, mesh, seed=used_seed, cfg=cfg,
        shard_min_knots=0)

    assert len(res_shard.errors) == len(res_single.errors)
    np.testing.assert_array_equal(res_shard.times, res_single.times)
    e_s, e_d = res_single.errors[-1], res_shard.errors[-1]
    assert abs(e_d - e_s) < max(0.05 * max(e_s, 1.0), 0.05), (e_s, e_d)
    d = np.linalg.norm(res_shard.final_states[:, :3]
                       - res_single.final_states[:, :3], axis=-1)
    assert np.median(d) < 0.1, np.median(d)


def test_small_window_dispatch_policy():
    """Dispatch policy (VERDICT r3 next #4): with the measured default
    threshold, sub-256-knot windows solve on ONE device of the mesh — and
    the stream's result matches the force-sharded run (same solver code at
    nshards=1, so only SPIKE-vs-Thomas roundoff differs)."""
    seq = pipeline.simulate_sequence(3, duration_s=1800, frame_stride=10,
                                     along_track=True)
    cfg = window.StreamingConfig(max_iters=30)
    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=4)
    res_auto = dist_stream.stream_orbit_sharded(
        seq.det_rows, seq.orbit_pos_eci_km, mesh, seed=3, cfg=cfg)
    res_forced = dist_stream.stream_orbit_sharded(
        seq.det_rows, seq.orbit_pos_eci_km, mesh, seed=3, cfg=cfg,
        shard_min_knots=0)
    np.testing.assert_array_equal(res_auto.times, res_forced.times)
    d = np.linalg.norm(res_auto.final_states[:, :3]
                       - res_forced.final_states[:, :3], axis=-1)
    assert np.median(d) < 0.1, np.median(d)
    e_a, e_f = res_auto.errors[-1], res_forced.errors[-1]
    assert abs(e_a - e_f) < max(0.05 * max(e_f, 1.0), 0.05), (e_a, e_f)
