"""Covariance calibration via NEES tracking (evalx/calibration.py)."""
import numpy as np
import pytest

from vinsat_tpu.evalx import calibration


def _random_spd(rng, k=9, scale=1.0):
    A = rng.normal(size=(k, k))
    return (A @ A.T + k * np.eye(k)) * scale


def _sample_triples(rng, n, inflate=(1.0, 1.0, 1.0)):
    """Draw (info, est, gt) triples where the TRUE error covariance is the
    reported one inflated blockwise by `inflate` (1 = consistent)."""
    s = np.concatenate([np.full(3, np.sqrt(c)) for c in inflate])
    infos, ests, gts = [], [], []
    for _ in range(n):
        H = _random_spd(rng, scale=100.0)
        cov = np.linalg.inv(H)
        cov_true = cov * s[:, None] * s[None, :]
        e = rng.multivariate_normal(np.zeros(9), cov_true)
        gt = np.zeros(10)
        gt[3:7] = [0, 0, 0, 1]
        gt[:3] = rng.normal(size=3) * 10
        est = gt.copy()
        est[:3] += e[:3]
        # retraction consistent with the solver: est = gt boxplus dphi
        from vinsat_tpu.core import quat
        import jax.numpy as jnp

        est[3:7] = np.asarray(quat.box_plus(jnp.asarray(gt[3:7]),
                                            jnp.asarray(e[3:6])))
        est[7:10] += e[6:9]
        infos.append(H)
        ests.append(est)
        gts.append(gt)
    return infos, ests, gts


def test_nees_consistent_estimator():
    """When errors are drawn from the reported covariance, mean NEES = dof
    and the calibrated inflation is ~1."""
    rng = np.random.default_rng(0)
    infos, ests, gts = _sample_triples(rng, 400)
    nees = [calibration.nees(e, g, H) for H, e, g in zip(infos, ests, gts)]
    assert abs(np.mean(nees) - 9.0) < 0.8, np.mean(nees)
    c = calibration.calibrate_inflation(infos, ests, gts)
    for name in ("pos", "rot", "vel"):
        assert 0.8 < c[name] < 1.25, (name, c[name])


def test_calibration_recovers_overconfidence():
    """10x/4x overconfident pos/vel blocks are detected and corrected:
    after apply_inflation the block NEES is consistent again."""
    rng = np.random.default_rng(1)
    true_c = (10.0, 1.0, 4.0)
    infos, ests, gts = _sample_triples(rng, 400, inflate=true_c)
    c = calibration.calibrate_inflation(infos, ests, gts)
    assert 7.0 < c["pos"] < 13.0, c
    assert 0.7 < c["rot"] < 1.4, c
    assert 2.8 < c["vel"] < 5.5, c
    # applying the inflation restores consistency
    infos2 = [calibration.apply_inflation(H, c) for H in infos]
    c2 = calibration.calibrate_inflation(infos2, ests, gts)
    for name in ("pos", "rot", "vel"):
        assert 0.7 < c2[name] < 1.4, (name, c2)


def test_floors_from_inflation():
    """Additive floors match the multiplicative calibration at the typical
    covariance scale, and never go negative."""
    rng = np.random.default_rng(2)
    infos, ests, gts = _sample_triples(rng, 100, inflate=(9.0, 1.0, 1.0))
    c = calibration.calibrate_inflation(infos, ests, gts)
    f_pos, f_rot, f_vel = calibration.floors_from_inflation(infos, c)
    # floor^2 ~ (c-1) * typical var; typical var = mean diag of inv(H)
    typ = np.median([np.mean(np.diag(np.linalg.inv(H))[:3]) for H in infos])
    assert f_pos == pytest.approx(np.sqrt((c["pos"] - 1) * typ), rel=0.3)
    assert f_rot == 0.0  # consistent block -> no floor
    assert f_vel >= 0.0


def test_stream_orbit_nees_tracking():
    """track_nees=True returns per-window (info, est, gt) triples; the raw
    CRLB marginal is overconfident in position (the measured 10-30x gap
    that motivates the prior floors, docs/BENCHMARKS.md)."""
    from vinsat_tpu import pipeline
    from vinsat_tpu.estimation.window import StreamingConfig, stream_orbit

    seq = pipeline.simulate_sequence(1, duration_s=1200, frame_stride=10,
                                     along_track=True)
    rows = seq.det_rows
    keep = (rows[:, 0] < 400) | (rows[:, 0] > 700)
    res = stream_orbit(rows[keep], seq.orbit_pos_eci_km, seed=3,
                       cfg=StreamingConfig(track_nees=True))
    assert res.window_infos is not None and len(res.window_infos) >= 2
    assert res.window_est.shape == res.window_gt.shape
    c = calibration.calibrate_inflation(res.window_infos, res.window_est,
                                        res.window_gt)
    for name in ("pos", "rot", "vel"):
        assert np.isfinite(c[name]) and c[name] > 0
    # the CRLB marginal is overconfident in VELOCITY on real streams
    # (dynamics over-constrain it; the realized error is bias-dominated) —
    # this is precisely what motivates prior_vel_floor (measured c_vel ~ 9x
    # on this arc with central-difference GT velocity; pos/rot within ~2x)
    assert c["vel"] > 2.0, c
    f_pos, f_rot, f_vel = calibration.floors_from_inflation(
        res.window_infos, c)
    assert f_vel > 0.0


def test_auto_calibrated_anchor_prior():
    """auto_calibrate=True (bounded mode): once enough NEES windows exist,
    the anchor prior switches from static floors to the measured inflation
    factors.  The mechanism must engage (anchor informations differ from
    the static-floor run after min_windows) and keep the stream in the
    same accuracy class."""
    from vinsat_tpu import pipeline
    from vinsat_tpu.estimation.window import StreamingConfig, stream_orbit

    seq = pipeline.simulate_sequence(1, duration_s=3600, along_track=True,
                                     frame_stride=10, pass_every_s=900,
                                     pass_len_s=300)
    rows = seq.det_rows
    base = StreamingConfig(marginalize=True, track_nees=True)
    static = stream_orbit(rows, seq.orbit_pos_eci_km, seed=1, cfg=base)
    auto = stream_orbit(
        rows, seq.orbit_pos_eci_km, seed=1,
        cfg=base._replace(auto_calibrate=True, auto_calibrate_min_windows=2))
    assert static.window_infos is not None and len(static.window_infos) >= 3
    assert len(auto.window_infos) == len(static.window_infos)
    # calibration engaged: some post-min_windows anchor marginal differs
    assert not np.allclose(auto.window_infos[2:], static.window_infos[2:])
    # and the stream stays healthy
    assert np.isfinite(auto.errors).all()
    assert auto.errors[-1] < max(3.0 * static.errors[-1], 2.0), (
        auto.errors[-1], static.errors[-1])
