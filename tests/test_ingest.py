import numpy as np

from vinsat_tpu.estimation import ingest


def rows_from(frames, conf=0.95):
    m = len(frames)
    out = np.zeros((m, 6))
    out[:, 0] = frames
    out[:, 1] = -122.0
    out[:, 2] = 37.0
    out[:, 3] = 2000.0
    out[:, 4] = 1000.0
    out[:, 5] = conf
    return out


def test_build_graph_filler_knots():
    """Knots at detection times + fillers every 1000 s + tail fillers
    (read_detections, od_pipe.py:214-247)."""
    frames = [1205, 1205, 1210, 3405, 3410]
    g = ingest.build_graph(rows_from(frames), orbit_len=10800, use_native=False)
    # fillers: 2000, 3000 between 1210 and 3405; tail 4000..10000
    want_times = [1205, 1210, 2000, 3000, 3405, 3410,
                  4000, 5000, 6000, 7000, 8000, 9000, 10000]
    assert list(g.time_idx) == want_times
    # ii: obs 0,1 -> knot 0; obs 2 -> knot 1; obs 3 -> knot 4; obs 4 -> knot 5
    assert list(g.ii) == [0, 0, 1, 4, 5]


def test_build_graph_empty_rows():
    """Zero detections -> zero knots, zero obs — both paths must agree with
    vt_build_graph's m==0 contract (regression: the numpy fallback crashed
    on det_times.min() of an empty array)."""
    for use_native in (False, True):
        g = ingest.build_graph(np.zeros((0, 6)), orbit_len=10800,
                               use_native=use_native)
        assert len(g.ii) == 0
        assert len(g.time_idx) == 0


def test_build_graph_detection_on_stride():
    """A detection exactly at a stride multiple consumes the filler slot."""
    g = ingest.build_graph(rows_from([500, 2000, 2100]), orbit_len=3500)
    assert list(g.time_idx) == [500, 1000, 2000, 2100, 3000]
    assert list(g.ii) == [0, 2, 3]


def test_split_windows_gap_rule():
    """Split at obs-gap > 200 s after > 4 contiguous (<100 s) gaps
    (identify_next_batch_new, od_pipe.py:898-905)."""
    # knots: 6 close-together detections then a big gap, then more
    time_idx = np.array([0, 10, 20, 30, 40, 50, 500, 510, 520, 530, 540, 550])
    ii = np.arange(12)
    wins = ingest.split_windows(ii, time_idx)
    assert wins[0] == (6, 6, False)
    assert wins[-1][2] is True
    assert wins[-1][0] == 12


def test_split_windows_no_split_when_sparse():
    time_idx = np.array([0, 300, 600, 900])  # all gaps > 200 but no 5 contiguous
    ii = np.arange(4)
    wins = ingest.split_windows(ii, time_idx)
    assert wins == [(4, 4, True)]


def test_gate_and_compact():
    frames = [100, 100, 100, 2500]
    g = ingest.build_graph(rows_from(frames), orbit_len=3000, use_native=False)
    # fabricate GT with landmarks + projections
    N = len(g.time_idx)
    gt = ingest.GroundTruth(
        pos_eci=np.zeros((N, 3)), vel_eci=np.zeros((N, 3)),
        quat_eci=np.tile([0, 0, 0, 1.0], (N, 1)),
        pos_eci_full=np.zeros((3000, 3)),
        quat_eci_full=np.tile([0, 0, 0, 1.0], (3000, 1)),
        omega_full=np.zeros((3000, 3)),
        landmarks_xyz=np.zeros((4, 3)),
        states=np.concatenate(
            [np.zeros((N, 3)), np.tile([0, 0, 0, 1.0], (N, 1)),
             np.zeros((N, 3))], axis=1),
    )
    # obs 1 reprojects 1500 px away -> dropped; others pass
    uv_proj = np.tile([2000.0, 1000.0], (4, 1))
    uv_proj[1] = [3500.0, 1000.0]
    g2, gt2, mask = ingest.gate_and_compact(g, gt, uv_proj)
    assert mask.tolist() == [True, False, True, True]
    assert len(g2.ii) == 3
    # knot 0 (t=100) keeps obs; knots at 1000/2000 are stride knots; knot
    # with t=2500 keeps its obs
    assert list(g2.time_idx) == list(g.time_idx)  # no knot dropped here
    assert list(g2.ii) == [0, 0, 3]


def test_gate_drops_knot_without_obs():
    frames = [150, 2500]
    g = ingest.build_graph(rows_from(frames), orbit_len=3000, use_native=False)
    assert list(g.time_idx) == [150, 1000, 2000, 2500, 3000]
    N = len(g.time_idx)
    gt = ingest.GroundTruth(
        pos_eci=np.zeros((N, 3)), vel_eci=np.zeros((N, 3)),
        quat_eci=np.tile([0, 0, 0, 1.0], (N, 1)),
        pos_eci_full=np.zeros((3000, 3)),
        quat_eci_full=np.tile([0, 0, 0, 1.0], (3000, 1)),
        omega_full=np.zeros((3000, 3)),
        landmarks_xyz=np.zeros((2, 3)),
        states=np.concatenate(
            [np.zeros((N, 3)), np.tile([0, 0, 0, 1.0], (N, 1)),
             np.zeros((N, 3))], axis=1),
    )
    uv_proj = np.tile([2000.0, 1000.0], (2, 1))
    uv_proj[0] = [9000.0, 1000.0]  # drop obs at t=150 -> knot 150 dropped
    g2, _, _ = ingest.gate_and_compact(g, gt, uv_proj)
    assert list(g2.time_idx) == [1000, 2000, 2500, 3000]
    assert list(g2.ii) == [2]


def test_noise_level_dial():
    """noise_level=0 measurements equal GT reprojections (od_pipe.py:941)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vinsat_tpu import pipeline
    from vinsat_tpu.estimation.window import StreamingConfig

    seq = pipeline.simulate_sequence(1, duration_s=600, frame_stride=10,
                                     along_track=True, noise_px=8.0)
    res_noisy = pipeline.run_streaming(seq, seed=1)
    res_clean = pipeline.run_streaming(
        seq, seed=1, cfg=StreamingConfig(noise_level=0.0))
    # perfect measurements converge at least as well (usually much better)
    assert res_clean.errors.min() <= res_noisy.errors.min() * 1.5
    assert res_clean.errors.min() < 1.0


def test_add_proxy_landmarks():
    import numpy as np

    frames = [100, 100, 500, 500, 500, 500, 500]
    g = ingest.build_graph(rows_from(frames), orbit_len=1000, use_native=False)
    N = len(g.time_idx)
    gt = ingest.GroundTruth(
        pos_eci=np.tile([6900.0, 0, 0], (N, 1)),
        vel_eci=np.zeros((N, 3)),
        quat_eci=np.tile([0, 0, 0, 1.0], (N, 1)),
        pos_eci_full=np.zeros((1000, 3)),
        quat_eci_full=np.tile([0, 0, 0, 1.0], (1000, 1)),
        omega_full=np.zeros((1000, 3)),
        landmarks_xyz=np.tile([6378.0, 0, 0], (len(frames), 1)),
        states=np.concatenate(
            [np.tile([6900.0, 0, 0], (N, 1)), np.tile([0, 0, 0, 1.0], (N, 1)),
             np.zeros((N, 3))], axis=1),
    )
    intr = np.array([3547.85, 3547.85, 2304.0, 1296.0])
    g2, gt2 = ingest.add_proxy_landmarks(g, gt, intr, num_proxies=8,
                                         min_obs=4)
    # knot 0 had 2 obs (<=4): gets 8 proxies; knot with 5 obs unchanged
    added = len(g2.ii) - len(g.ii)
    assert added == 8
    assert (g2.conf[-8:] == 0.75).all()
    assert gt2.landmarks_xyz.shape[0] == len(frames) + 8


def test_load_reference_orbit_format():
    """Read the reference's in-repo GT orbit sample when present
    (estimation/landmarks/camera_ready/orbit_3hr_skip_fl.txt)."""
    import os

    import pytest

    path = ("/root/reference/estimation/landmarks/camera_ready/"
            "orbit_3hr_skip_fl.txt")
    if not os.path.exists(path):
        pytest.skip("reference data not mounted")
    pos_eci = ingest.load_reference_orbit(path)
    assert pos_eci.shape[1] == 3
    r = np.linalg.norm(pos_eci, axis=1)
    # LEO radii in km after the m->km + ECEF->ECI conversion
    assert 6500 < r.min() and r.max() < 7300
