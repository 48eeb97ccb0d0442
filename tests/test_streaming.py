"""End-to-end streaming OD tests (the minimum-slice capability check)."""
import numpy as np
import pytest

from vinsat_tpu import pipeline
from vinsat_tpu.evalx import ate


@pytest.fixture(scope="module")
def short_seq():
    # along-track landmarks guarantee detections for any seed
    return pipeline.simulate_sequence(1, duration_s=1200, frame_stride=10,
                                      along_track=True)


def test_simulated_sequence_contract(short_seq):
    rows = short_seq.det_rows
    assert rows.shape[1] == 6
    assert len(rows) > 50
    # frames ascending-ish, uv in image, conf in (0.8, 1]
    assert rows[:, 0].min() >= 0
    assert (rows[:, 3] >= 0).all() and (rows[:, 3] < 4608).all()
    assert (rows[:, 4] >= 0).all() and (rows[:, 4] < 2592).all()
    assert (rows[:, 5] > 0.8).all()


def test_streaming_converges_under_5km(short_seq):
    """From 100 km initial noise, streaming OD reaches < 5 km
    (the headline capability, errors_eval.py:26-28)."""
    res = pipeline.run_streaming(short_seq, seed=1)
    assert len(res.errors) > 0
    t5 = ate.time_to_threshold(res.errors, res.times, 5.0)
    assert t5 is not None, f"never reached 5 km: {res.errors}"
    # final solved error well under the threshold
    assert res.errors.min() < 2.0


def test_streaming_deterministic(short_seq):
    r1 = pipeline.run_streaming(short_seq, seed=3)
    r2 = pipeline.run_streaming(short_seq, seed=3)
    np.testing.assert_allclose(r1.errors, r2.errors, rtol=1e-10)


def test_ate_summary():
    errors = [np.array([50.0, 8.0, 3.0, 1.5]), np.array([30.0, 10.0])]
    times = [np.array([0, 100, 200, 300]), np.array([0, 100])]
    s = ate.summarize(errors, times)
    assert s["frac_reaching_5km"] == 0.5
    assert s["median_time_to_5km"] == 200.0
    assert s["frac_reaching_1km"] == 0.0


def test_full_batch_converges(short_seq):
    states, knot_t, gt_states = pipeline.run_full_batch(
        short_seq, seed=1, num_iters=25, init_iters=10
    )
    err = np.linalg.norm(states[:, :3] - gt_states[:, :3], axis=-1)
    # knots inside the detection span should be accurately recovered
    assert np.median(err) < 5.0, f"median err {np.median(err)} km"
