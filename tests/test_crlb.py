"""Terminal information bound (evalx/crlb.py): scaling + geometry sanity.

Annotates the reference's end metric (errors_eval.py:19-50) with a per-orbit
CRLB column; these tests pin the bound's defining properties rather than
absolute values (which depend on detection geometry).
"""
import numpy as np
import pytest

from vinsat_tpu import pipeline
from vinsat_tpu.evalx import crlb


@pytest.fixture(scope="module")
def seq():
    return pipeline.simulate_sequence(1, duration_s=1800, along_track=True,
                                      frame_stride=5)


def test_crlb_scales_with_pixel_noise(seq):
    a = crlb.terminal_crlb_km(seq.orbit_pos_eci_km, seq.det_rows,
                              noise_px=4.0)
    b = crlb.terminal_crlb_km(seq.orbit_pos_eci_km, seq.det_rows,
                              noise_px=8.0)
    assert np.isfinite(a["crlb_final_km"]) and a["crlb_final_km"] > 0
    assert a["n_obs"] > 50
    # Fisher information ~ 1/sigma^2 => bound linear in sigma
    np.testing.assert_allclose(b["crlb_final_km"],
                               2.0 * a["crlb_final_km"], rtol=1e-6)


def test_crlb_tail_amplification(seq):
    """Truncating the detections to the first third leaves an open-loop
    tail; the arc-end bound must exceed the last-knot bound (the dynamics
    amplify initial-condition uncertainty along-track)."""
    cut = seq.det_rows[seq.det_rows[:, 0] < 600]
    out = crlb.terminal_crlb_km(seq.orbit_pos_eci_km, cut)
    assert out["crlb_final_km"] > out["crlb_last_knot_km"]
    # and the truncated-information bound is worse than the full one
    full = crlb.terminal_crlb_km(seq.orbit_pos_eci_km, seq.det_rows)
    assert out["crlb_final_km"] > full["crlb_final_km"]


def test_crlb_no_observations(seq):
    out = crlb.terminal_crlb_km(seq.orbit_pos_eci_km, np.zeros((0, 6)))
    assert np.isnan(out["crlb_final_km"])
    assert out["n_obs"] == 0


def test_efficiency_column():
    assert crlb.efficiency(1.0, 2.0) == 0.5
    assert crlb.efficiency(3.0, 2.0) == 1.0  # clipped: estimator at limit
    assert np.isnan(crlb.efficiency(float("nan"), 2.0))
    assert np.isnan(crlb.efficiency(1.0, 0.0))


def test_crlb_attitude_marginal_dominates(seq):
    """The attitude-marginalized bound (unknown 3-dof initial attitude,
    the rigid-chain family) can only be LARGER than the known-attitude
    bound — marginalizing a nuisance parameter never adds information —
    and stays finite on observed sequences."""
    out = crlb.terminal_crlb_km(seq.orbit_pos_eci_km, seq.det_rows)
    assert np.isfinite(out["crlb_att_final_km"])
    assert out["crlb_att_final_km"] >= out["crlb_final_km"] * (1 - 1e-9)
