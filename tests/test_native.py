"""Cross-check the C++ native host runtime against the numpy reference
implementations in estimation/ingest.py."""
import numpy as np
import pytest

from vinsat_tpu import native
from vinsat_tpu.estimation import ingest

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib unavailable (no g++)")


def _rows(frames):
    m = len(frames)
    out = np.zeros((m, 6))
    out[:, 0] = frames
    out[:, 5] = 0.95
    out[:, 3] = 2000.0
    out[:, 4] = 1000.0
    return out


def test_build_graph_matches_python(rng):
    for trial in range(20):
        frames = np.sort(rng.integers(0, 10800, size=rng.integers(1, 60)))
        py = ingest.build_graph(_rows(frames), orbit_len=10800, use_native=False)
        ii, knots = native.build_graph(np.sort(frames), 1000, 10800)
        np.testing.assert_array_equal(knots, py.time_idx)
        np.testing.assert_array_equal(ii, py.ii)


def test_split_windows_matches_python(rng):
    for trial in range(20):
        n = int(rng.integers(5, 60))
        knot_t = np.sort(rng.choice(20000, size=n, replace=False))
        ii = np.sort(rng.integers(0, n, size=rng.integers(2, 100)))
        py = ingest.split_windows(ii, knot_t, use_native=False)
        nat = native.split_windows(ii, knot_t)
        assert nat == py


def test_crop_window_zero_padded(rng):
    img = rng.integers(0, 255, size=(40, 60, 3)).astype(np.uint8)
    # fully inside
    out = native.crop_window(img, 5, 10, 20, 30)
    np.testing.assert_array_equal(out, img[5:25, 10:40])
    # straddles top-left: zero-pad
    out = native.crop_window(img, -5, -8, 20, 30)
    assert out.shape == (20, 30, 3)
    np.testing.assert_array_equal(out[:5], 0)
    np.testing.assert_array_equal(out[:, :8], 0)
    np.testing.assert_array_equal(out[5:, 8:], img[:15, :22])
    # straddles bottom-right
    out = native.crop_window(img, 30, 50, 20, 30)
    np.testing.assert_array_equal(out[:10, :10], img[30:, 50:])
    np.testing.assert_array_equal(out[10:], 0)


def test_compact_graph_matches_python(rng):
    frames = np.sort(rng.integers(0, 9000, size=40))
    g = ingest.build_graph(_rows(frames), orbit_len=10800, use_native=False)
    mask = rng.random(len(g.ii)) < 0.6
    keep, ii_new = native.compact_graph(g.ii, mask, g.time_idx)
    # python equivalent
    ii_kept = g.ii[mask]
    has_obs = np.zeros(len(g.time_idx), bool)
    has_obs[np.unique(ii_kept)] = True
    keep_py = has_obs | (g.time_idx % 1000 == 0)
    np.testing.assert_array_equal(keep, keep_py)
    new_index = np.cumsum(keep_py) - 1
    np.testing.assert_array_equal(ii_new, new_index[ii_kept])
