import numpy as np

from vinsat_tpu.tools.raster import Affine, RasterImageServer


def test_affine_roundtrip():
    t = Affine(30.0, 0.0, 1000.0, 0.0, -30.0, 5000.0)
    x, y = t.pixel_to_world(10, 20)
    c, r = t.world_to_pixel(x, y)
    np.testing.assert_allclose([c, r], [10, 20], atol=1e-9)


def test_raster_server_window(rng):
    img = rng.integers(0, 255, (100, 200, 3)).astype(np.uint8)
    t = Affine(10.0, 0.0, 0.0, 0.0, -10.0, 1000.0)  # 10 units/px, y-down
    srv = RasterImageServer()
    srv.register("10S", img, t)

    # world box covering pixels cols 20..40, rows 30..50
    min_x, max_x = 200.0, 400.0
    max_y, min_y = 1000.0 - 300.0, 1000.0 - 500.0
    win, wt = srv.get_window("10S", min_x, min_y, max_x, max_y)
    assert win.shape == (20, 20, 3)
    np.testing.assert_array_equal(win, img[30:50, 20:40])
    # window transform maps pixel (0,0) to box top-left
    np.testing.assert_allclose(wt.pixel_to_world(0, 0), (200.0, 700.0))

    # off-edge request is zero-padded
    win2, _ = srv.get_window("10S", -100.0, 900.0, 100.0, 1100.0)
    assert win2.shape == (20, 20, 3)
    np.testing.assert_array_equal(win2[:10], 0)  # above image
    np.testing.assert_array_equal(win2[:, :10], 0)  # left of image

    # unknown region
    w3, t3 = srv.get_window("99X", 0, 0, 1, 1)
    assert w3 is None and t3 is None


def test_noise_model_detector():
    import jax

    from vinsat_tpu.sim.detector import NoiseModelDetector

    det = NoiseModelDetector(noise_px=3.0, conf_low=0.8)
    uv_true = jax.numpy.ones((50, 2)) * 100.0
    uv, conf = det(uv_true, jax.random.PRNGKey(0))
    err = np.abs(np.asarray(uv) - 100.0)
    assert 1.0 < err.mean() < 5.0
    assert (np.asarray(conf) >= 0.8).all()


def test_metrics_logger(tmp_path):
    from vinsat_tpu.utils.metrics import MetricsLogger

    p = str(tmp_path / "m.jsonl")
    m = MetricsLogger(p, run_id="t")
    m.log_window(0, 16, 64, 1.5, 1e-4, 0.8, end_error_km=2.0)
    m.log_window(1, 32, 128, 0.7, 1e-3, 0.9, end_error_km=0.5)
    s = m.summary()
    assert s["num_windows"] == 2
    assert abs(s["total_wall_s"] - 1.7) < 1e-9
    m.close()
    import json

    lines = [json.loads(line) for line in open(p)]
    assert len(lines) == 2 and lines[1]["end_error_km"] == 0.5


def test_checkpoint_roundtrip(tmp_path):
    from vinsat_tpu.utils import checkpoint as ckpt

    p = str(tmp_path / "ck.npz")
    states = np.random.default_rng(0).normal(size=(8, 10))
    H = np.eye(9) * 2
    ckpt.save(p, states=states, last_hessian=H, window_idx=3, lamda=1e-3,
              knot_times=np.arange(8), errors=np.array([1.0]),
              times=np.array([100]))
    z = ckpt.load(p)
    np.testing.assert_array_equal(z["states"], states)
    np.testing.assert_array_equal(z["last_hessian"], H)
    assert z["window_idx"] == 3 and z["lamda"] == 1e-3
