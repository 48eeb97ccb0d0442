"""End-to-end imagery pipeline: render raster -> window crop -> template
detector -> global detection rows (the full C10+C12 path with real image
processing)."""
import numpy as np
import jax
import jax.numpy as jnp

from vinsat_tpu.sim import imagery
from vinsat_tpu.tools.raster import Affine, RasterImageServer


def test_template_detector_recovers_positions(rng):
    K, H, W = 12, 256, 320
    key = jax.random.PRNGKey(0)
    templates = imagery.make_landmark_templates(key, K, size=12)
    pos = np.stack([rng.uniform(20, W - 20, K), rng.uniform(20, H - 20, K)],
                   axis=1)
    img = imagery.render_region_image(
        jax.random.PRNGKey(1), H, W, templates, jnp.asarray(pos),
        noise_sigma=0.1, amplitude=1.5,
    )
    det = imagery.TemplateDetector(templates)
    rows = det.predict(np.asarray(img), conf_threshold=0.5,
                       classes=np.arange(K))
    assert len(rows) >= K - 2, f"only {len(rows)} of {K} detected"
    for cls, xc, yc, conf in rows:
        err = np.hypot(xc - pos[int(cls), 0], yc - pos[int(cls), 1])
        assert err < 2.0, f"class {cls} off by {err} px"
        assert conf > 0.5


def test_template_detector_rejects_absent_classes(rng):
    K, H, W = 8, 128, 128
    templates = imagery.make_landmark_templates(jax.random.PRNGKey(0), K, 12)
    # draw only classes 0..3; 4..7 are absent
    pos = np.full((K, 2), -100.0)
    pos[:4] = np.stack([rng.uniform(20, W - 20, 4),
                        rng.uniform(20, H - 20, 4)], axis=1)
    img = imagery.render_region_image(
        jax.random.PRNGKey(1), H, W, templates, jnp.asarray(pos),
        noise_sigma=0.05, amplitude=1.5,
    )
    det = imagery.TemplateDetector(templates)
    rows = det.predict(np.asarray(img), conf_threshold=0.6,
                       classes=np.arange(K))
    found = set(int(r[0]) for r in rows)
    assert set(range(4)) <= found
    assert not (found & {4, 5, 6, 7}), f"false positives: {found}"


def test_imagery_through_raster_server(rng):
    """Render a 'region', serve a window crop, detect in the window, map
    window pixels back to world via the window transform."""
    from vinsat_tpu.sim.detector import run_image_detector

    K, H, W = 6, 200, 200
    templates = imagery.make_landmark_templates(jax.random.PRNGKey(2), K, 12)
    pos = np.stack([rng.uniform(30, W - 30, K), rng.uniform(30, H - 30, K)],
                   axis=1)
    img = imagery.render_region_image(
        jax.random.PRNGKey(3), H, W, templates, jnp.asarray(pos),
        noise_sigma=0.05, amplitude=2.0,
    )
    img8 = np.asarray(
        jnp.clip((img - img.min()) / (img.max() - img.min()) * 255, 0, 255)
    ).astype(np.uint8)[..., None].repeat(3, -1)

    # world coords: 0.01 deg/px, origin at (10.0, 50.0), y-down
    t = Affine(0.01, 0.0, 10.0, 0.0, -0.01, 52.0)
    srv = RasterImageServer()
    srv.register("32T", img8, t)
    # crop a window covering the full image
    win, wt = srv.get_window("32T", 10.0, 50.0, 12.0, 52.0)
    assert win.shape[:2] == (200, 200)

    det = imagery.TemplateDetector(templates)
    cls_lonlat = {k: tuple(t.pixel_to_world(pos[k, 0], pos[k, 1]))
                  for k in range(K)}
    rows = run_image_detector(
        det, win.mean(axis=-1), wt,
        cam_lonlat_to_pixel=lambda lon, lat: t.world_to_pixel(lon, lat),
        cls_to_lonlat=lambda k: cls_lonlat[k],
        conf_threshold=0.3, classes=np.arange(K),
    )
    assert len(rows) >= K - 1
    # each detection's recovered world position ~ the true landmark lon/lat
    for lon_cls, lat_cls, u, v, conf in rows:
        c_true, r_true = t.world_to_pixel(lon_cls, lat_cls)
        err = np.hypot(u - c_true, v - r_true)
        assert err < 3.0, f"world-mapped detection off by {err} px"


def test_imagery_od_end_to_end():
    """The complete imagery path: render raster, crop per-frame windows,
    detect with the template detector, stream OD -> converges under 5 km."""
    from vinsat_tpu import pipeline

    seq = pipeline.simulate_sequence_imagery(1, duration_s=600,
                                             frame_stride=60)
    assert len(seq.det_rows) > 20, f"only {len(seq.det_rows)} detections"
    assert (seq.det_rows[:, 5] > 0.8).any()
    res = pipeline.run_streaming(seq, seed=1)
    assert len(res.errors) > 0, "all observations gated out"
    assert res.errors.min() < 5.0, f"min error {res.errors.min()} km"
