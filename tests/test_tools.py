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


def test_label_raster_epsg4326_matches_label_grid():
    """On a degree-gridded raster the CRS path reduces to label_grid."""
    from vinsat_tpu.tools.labeling import label_grid, label_raster
    from vinsat_tpu.tools.raster import Affine

    rng = np.random.default_rng(0)
    lon_min, lat_min, lon_max, lat_max = -123.0, 34.0, -120.0, 37.0
    W, H = 600, 600
    c_lon = rng.uniform(lon_min + 0.2, lon_max - 0.2, 50)
    c_lat = rng.uniform(lat_min + 0.2, lat_max - 0.2, 50)
    half = rng.uniform(0.01, 0.05, (50, 2))
    lm = np.stack([c_lon, c_lat, c_lon - half[:, 0], c_lat - half[:, 1],
                   c_lon + half[:, 0], c_lat + half[:, 1]], axis=1)
    t = Affine((lon_max - lon_min) / W, 0.0, lon_min,
               0.0, -(lat_max - lat_min) / H, lat_max)
    a = label_grid(lm, lon_min, lat_min, lon_max, lat_max, W, H)
    b = label_raster(lm, t, W, H, crs="EPSG:4326")
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)


def test_label_raster_epsg3857_roundtrip():
    """Web-Mercator labels land where the inverse projection says the
    landmark is (the real-geotransform parity case, label_ld.py:56-113)."""
    from vinsat_tpu.tools.labeling import (epsg3857_to_lonlat, label_raster,
                                           lonlat_to_epsg3857)
    from vinsat_tpu.tools.raster import Affine

    # raster covering [-122.6, -121.4] x [35.4, 36.6] in EPSG:3857
    x0, y1 = lonlat_to_epsg3857(-122.6, 36.6)
    x1, y0 = lonlat_to_epsg3857(-121.4, 35.4)
    W = H = 512
    t = Affine((x1 - x0) / W, 0.0, x0, 0.0, (y0 - y1) / H, y1)

    rng = np.random.default_rng(1)
    c_lon = rng.uniform(-122.5, -121.5, 40)
    c_lat = rng.uniform(35.5, 36.5, 40)
    half = rng.uniform(0.005, 0.02, (40, 2))
    lm = np.stack([c_lon, c_lat, c_lon - half[:, 0], c_lat - half[:, 1],
                   c_lon + half[:, 0], c_lat + half[:, 1]], axis=1)
    rows = label_raster(lm, t, W, H, crs="EPSG:3857")
    assert len(rows) == 40  # margins keep everything in bounds
    # centroid pixel -> world -> lonlat must return the input centroid
    for r in rows:
        k = int(r[0])
        x, y = t.pixel_to_world(r[1] * W, r[2] * H)
        lon, lat = epsg3857_to_lonlat(x, y)
        np.testing.assert_allclose(lon, c_lon[k], atol=1e-9)
        np.testing.assert_allclose(lat, c_lat[k], atol=1e-9)
    # mercator y-stretch: boxes are TALLER in pixels than an equirect
    # mapping would make them (cos(36deg) ~ 0.81 scale difference)
    px_w = rows[:, 3] * W
    px_h = rows[:, 4] * H
    sq_lon = half[rows[:, 0].astype(int), 0]
    sq_lat = half[rows[:, 0].astype(int), 1]
    aspect = (px_h / px_w) / (sq_lat / sq_lon)
    np.testing.assert_allclose(aspect, 1.0, atol=0.02)


def test_write_yolo_labels(tmp_path):
    from vinsat_tpu.tools.labeling import write_yolo_labels

    rows = np.array([[3, 0.5, 0.25, 0.1, 0.2]])
    p = str(tmp_path / "img.txt")
    write_yolo_labels(rows, p)
    cls, xc, yc, w, h = open(p).read().split()
    assert cls == "3" and float(xc) == 0.5 and float(h) == 0.2


def test_visualize_label_overlay(tmp_path):
    """visualize_label parity (label_ld.py:116-137): green 2-px box edges +
    class-id glyphs, PPM export, and txt round-trip."""
    from vinsat_tpu.tools import labeling

    H, W = 120, 160
    img = np.zeros((H, W, 3), np.uint8)
    rows = np.array([[3, 0.5, 0.5, 0.25, 0.25],
                     [17, 0.2, 0.7, 0.1, 0.1]])
    out = labeling.visualize_label(rows, img)
    assert out.shape == (H, W, 3) and out.dtype == np.uint8
    green = (out[..., 1] == 255) & (out[..., 0] == 0) & (out[..., 2] == 0)
    # box 0: xc=80, yc=60, w=40, h=30 -> left=60, top=45, right=100, bot=75
    assert green[45:47, 60:100].all()     # top edge, 2 px thick
    assert green[74:76, 60:100].all()     # bottom edge
    assert green[45:76, 60:62].all()      # left edge
    assert not green[60, 80]              # interior untouched
    assert (img == 0).all()               # input not mutated
    # class-id glyphs drawn above the box
    assert green[33:43, 60:80].any()
    # ppm roundtrip
    p = tmp_path / "viz.ppm"
    labeling.write_ppm(out, str(p))
    data = p.read_bytes()
    assert data.startswith(b"P6\n160 120\n255\n")
    assert len(data) == len(b"P6\n160 120\n255\n") + H * W * 3
    # label txt roundtrip feeds the same overlay
    txt = tmp_path / "l.txt"
    labeling.write_yolo_labels(rows, str(txt))
    out2 = labeling.visualize_label(str(txt), img)
    np.testing.assert_array_equal(out, out2)


def test_load_rasterio_with_stub(tmp_path, monkeypatch):
    """RasterImageServer.load_rasterio (tools/raster.py ≙ SatCam.py:283-316)
    against a stubbed rasterio module: band (3,H,W)->HWC move, geotransform
    capture, and windowed cropping through the loaded raster."""
    import sys
    import types

    H, W = 40, 60
    bands = np.arange(3 * H * W, dtype=np.uint8).reshape(3, H, W)

    class _T:
        a, b, c, d, e, f = 0.1, 0.0, -120.0, 0.0, -0.1, 42.0

    class _Src:
        transform = _T()

        def read(self, idx):
            assert tuple(idx) == (1, 2, 3)
            return bands

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    stub = types.ModuleType("rasterio")
    opened = []

    def _open(path):
        opened.append(path)
        return _Src()

    stub.open = _open
    monkeypatch.setitem(sys.modules, "rasterio", stub)

    srv = RasterImageServer()
    assert srv.load_rasterio("10S", "/fake/region.tif") is True
    assert opened == ["/fake/region.tif"]
    assert "10S" in srv.regions()
    img, t = srv._images["10S"]
    assert img.shape == (H, W, 3)  # (3,H,W) moved to HWC
    np.testing.assert_array_equal(img[:, :, 0], bands[0])
    assert (t.a, t.b, t.c, t.d, t.e, t.f) == (0.1, 0.0, -120.0, 0.0, -0.1,
                                              42.0)
    # a window crop through the loaded raster: world box -> pixel window
    win, wt = srv.get_window("10S", -119.0, 41.0, -118.0, 41.5)
    # cols: (-119 - -120)/0.1 = 10 .. 20; rows: (42-41.5)/0.1=5 .. 10
    assert win.shape == (5, 10, 3)
    np.testing.assert_array_equal(win, img[5:10, 10:20])
    # window transform maps crop pixel (0,0) to the box's top-left world pt
    np.testing.assert_allclose(wt.pixel_to_world(0, 0), (-119.0, 41.5))


def test_load_rasterio_absent(monkeypatch):
    """Without rasterio importable, load_rasterio degrades to False."""
    import builtins
    import sys

    monkeypatch.delitem(sys.modules, "rasterio", raising=False)
    real_import = builtins.__import__

    def fake_import(name, *a, **k):
        if name == "rasterio":
            raise ImportError("no rasterio")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", fake_import)
    srv = RasterImageServer()
    assert srv.load_rasterio("10S", "/fake.tif") is False
    assert srv.regions() == []


def test_utm_forward_invariants_and_roundtrip():
    """Native Karney-Krueger UTM (labeling.lonlat_to_utm): structural
    invariants of the projection plus forward/inverse round-trip."""
    from vinsat_tpu.tools import labeling as lb

    # central meridian of zone 31 is 3 deg E: easting == 500 km exactly
    E, N = lb.lonlat_to_utm(3.0, 47.3, zone=31, north=True)
    np.testing.assert_allclose(E, 500000.0, atol=1e-6)
    # equator on the central meridian: northing 0 (north) / 1e7 (south)
    E0, N0 = lb.lonlat_to_utm(3.0, 0.0, zone=31, north=True)
    np.testing.assert_allclose(N0, 0.0, atol=1e-6)
    _, Ns = lb.lonlat_to_utm(3.0, 0.0, zone=31, north=False)
    np.testing.assert_allclose(Ns, 1e7, atol=1e-6)
    # meridian scale at the CM is k0: 1 deg of latitude around 45 N spans
    # k0 * meridian arc; check against the rectifying-sphere arc length
    _, N1 = lb.lonlat_to_utm(3.0, 44.5, 31)
    _, N2 = lb.lonlat_to_utm(3.0, 45.5, 31)
    # WGS84 meridian arc for 1 deg at 45 N is ~111131.7 m
    np.testing.assert_allclose((N2 - N1) / 0.9996, 111131.7, rtol=2e-5)
    # east-west antisymmetry about the CM
    El, _ = lb.lonlat_to_utm(3.0 - 1.25, 52.0, 31)
    Er, _ = lb.lonlat_to_utm(3.0 + 1.25, 52.0, 31)
    np.testing.assert_allclose(Er - 500000.0, 500000.0 - El, atol=1e-6)

    # round-trip over a grid spanning the zone (and a bit beyond), both
    # hemispheres' CRS variants
    lon = np.linspace(0.2, 5.8, 7)[None, :] + np.zeros((5, 1))
    lat = np.linspace(-79, 83, 5)[:, None] + np.zeros((1, 7))
    for north in (True, False):
        E, N = lb.lonlat_to_utm(lon, lat, 31, north=north)
        lon2, lat2 = lb.utm_to_lonlat(E, N, 31, north=north)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
    # north/south falsings differ by exactly the 1e7 m offset
    _, Nn = lb.lonlat_to_utm(2.0, -33.0, 31, north=True)
    _, Ns = lb.lonlat_to_utm(2.0, -33.0, 31, north=False)
    np.testing.assert_allclose(Ns - Nn, 1e7, atol=1e-6)


def test_utm_matches_snyder_series():
    """Cross-validation against an INDEPENDENT transverse-Mercator
    formulation (Snyder 1987, eqs. 8-9..8-15 — series in e'^2 and the
    classic meridian-arc expansion), which is accurate to ~1 mm at UTM
    scale: both must agree to < 2 mm over the zone."""
    from vinsat_tpu.tools import labeling as lb

    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    ep2 = e2 / (1 - e2)
    k0 = 0.9996

    def snyder(lon_deg, lat_deg, zone):
        lon = np.radians(np.asarray(lon_deg, np.float64))
        lat = np.radians(np.asarray(lat_deg, np.float64))
        lon0 = np.radians(zone * 6.0 - 183.0)
        sp, cp = np.sin(lat), np.cos(lat)
        Nr = a / np.sqrt(1 - e2 * sp * sp)
        T = (sp / cp) ** 2
        C = ep2 * cp * cp
        A = (lon - lon0) * cp
        M = a * ((1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * lat
                 - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024)
                 * np.sin(2 * lat)
                 + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024)
                 * np.sin(4 * lat)
                 - (35 * e2 ** 3 / 3072) * np.sin(6 * lat))
        E = k0 * Nr * (A + (1 - T + C) * A ** 3 / 6
                       + (5 - 18 * T + T * T + 72 * C - 58 * ep2)
                       * A ** 5 / 120) + 500000.0
        N = k0 * (M + Nr * sp / cp * (A ** 2 / 2
                  + (5 - T + 9 * C + 4 * C * C) * A ** 4 / 24
                  + (61 - 58 * T + T * T + 600 * C - 330 * ep2)
                  * A ** 6 / 720))
        return E, N

    rng = np.random.default_rng(7)
    lon = 3.0 + rng.uniform(-2.8, 2.8, 40)
    lat = rng.uniform(-75, 75, 40)
    E1, N1 = lb.lonlat_to_utm(lon, lat, 31, north=True)
    E2, N2 = snyder(lon, lat, 31)
    np.testing.assert_allclose(E1, E2, atol=2e-3)
    np.testing.assert_allclose(N1, N2, atol=2e-3)


def test_label_raster_utm_crs():
    """label_raster on a UTM raster (EPSG:326xx): labels must land at the
    same normalized positions as projecting the landmark coordinates
    through the UTM forward transform by hand."""
    from vinsat_tpu.tools import labeling as lb

    zone, north = 33, True  # 15 deg E central meridian
    # raster window: 20 km x 15 km around (14.8 E, 48.2 N), 10 m/px
    cx, cy = lb.lonlat_to_utm(14.8, 48.2, zone, north)
    W, H, res = 2000, 1500, 10.0
    tr = Affine(res, 0.0, float(cx) - W / 2 * res,
                0.0, -res, float(cy) + H / 2 * res)

    # landmarks: centroid + bbox corners in lon/lat, ~1 km boxes
    lon_c = np.array([14.78, 14.85, 14.80])
    lat_c = np.array([48.22, 48.17, 48.26])
    dlon, dlat = 0.006, 0.004
    lm = np.stack([lon_c, lat_c, lon_c - dlon, lat_c - dlat,
                   lon_c + dlon, lat_c + dlat], axis=1)
    rows = lb.label_raster(lm, tr, W, H, crs=f"EPSG:326{zone}")
    assert rows.shape[0] == 3
    Ec, Nc = lb.lonlat_to_utm(lon_c, lat_c, zone, north)
    cu, cv = tr.world_to_pixel(Ec, Nc)
    np.testing.assert_allclose(rows[:, 1], cu / W, atol=1e-12)
    np.testing.assert_allclose(rows[:, 2], cv / H, atol=1e-12)
    # a 1 km-wide box at 10 m/px is ~100 px wide -> ~0.05 normalized
    assert (rows[:, 3] > 0.03).all() and (rows[:, 3] < 0.08).all()
    # southern-hemisphere CRS accepted too
    rows_s = lb.label_raster(lm, tr, W, H, crs=f"EPSG:327{zone}")
    assert rows_s.shape[1] == 5
    # unknown CRS still refuses loudly
    import pytest

    with pytest.raises(ValueError):
        lb.label_raster(lm, tr, W, H, crs="EPSG:2154")
