"""Synthetic landmark-detection stream generation (the YOLO-stage equivalent).

The reference renders GeoTIFF windows and runs a per-region YOLO detector
(sim/nadir_sim.py:94-119,138-265), emitting rows [frame, lon, lat, xc, yc,
conf] (nadir_sim.py:236).  Re-training YOLO is out of scope (SURVEY.md §2
C12 note); this module replaces it with a *calibrated detection simulator*:

  1. per frame, gate on >=3 detector-accepted landmarks in the footprint
     (SatCam.py:249-262);
  2. project every accepted landmark into the image, keep in-view ones;
  3. add pixel noise matched to the detector acceptance bound (<10 px mean
     error per class, eval/eval_landmarks.py:21,281) and a confidence drawn
     from the detector's conf range;
  4. emit the same [frame, lon, lat, xc, yc, conf] rows.

A pluggable `detector_fn` hook allows substituting a learned detector.

TPU design: the whole arc is processed as one vmap over frames with a fixed
per-frame detection budget (max_dets), then compacted host-side into the
variable-length row contract.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vinsat_tpu.core import frames
from vinsat_tpu.sim import camera as cam_mod
from vinsat_tpu.sim import landmarks as lm_mod
from vinsat_tpu.sim import mgrs
from vinsat_tpu.sim.orbits import Trajectory


class FrameDetections(NamedTuple):
    """Fixed-budget per-frame detections (T, max_dets, ...)."""

    valid: jnp.ndarray  # (T, D) bool
    landmark_idx: jnp.ndarray  # (T, D) int32 into the LandmarkDB
    uv: jnp.ndarray  # (T, D, 2) noisy pixel centre
    uv_true: jnp.ndarray  # (T, D, 2) noise-free projection
    conf: jnp.ndarray  # (T, D)
    frame_visible: jnp.ndarray  # (T,) imaging gate passed


def _frame_gate(cam: cam_mod.CameraModel, db: lm_mod.LandmarkDB,
                pos_ecef_m, active_mask, min_visible: int,
                use_pallas: bool = False):
    """Imaging gate for a batch of frames: footprint bounds + >=min_visible
    accepted landmarks (SatCam.py:249-262).  With use_pallas the count runs
    through the tiled Pallas kernel (kernels/matching.py)."""
    pose = cam_mod.CameraPose.nadir(pos_ecef_m)
    bounds, all_hit = cam_mod.footprint_bounds(cam, pose)
    if use_pallas:
        from vinsat_tpu.kernels import matching

        best = (db.best & active_mask[db.region]).astype(jnp.float32)
        nan_safe = jnp.where(jnp.isnan(bounds), -1e9, bounds)
        n_best = matching.visible_count(nan_safe, db.lon, db.lat, best)
    else:
        n_best = lm_mod.visible_best_count(db, bounds, active_mask)
    return all_hit & (n_best >= min_visible)


def _project_frame(cam: cam_mod.CameraModel, db: lm_mod.LandmarkDB,
                   pos_ecef_m, gate, active_mask):
    """Project all landmarks for one (gated) frame; per-landmark mask + uv."""
    pose = cam_mod.CameraPose.nadir(pos_ecef_m)
    uv, z = cam_mod.lonlat_to_pixel(cam, pose, db.lon, db.lat)
    in_view = (
        (z > 0)
        & (uv[..., 0] >= 0) & (uv[..., 0] < cam.width_px)
        & (uv[..., 1] >= 0) & (uv[..., 1] < cam.height_px)
        & db.best
        & active_mask[db.region]
    )
    return in_view & gate, uv


def generate_detections(key, traj: Trajectory, db: lm_mod.LandmarkDB,
                        cam: Optional[cam_mod.CameraModel] = None,
                        noise_px: float = 4.0,
                        conf_low: float = 0.5, conf_high: float = 1.0,
                        min_visible: int = 3, max_dets: int = 8,
                        frame_stride: int = 1,
                        detector_fn: Optional[Callable] = None,
                        region_mask=None,
                        use_pallas_gate: bool = False) -> FrameDetections:
    """Simulate the detection stream for a trajectory.

    detector_fn, if given, maps (uv_true, key) -> (uv_noisy, conf) and
    replaces the default Gaussian-pixel-noise + uniform-confidence model.
    region_mask overrides the default 16-active-region gate; pass
    jnp.ones(len(mgrs.ZONE_LABELS), bool) to treat every region as having a
    trained detector.
    """
    if cam is None:
        cam = cam_mod.CameraModel.from_hfov()
    active = mgrs.active_region_mask() if region_mask is None else region_mask

    if detector_fn is not None:
        return _generate_detections_impl(
            key, traj.pos_ecef, db, active, cam, noise_px, conf_low,
            conf_high, min_visible, max_dets, frame_stride, detector_fn,
            use_pallas_gate,
        )
    # default noise model: one fully-jitted call (remote-TPU friendly)
    return _generate_detections_jit(
        key, traj.pos_ecef, db, active, cam, noise_px, conf_low, conf_high,
        min_visible, max_dets, frame_stride, None, use_pallas_gate,
    )


def _generate_detections_impl(key, pos_ecef_km, db, active, cam, noise_px,
                              conf_low, conf_high, min_visible: int,
                              max_dets: int, frame_stride: int,
                              detector_fn=None,
                              use_pallas_gate: bool = False) -> FrameDetections:
    pos_ecef_m = pos_ecef_km * 1000.0
    T = pos_ecef_m.shape[0]
    frames_idx = jnp.arange(0, T, frame_stride)
    pos_sel = pos_ecef_m[frames_idx]

    gate = _frame_gate(cam, db, pos_sel, active, min_visible,
                       use_pallas=use_pallas_gate)
    mask, uv_all = jax.vmap(
        lambda p, g: _project_frame(cam, db, p, g, active)
    )(pos_sel, gate)

    # Select up to max_dets in-view landmarks per frame, prioritizing by a
    # fixed pseudo-random score so the subset is stable and spread out.
    score = jnp.where(mask, jax.random.uniform(key, mask.shape), -1.0)
    top_idx = jnp.argsort(-score, axis=-1)[:, :max_dets]  # (Tf, D)
    valid = jnp.take_along_axis(mask, top_idx, axis=-1)
    uv_true = jnp.take_along_axis(
        uv_all, top_idx[..., None].repeat(2, -1), axis=-2
    )

    k_noise, k_conf = jax.random.split(jax.random.fold_in(key, 1))
    if detector_fn is None:
        uv_noisy = uv_true + noise_px * jax.random.normal(k_noise, uv_true.shape)
        conf = conf_low + (conf_high - conf_low) * jax.random.uniform(
            k_conf, valid.shape
        )
    else:
        uv_noisy, conf = detector_fn(uv_true, k_noise)

    return FrameDetections(
        valid=valid,
        landmark_idx=top_idx.astype(jnp.int32),
        uv=uv_noisy,
        uv_true=uv_true,
        conf=conf,
        frame_visible=gate,
    )


_generate_detections_jit = jax.jit(
    _generate_detections_impl,
    static_argnames=("cam", "min_visible", "max_dets", "frame_stride",
                     "detector_fn", "use_pallas_gate"),
)


def to_rows(dets: FrameDetections, db: lm_mod.LandmarkDB,
            frame_stride: int = 1) -> np.ndarray:
    """Compact fixed-budget detections into the reference row contract:
    (M, 6) float array of [frame, lon, lat, xc, yc, conf]
    (sim/nadir_sim.py:236,256)."""
    valid = np.asarray(dets.valid)
    t_idx, d_idx = np.nonzero(valid)
    li = np.asarray(dets.landmark_idx)[t_idx, d_idx]
    rows = np.stack(
        [
            t_idx.astype(np.float64) * frame_stride,
            np.asarray(db.lon)[li],
            np.asarray(db.lat)[li],
            np.asarray(dets.uv)[t_idx, d_idx, 0],
            np.asarray(dets.uv)[t_idx, d_idx, 1],
            np.asarray(dets.conf)[t_idx, d_idx],
        ],
        axis=1,
    )
    return rows


def px_error_stats(dets: FrameDetections) -> dict:
    """Mean/median/max |error| statistics like the sim's per-orbit QA print
    (nadir_sim.py:257-264)."""
    valid = np.asarray(dets.valid)
    err = np.abs(np.asarray(dets.uv) - np.asarray(dets.uv_true))[valid]
    if err.size == 0:
        return {"n": 0}
    return {
        "n": int(valid.sum()),
        "mean_x": float(err[:, 0].mean()),
        "mean_y": float(err[:, 1].mean()),
        "median_x": float(np.median(err[:, 0])),
        "median_y": float(np.median(err[:, 1])),
        "max_x": float(err[:, 0].max()),
        "max_y": float(err[:, 1].max()),
    }
