"""Host-side measurement ingest: detection rows -> factor-graph arrays.

Replicates the data conditioning of estimation/od_pipe.py:
  * `build_graph`     — read_detections (od_pipe.py:185-251): knot times =
    unique detection frames + filler knots every 1000 s, obs->knot index ii;
  * `gate_and_compact`— reprojection/confidence gating + graph compaction
    (mask at od_pipe.py:930, remove_elems at od_pipe.py:253-288);
  * `split_windows`   — identify_next_batch_new (od_pipe.py:898-905);
  * `process_ground_truths` equivalent returning km/ECI arrays
    (od_pipe.py:94-123).

This layer is intentionally numpy-on-host (data-dependent shapes); the
jit-compiled device work lives in estimation/ba.py and estimation/window.py.
"""
from __future__ import annotations

from typing import List, NamedTuple, Tuple

import numpy as np

from vinsat_tpu.core import frames as jframes

KNOT_STRIDE = 1000  # s, filler-knot spacing (od_pipe.py:216-228)


class DetectionGraph(NamedTuple):
    frame: np.ndarray  # (M,) detection frame index (1 Hz)
    uv: np.ndarray  # (M, 2)
    lonlat: np.ndarray  # (M, 2) lon, lat degrees
    conf: np.ndarray  # (M,)
    time_idx: np.ndarray  # (N,) knot times (frames), includes filler knots
    ii: np.ndarray  # (M,) obs -> knot index


def build_graph(det_rows: np.ndarray, orbit_len: int,
                knot_stride: int = KNOT_STRIDE,
                use_native: bool = True) -> DetectionGraph:
    """Rows [frame, lon, lat, xc, yc, conf] (nadir_sim.py:236) -> graph.

    Follows read_detections (od_pipe.py:210-247): knots at unique detection
    frames, filler knots at multiples of `knot_stride` inserted between and
    after detections out to the orbit length.
    """
    det_rows = np.asarray(det_rows, dtype=np.float64)
    if det_rows.size == 0:
        det_rows = det_rows.reshape(0, 6)
    order = np.argsort(det_rows[:, 0], kind="stable")
    det_rows = det_rows[order]
    frame = det_rows[:, 0]
    uv = det_rows[:, 3:5]
    lonlat = det_rows[:, 1:3]
    conf = det_rows[:, 5]
    if len(frame) == 0:
        # no detections: no knots at all (matches vt_build_graph's m==0)
        return DetectionGraph(frame=frame, uv=uv, lonlat=lonlat, conf=conf,
                              time_idx=np.zeros(0, np.int64),
                              ii=np.zeros(0, np.int64))

    # native C++ fast path (vinsat_tpu/native); numpy fallback below —
    # cross-checked in tests/test_native.py
    if use_native:
        try:
            from vinsat_tpu import native

            if native.available():
                ii_n, knots_n = native.build_graph(
                    frame.astype(np.int64), knot_stride, orbit_len
                )
                return DetectionGraph(frame=frame, uv=uv, lonlat=lonlat,
                                      conf=conf, time_idx=knots_n, ii=ii_n)
        except Exception:
            pass

    det_times = np.unique(frame).astype(np.int64)
    ii: List[int] = []
    time_idx_new: List[int] = []
    filler_idx = det_times.min() // knot_stride + 1
    filler_offset = 0
    # Note: unlike the reference loop (od_pipe.py:219-228), a detection knot
    # always consumes its stride slot, so duplicate knots can never be
    # emitted (the reference emits a zero-gap duplicate when a detection at
    # an exact stride multiple follows an inserted filler).
    for i, t in enumerate(det_times):
        while filler_idx * knot_stride < t:
            time_idx_new.append(filler_idx * knot_stride)
            filler_idx += 1
            filler_offset += 1
        if filler_idx * knot_stride == t:
            filler_idx += 1
        time_idx_new.append(int(t))
        num_points = int((frame == t).sum())
        ii.extend([i + filler_offset] * num_points)
    if det_times[-1] < orbit_len:
        while filler_idx * knot_stride < (orbit_len // knot_stride) * knot_stride + 1:
            time_idx_new.append(filler_idx * knot_stride)
            filler_idx += 1
    return DetectionGraph(
        frame=frame,
        uv=uv,
        lonlat=lonlat,
        conf=conf,
        time_idx=np.array(time_idx_new, dtype=np.int64),
        ii=np.array(ii, dtype=np.int64),
    )


def load_reference_orbit(path: str) -> np.ndarray:
    """Load a VINSat-format orbit pose file -> (T, 3) ECI positions in km.

    Supports both formats the reference consumes:
      * `*_orbit_*zyxvecs.npy`: rows [pos_ecef_m(3), dir(3), up(3), right(3)]
        (written by sim/nadir_sim.py:145-150, read at od_pipe.py:238-240);
      * `orbit_3hr_skip_fl.txt`-style JSON list of the same rows
        (od_pipe.py:232-233).
    The ECEF->ECI conversion matches od_pipe.py:240 (GMST at 1 Hz frames).
    """
    import json as _json

    import jax.numpy as jnp

    if path.endswith(".npy"):
        rows = np.load(path, allow_pickle=True)
    else:
        with open(path) as f:
            rows = np.array(_json.load(f))
    pos_ecef_km = np.asarray(rows, dtype=np.float64)[:, :3] / 1000.0
    t = np.arange(pos_ecef_km.shape[0])
    return np.asarray(jframes.ecef_to_eci(jnp.asarray(pos_ecef_km),
                                          jnp.asarray(t)))


def load_reference_detections(path: str) -> np.ndarray:
    """Load a VINSat `*_all_detections.npy` file: rows
    [frame, lon, lat, xc, yc, conf] (sim/nadir_sim.py:236,256)."""
    rows = np.load(path, allow_pickle=True)
    return np.asarray(rows, dtype=np.float64).reshape(-1, 6)


class GroundTruth(NamedTuple):
    pos_eci: np.ndarray  # (N, 3) km at knots
    vel_eci: np.ndarray  # (N, 3) km/s at knots (finite-difference)
    quat_eci: np.ndarray  # (N, 4) nadir quaternions at knots
    pos_eci_full: np.ndarray  # (T, 3)
    quat_eci_full: np.ndarray  # (T, 4)
    omega_full: np.ndarray  # (T, 3) body rates from quat sequence
    landmarks_xyz: np.ndarray  # (M, 3) km ECI
    states: np.ndarray  # (N, 10) GT knot states [pos, quat, vel]


def process_ground_truths(orbit_pos_eci_km: np.ndarray, graph: DetectionGraph,
                          dt: float = 1.0, device_dtype=None) -> GroundTruth:
    """GT conditioning (process_ground_truths, od_pipe.py:94-123).

    orbit_pos_eci_km: (T, 3) 1 Hz GT positions in km, ECI.  Velocities by
    forward difference (compute_velocity_from_pos, BA_utils.py:1370-1373),
    attitude = nadir quaternion from position (convert_pos_to_quaternion,
    od_pipe.py:102), landmarks lifted lon/lat -> ECI at their frame time.

    device_dtype: dtype for the on-device conditioning ops (nadir quats,
    body rates, landmark lifts).  Default None keeps the backend default;
    pass the solver dtype when the default device cannot run f64 (TPU with
    global x64 enabled for host-side f64 simulation).
    """
    import jax.numpy as jnp

    from vinsat_tpu.core import quat as jquat

    jd = None if device_dtype is None else jnp.dtype(device_dtype)
    T = orbit_pos_eci_km.shape[0]
    vel_full = np.diff(orbit_pos_eci_km, axis=0) / dt
    vel_full = np.concatenate([vel_full, np.zeros((1, 3))], axis=0)
    quat_full = np.asarray(
        jframes.nadir_quaternion(jnp.asarray(orbit_pos_eci_km, jd))
    )
    omega_full = np.asarray(
        jquat.omega_from_sequence(jnp.asarray(quat_full, jd), dt)
    )
    lm_xyz = np.asarray(
        jframes.lonlat_to_eci(
            jnp.asarray(graph.lonlat[:, 0], jd),
            jnp.asarray(graph.lonlat[:, 1], jd),
            jnp.asarray(graph.frame, jd),
        )
    )
    t = graph.time_idx
    pos = orbit_pos_eci_km[t]
    vel = vel_full[t]
    q = quat_full[t]
    states = np.concatenate([pos, q, vel], axis=1)
    return GroundTruth(pos, vel, q, orbit_pos_eci_km, quat_full, omega_full,
                       lm_xyz, states)


def gate_and_compact(graph: DetectionGraph, gt: GroundTruth,
                     uv_proj: np.ndarray,
                     u_max: float = 4700.0, v_max: float = 2600.0,
                     max_err: float = 1000.0, min_conf: float = 0.8,
                     knot_stride: int = KNOT_STRIDE
                     ) -> Tuple[DetectionGraph, GroundTruth, np.ndarray]:
    """Outlier gating + graph compaction (od_pipe.py:930, remove_elems
    :253-288).

    uv_proj: (M, 2) reprojections of the landmarks through GT knot states.
    Keeps observations passing the gate; keeps knots that retain >=1 obs or
    sit on the filler-knot stride; re-indexes ii.
    """
    err = np.linalg.norm(uv_proj - graph.uv, axis=-1)
    mask = (
        (uv_proj[:, 0] > 0) & (uv_proj[:, 1] > 0)
        & (uv_proj[:, 0] < u_max) & (uv_proj[:, 1] < v_max)
        & (err < max_err) & (graph.conf > min_conf)
    )
    ii_kept = graph.ii[mask]
    N = graph.time_idx.shape[0]
    has_obs = np.zeros(N, dtype=bool)
    has_obs[np.unique(ii_kept)] = True
    keep_knot = has_obs | (graph.time_idx % knot_stride == 0)
    new_index = np.cumsum(keep_knot) - 1
    ii_new = new_index[ii_kept]

    graph2 = DetectionGraph(
        frame=graph.frame[mask],
        uv=graph.uv[mask],
        lonlat=graph.lonlat[mask],
        conf=graph.conf[mask],
        time_idx=graph.time_idx[keep_knot],
        ii=ii_new,
    )
    gt2 = GroundTruth(
        pos_eci=gt.pos_eci[keep_knot],
        vel_eci=gt.vel_eci[keep_knot],
        quat_eci=gt.quat_eci[keep_knot],
        pos_eci_full=gt.pos_eci_full,
        quat_eci_full=gt.quat_eci_full,
        omega_full=gt.omega_full,
        landmarks_xyz=gt.landmarks_xyz[mask],
        states=gt.states[keep_knot],
    )
    return graph2, gt2, mask


def add_proxy_landmarks(graph: DetectionGraph, gt: GroundTruth,
                        intrinsics, num_proxies: int = 8,
                        min_obs: int = 4, noise_px: float = 20.0,
                        offset_km: float = 50.0, conf: float = 0.75,
                        seed: int = 0) -> Tuple[DetectionGraph, GroundTruth]:
    """Augment sparsely observed knots with synthetic proxy landmarks
    (add_proxy_landmarks, od_pipe.py:290-305): knots with <= min_obs
    observations get num_proxies extra landmarks offset from an existing one,
    with their GT reprojections + pixel noise as measurements at fixed
    confidence."""
    import jax.numpy as jnp

    from vinsat_tpu.estimation import factors

    rng = np.random.default_rng(seed)
    lm = [gt.landmarks_xyz]
    uv = [graph.uv]
    ll = [graph.lonlat]
    cf = [graph.conf]
    fr = [graph.frame]
    ii = [graph.ii]
    for k in np.unique(graph.ii):
        mask = graph.ii == k
        if mask.sum() > min_obs:
            continue
        base = gt.landmarks_xyz[mask][:1]
        new_lm = base + rng.standard_normal((num_proxies, 3)) * offset_km
        proj = np.asarray(factors.project_landmarks(
            jnp.asarray(gt.states), jnp.asarray(new_lm),
            jnp.full(num_proxies, k, dtype=jnp.int32), jnp.asarray(intrinsics),
        ))
        lm.append(new_lm)
        uv.append(proj + rng.standard_normal((num_proxies, 2)) * noise_px)
        ll.append(np.zeros((num_proxies, 2)))
        cf.append(np.full(num_proxies, conf))
        fr.append(np.full(num_proxies, graph.time_idx[k]))
        ii.append(np.full(num_proxies, k, dtype=graph.ii.dtype))
    graph2 = DetectionGraph(
        frame=np.concatenate(fr), uv=np.concatenate(uv),
        lonlat=np.concatenate(ll), conf=np.concatenate(cf),
        time_idx=graph.time_idx, ii=np.concatenate(ii),
    )
    gt2 = gt._replace(landmarks_xyz=np.concatenate(lm))
    return graph2, gt2


def split_windows(ii: np.ndarray, time_idx: np.ndarray,
                  contiguous_gap: int = 100, split_gap: int = 200,
                  min_contiguous: int = 4,
                  use_native: bool = True) -> List[Tuple[int, int, bool]]:
    """Sequence of (t_final, i_final, seq_end) window ends
    (identify_next_batch_new, od_pipe.py:898-905).

    The contiguous counter resets at each window start, matching the
    reference (identify_next_batch_new is called freshly per window,
    od_pipe.py:899).
    """
    if use_native:
        try:
            from vinsat_tpu import native

            if native.available():
                return native.split_windows(ii, time_idx, contiguous_gap,
                                            split_gap, min_contiguous)
        except Exception:
            pass
    out = []
    i = 0
    while True:
        contiguous = 0
        found = False
        for j in range(i + 1, len(ii)):
            gap = time_idx[ii[j]] - time_idx[ii[j - 1]]
            if gap < contiguous_gap:
                contiguous += 1
            if gap > split_gap and contiguous > min_contiguous:
                out.append((int(ii[j - 1] + 1), int(j), False))
                i = j
                found = True
                break
        if not found:
            out.append((int(ii[-1] + 1), int(len(ii)), True))
            return out
