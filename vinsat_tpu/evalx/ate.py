"""Orbit-error evaluation: time-to-<threshold metrics.

Functional surface of estimation/errors_eval.py: per-orbit time to reach
<5 km (headline), <2 km, <1 km position error, and the cumulative fraction of
orbits reaching <5 km vs time (time_to_error_hist, errors_eval.py:19-50).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def time_to_threshold(errors: np.ndarray, times: np.ndarray,
                      threshold_km: float = 5.0) -> Optional[float]:
    """First time the error drops below threshold; None if never
    (errors_eval.py:26-28)."""
    below = np.asarray(errors) < threshold_km
    if not below.any():
        return None
    return float(np.asarray(times)[int(np.argmax(below))])


def cumulative_fraction(errors_list: Sequence[np.ndarray],
                        times_list: Sequence[np.ndarray],
                        threshold_km: float = 5.0
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Sorted first-crossing times + cumulative fraction of ALL orbits
    (errors_eval.py:24-39: normalized by the total orbit count, orbits that
    never converge simply cap the curve below 1)."""
    t5: List[float] = []
    for e, t in zip(errors_list, times_list):
        tt = time_to_threshold(e, t, threshold_km)
        if tt is not None:
            t5.append(tt)
    t5_sorted = np.sort(np.array(t5))
    frac = np.arange(1, len(t5_sorted) + 1) / max(len(errors_list), 1)
    return t5_sorted, frac


def ground_track(pos_ecef_km: np.ndarray):
    """(lat_deg, lon_deg, alt_km) of a trajectory (get_ground_track,
    sim/nadir_sim.py:65-80)."""
    import jax.numpy as jnp

    from vinsat_tpu.core import frames

    lat, lon, alt = frames.ecef_to_geodetic(jnp.asarray(pos_ecef_km))
    return np.asarray(lat), np.asarray(lon), np.asarray(alt)


def plot_ground_track(lat_deg, lon_deg, path: str):
    """Scatter the ground track to a PNG (plot_ground_track,
    sim/nadir_sim.py:82-92)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(10, 5))
    ax.scatter(lon_deg, lat_deg, s=1)
    ax.set_xlabel("Longitude (deg)")
    ax.set_ylabel("Latitude (deg)")
    ax.set_xlim(-180, 180)
    ax.set_ylim(-90, 90)
    ax.grid(True)
    fig.savefig(path, dpi=100)
    plt.close(fig)


def summarize(errors_list: Sequence[np.ndarray],
              times_list: Sequence[np.ndarray]) -> Dict[str, float]:
    """Headline summary across orbits: convergence fraction and median
    time-to-5km, plus the 1/2 km secondary thresholds
    (errors_eval.py:14-16)."""
    out = {}
    for thr in (5.0, 2.0, 1.0):
        ts, frac = cumulative_fraction(errors_list, times_list, thr)
        key = f"{thr:g}km"
        out[f"frac_reaching_{key}"] = float(frac[-1]) if len(frac) else 0.0
        out[f"median_time_to_{key}"] = (
            float(np.median(ts)) if len(ts) else float("nan")
        )
    final_errs = [float(np.asarray(e)[-1]) for e in errors_list if len(e)]
    out["median_final_error_km"] = (
        float(np.median(final_errs)) if final_errs else float("nan")
    )
    return out
