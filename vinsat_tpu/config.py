"""Typed configuration for the whole pipeline.

The reference hardcodes every hyperparameter inline (see SURVEY.md §5 "Config").
This module centralizes them.  Each field cites the reference source
(file:line in /root/reference) that defines its default value.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CameraConfig:
    """Pinhole nadir camera.

    Defaults match the reference camera: 66 deg HFOV at 4608x2592
    (sim/nadir_sim.py:164-165,184) giving fx=fy=3547.85, cx=2304, cy=1296
    (estimation/landmarks/intrinsics.csv:1).
    """

    width_px: int = 4608
    height_px: int = 2592
    hfov_deg: float = 66.0

    @property
    def focal_px(self) -> float:
        import math

        return (self.width_px / 2) / math.tan(math.radians(self.hfov_deg) / 2)

    @property
    def intrinsics(self) -> Tuple[float, float, float, float]:
        f = self.focal_px
        return (f, f, self.width_px / 2.0, self.height_px / 2.0)


@dataclasses.dataclass(frozen=True)
class DynamicsConfig:
    """Orbit dynamics constants.

    mu / J2 coefficient and the non-standard r_mat J2 form replicate
    sim/orbit_gen.py:130-143 (== estimation/BA/BA_utils.py:883-899) for
    reference parity; `textbook_j2=True` switches to the standard J2
    acceleration (estimation/BA/BA_utils.py:822-833 form).
    """

    mu: float = 398600.4418  # km^3/s^2
    j2_coeff: float = 1.75553e10  # ~ J2*mu*Re^2, km^5/s^2
    textbook_j2: bool = False
    # Substep used when bridging knot gaps inside the dynamics factor.
    # The reference CPU path integrates at 1 s (BA_utils.py:73-87); its GPU
    # path hops at up to 100 s per RK4 step (BA_utils.py:52-71).
    factor_max_substep: float = 100.0
    factor_num_hops: int = 16  # >= ceil(max_gap / substep) + 1


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Levenberg-Marquardt BA solver.

    Schedules replicate estimation/BA/BA_filtering.py:11-12,22-26,50-79 and
    estimation/od_pipe.py:918,377,973.
    """

    quat_coeff: float = 100.0
    vel_coeff: float = 100.0
    sigma_scale: float = 10000.0  # Sigma = min(sigma_scale*(iter+1)^2, sigma_max)
    sigma_max: float = 1.0e6
    lambda_init: float = 1.0e-4
    lambda_max: float = 1.0e4
    lambda_growth: float = 10.0
    max_lambda_tries: int = 9  # 1e-4 * 10^8 = 1e4
    num_iters_streaming: int = 20
    num_iters_full_batch: int = 100
    num_init_iters: int = 10  # vision-only warm start (od_pipe.py:377,1038)
    # prior factor coefficients (BA_filtering.py:109-110)
    quat_coeff_prior: float = 1.0
    vel_coeff_prior: float = 1.0


@dataclasses.dataclass(frozen=True)
class GatingConfig:
    """Measurement gating (estimation/od_pipe.py:930)."""

    u_min: float = 0.0
    u_max: float = 4700.0
    v_min: float = 0.0
    v_max: float = 2600.0
    max_reproj_err_px: float = 1000.0
    min_confidence: float = 0.8


@dataclasses.dataclass(frozen=True)
class WindowConfig:
    """Streaming window / knot policy.

    Filler knots every 1000 s (od_pipe.py:216-228); windows split at a
    detection gap > 200 s after > 4 contiguous detections
    (od_pipe.py:898-905, gap "contiguous" threshold 100 s).
    """

    knot_stride_s: int = 1000
    contiguous_gap_s: int = 100
    split_gap_s: int = 200
    min_contiguous: int = 4


@dataclasses.dataclass(frozen=True)
class InitNoiseConfig:
    """Initial-error regime for OD (od_pipe.py:962-964)."""

    position_sigma_km: float = 100.0
    orientation_sigma_rad: float = 0.2
    velocity_rel_sigma: float = 0.1


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Trajectory / detection simulation.

    Orbit regimes: polar or ISS-like, 525-575 km altitude, e<=0.01
    (sim/orbit_gen.py:350-373); sequences 10800 s @ 1 Hz
    (sim/nadir_sim.py:140).  Detection noise calibrated to the <10 px
    detector acceptance (eval/eval_landmarks.py:21,281).
    """

    duration_s: int = 10800
    dt_s: float = 1.0
    det_noise_px: float = 4.0
    det_conf_low: float = 0.5
    det_conf_high: float = 1.0
    min_visible_landmarks: int = 3  # sim/SatCam.py:249-262
    max_dets_per_frame: int = 8


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    camera: CameraConfig = dataclasses.field(default_factory=CameraConfig)
    dynamics: DynamicsConfig = dataclasses.field(default_factory=DynamicsConfig)
    solver: SolverConfig = dataclasses.field(default_factory=SolverConfig)
    gating: GatingConfig = dataclasses.field(default_factory=GatingConfig)
    window: WindowConfig = dataclasses.field(default_factory=WindowConfig)
    init_noise: InitNoiseConfig = dataclasses.field(default_factory=InitNoiseConfig)
    sim: SimConfig = dataclasses.field(default_factory=SimConfig)
    # Compute dtype for rollouts/factors.  f64 requires jax_enable_x64 (CPU
    # validation); f32 is the TPU production setting (states are centered /
    # kept in km so f32 keeps ~1 m resolution at LEO radii).
    dtype: str = "float64"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)


DEFAULT_CONFIG = PipelineConfig()

# The reference camera's intrinsics (fx, fy, cx, cy) — equals
# CameraConfig().intrinsics and row 0 of estimation/landmarks/intrinsics.csv.
# Import this instead of re-typing the literal.
REFERENCE_INTRINSICS = tuple(CameraConfig().intrinsics)
