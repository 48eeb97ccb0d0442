"""EKF+BA hybrid streaming (BASELINE config 3's "EKF+BA hybrid").

The reference composes its covariance machinery with BA only implicitly
(BA_reg consumes a propagated prior, BA_filtering.py:100-210 +
BA_utils.py:227-248) and its config-3 wording asks for an explicit hybrid.
Here the composition is:

  1. between windows, the EKF *predict* chain propagates the last window's
     posterior (state + 9x9 tangent covariance from the trailing hessian)
     knot-by-knot across the detection gap — same dynamics as
     propagate_dynamics_cov_init but as a single lax.scan;
  2. the EKF *update* chain then refines the propagated states with the new
     window's own pixel observations (a cheap O(N) pre-solve) — this is the
     filter half of the hybrid, giving BA a warm start already consistent
     with the new measurements;
  3. window BA runs as BA_reg from that warm start with the ANCHOR-only
     marginal prior (the previous window's Schur-complement marginal).
     Deliberately NOT per-knot EKF-posterior priors: the EKF update in
     step 2 already consumed this window's detections, so anchoring BA —
     which re-observes the same detections — at the EKF posterior
     information would double-count measurement information (an
     overconfident prior).  The anchor marginal carries exactly the
     cross-gap information and nothing of the new window's data.

Used by estimation/window.stream_orbit when
StreamingConfig.use_ekf_hybrid=True, and by configs/run_configs.py config 3.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from vinsat_tpu.estimation import ba, ekf


def build_knot_obs_buffers(graph, gt, t_init: int, t_final: int,
                           max_obs: int = 8
                           ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fixed-budget per-knot observation buffers for knots
    [t_init, t_final): (Nw, D, 3) landmark ECI, (Nw, D, 2) uv, (Nw, D)
    valid."""
    Nw = t_final - t_init
    lm = np.zeros((Nw, max_obs, 3))
    uv = np.zeros((Nw, max_obs, 2))
    ov = np.zeros((Nw, max_obs))
    fill = np.zeros(Nw, dtype=int)
    sel = np.nonzero((graph.ii >= t_init) & (graph.ii < t_final))[0]
    for j in sel:
        k = int(graph.ii[j]) - t_init
        if fill[k] >= max_obs:
            continue
        lm[k, fill[k]] = gt.landmarks_xyz[j]
        uv[k, fill[k]] = graph.uv[j]
        ov[k, fill[k]] = 1.0
        fill[k] += 1
    return lm, uv, ov


def ekf_refine_window(end_state: np.ndarray, last_hessian: np.ndarray,
                      knot_t: np.ndarray, t_init: int, t_final: int,
                      cum_rot: np.ndarray, graph, gt, intrinsics,
                      dtype, num_hops: int, max_substep: float = 100.0,
                      meas_noise_px: float = 5.0, max_obs: int = 8,
                      pad_to: int = 0, return_prior: bool = False):
    """EKF predict+update pass over the new knots [t_init, t_final).

    end_state (10,): previous window's terminal posterior state;
    last_hessian (9, 9): its information matrix ([pos, phi, vel] tangent);
    cum_rot (N, 4): global per-gap IMU rotations (cum_rot[i] spans knot
    i -> i+1).

    Returns the filtered states (Nw, 10).  With return_prior=True also
    returns a PriorState over the Nw knots with information = inverse EKF
    posterior covariance — NOT used by the streaming hybrid (it would
    double-count the window's detections, see module docstring); available
    for compositions where BA does not re-observe the same measurements.
    """
    jd = jnp.dtype(dtype)
    Nw = t_final - t_init
    n_pad = max(pad_to, Nw)

    gaps_before = (knot_t[t_init:t_final]
                   - knot_t[t_init - 1:t_final - 1]).astype(np.float64)
    cum_before = np.asarray(cum_rot)[t_init - 1:t_final - 1]
    lm, uv, ov = build_knot_obs_buffers(graph, gt, t_init, t_final, max_obs)

    gb = np.zeros(n_pad)
    gb[:Nw] = gaps_before
    cb = np.zeros((n_pad, 4))
    cb[:, 3] = 1.0
    cb[:Nw] = cum_before
    lmp = np.zeros((n_pad, max_obs, 3))
    lmp[:Nw] = lm
    uvp = np.zeros((n_pad, max_obs, 2))
    uvp[:Nw] = uv
    ovp = np.zeros((n_pad, max_obs))
    ovp[:Nw] = ov

    # posterior covariance of the previous window's terminal knot
    H = np.asarray(last_hessian, dtype=np.float64)
    H = H + 1e-9 * np.eye(9)
    cov0 = np.linalg.inv(H)

    cfg = ekf.EKFConfig(meas_noise_px=meas_noise_px, num_hops=num_hops,
                        max_substep=max_substep, max_obs_per_knot=max_obs)
    states, covs = ekf.run_filter(
        jnp.asarray(end_state, jd), jnp.asarray(cov0, jd),
        jnp.asarray(gb, jd), jnp.asarray(cb, jd), jnp.asarray(lmp, jd),
        jnp.asarray(uvp, jd), jnp.asarray(ovp, jd),
        jnp.asarray(np.asarray(intrinsics), jd), cfg,
    )
    states = np.asarray(states)[:Nw]
    if not return_prior:
        return states

    # per-knot prior information from the EKF posterior
    covs = np.asarray(covs, dtype=np.float64)[:Nw]
    covs = covs + 1e-9 * np.eye(9)[None]
    H9 = np.linalg.inv(covs)
    H_state = np.zeros((Nw, 6, 6))
    H_state[:, :3, :3] = H9[:, 0:3, 0:3]
    H_state[:, :3, 3:] = H9[:, 0:3, 6:9]
    H_state[:, 3:, :3] = H9[:, 6:9, 0:3]
    H_state[:, 3:, 3:] = H9[:, 6:9, 6:9]
    H_rot = H9[:, 3:6, 3:6]

    prior = ba.PriorState(
        prop_states=jnp.asarray(states, jd),
        H_state=jnp.asarray(H_state, jd),
        H_rot=jnp.asarray(H_rot, jd),
        valid=jnp.ones(Nw, jd),
    )
    return states, prior
