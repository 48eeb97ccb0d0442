"""EKF-style orbit determination: lax.scan filter over the knot sequence.

The reference has no standalone EKF, but its covariance machinery is exactly
EKF propagation (propagate_dynamics_cov_init, BA_utils.py:227-248:
per-step Jacobians J Σ Jᵀ + Q for the 6-dim pos/vel block and the 3-dim
rotation block).  This module completes it into a full filter
(BASELINE.json config 1: "EKF-only OD"): RK4 prediction with forward-
sensitivity covariance propagation + per-knot pixel-measurement updates
with the analytic reprojection Jacobian.

The whole filter is a single lax.scan over knots (static max-obs-per-knot
budget), so it jits once and runs resident on device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vinsat_tpu.core import dynamics, quat
from vinsat_tpu.estimation import factors


class EKFState(NamedTuple):
    state: jnp.ndarray  # (10,) [pos, quat, vel]
    cov: jnp.ndarray  # (9, 9) tangent covariance


class EKFConfig(NamedTuple):
    meas_noise_px: float = 5.0
    process_noise_pos: float = 1e-6  # km^2 per propagation
    process_noise_phi: float = 1e-8
    process_noise_vel: float = 1e-8
    num_hops: int = 16
    max_substep: float = 100.0
    max_obs_per_knot: int = 16


def predict(ekf: EKFState, gap, cum_rot, cfg: EKFConfig = EKFConfig()) -> EKFState:
    """Propagate state + covariance across one inter-knot gap.

    pos/vel block via the 6x6 transition Jacobian from the hop scan
    (propagate_orbit_dynamics_cov_init, BA_utils.py:138-157); rotation block
    via the rotation Jacobian R(dq)ᵀ-style transport (compute_rot_jacobian,
    BA_utils.py:202-205).
    """
    s = ekf.state
    pos, q, vel = s[:3], s[3:7], s[7:10]
    p1, v1, J = dynamics.propagate_gaps_with_jacobian(
        pos[None], vel[None], gap[None], num_hops=cfg.num_hops,
        max_substep=cfg.max_substep,
    )
    q1 = quat.normalize(quat.multiply(q, cum_rot))
    J6 = J[0]
    # rotation covariance transported by R(cum_rot)^T
    Rc = quat.to_matrix(cum_rot).T

    F = jnp.zeros((9, 9), s.dtype)
    F = F.at[0:3, 0:3].set(J6[0:3, 0:3])
    F = F.at[0:3, 6:9].set(J6[0:3, 3:6])
    F = F.at[6:9, 0:3].set(J6[3:6, 0:3])
    F = F.at[6:9, 6:9].set(J6[3:6, 3:6])
    F = F.at[3:6, 3:6].set(Rc)

    Q = jnp.diag(
        jnp.concatenate(
            [
                jnp.full(3, cfg.process_noise_pos, s.dtype),
                jnp.full(3, cfg.process_noise_phi, s.dtype),
                jnp.full(3, cfg.process_noise_vel, s.dtype),
            ]
        )
    ) * jnp.maximum(gap, 1.0)
    cov = F @ ekf.cov @ F.T + Q
    state = jnp.concatenate([p1[0], q1, v1[0]])
    return EKFState(state, cov)


def update(ekf: EKFState, lm_xyz, uv_meas, obs_valid, intrinsics,
           cfg: EKFConfig = EKFConfig()) -> EKFState:
    """Measurement update with up to max_obs_per_knot pixel observations.

    Uses the TRUE tangent reprojection Jacobian (the factor's Gq-lift
    convention is 2x the exp-map differential on the phi block; divide).
    Invalid observations get infinite noise (zero gain).
    """
    D = uv_meas.shape[0]
    st = ekf.state[None].repeat(1, axis=0)
    rp = factors.reprojection_factor(
        ekf.state[None], lm_xyz, jnp.zeros(D, dtype=jnp.int32), intrinsics
    )
    H = rp.J.reshape(D * 2, 9)
    H = H.at[:, 3:6].multiply(0.5)
    r = (uv_meas - rp.uv).reshape(D * 2)
    rmask = jnp.repeat(obs_valid, 2)
    Rdiag = jnp.where(rmask > 0, cfg.meas_noise_px**2, 1e18)

    S = H @ ekf.cov @ H.T + jnp.diag(Rdiag)
    K = ekf.cov @ H.T @ jnp.linalg.inv(S)
    dx = K @ (r * rmask)
    pos = ekf.state[:3] + dx[0:3]
    q = quat.box_plus(ekf.state[3:7], dx[3:6])
    vel = ekf.state[7:10] + dx[6:9]
    cov = (jnp.eye(9, dtype=ekf.cov.dtype) - K @ H) @ ekf.cov
    return EKFState(jnp.concatenate([pos, q, vel]), cov)


def run_filter(state0, cov0, gaps, cum_rots, lm_xyz_per_knot, uv_per_knot,
               obs_valid_per_knot, intrinsics,
               cfg: EKFConfig = EKFConfig(), return_predicted: bool = False):
    """Filter over N knots in one lax.scan.

    gaps (N,): gap BEFORE each knot (gaps[0]=0); per-knot observation
    buffers are (N, max_obs, ...).  Returns (N, 10) filtered states and
    (N, 9, 9) covariances (plus the predicted-state/cov sequences when
    return_predicted, for the RTS smoother).
    """

    def step(carry, inp):
        ekf = carry
        gap, crot, lm, uv, valid = inp
        pred = predict(ekf, gap, crot, cfg)
        ekf = update(pred, lm, uv, valid, intrinsics, cfg)
        return ekf, (ekf.state, ekf.cov, pred.state, pred.cov)

    init = EKFState(state0, cov0)
    _, (states, covs, pstates, pcovs) = jax.lax.scan(
        step, init, (gaps, cum_rots, lm_xyz_per_knot, uv_per_knot,
                     obs_valid_per_knot)
    )
    if return_predicted:
        return states, covs, pstates, pcovs
    return states, covs


def _transition_F(state, gap, cum_rot, cfg: EKFConfig):
    """9x9 tangent transition Jacobian of `predict` at `state`."""
    pos, vel = state[:3], state[7:10]
    _, _, J = dynamics.propagate_gaps_with_jacobian(
        pos[None], vel[None], gap[None], num_hops=cfg.num_hops,
        max_substep=cfg.max_substep,
    )
    J6 = J[0]
    Rc = quat.to_matrix(cum_rot).T
    F = jnp.zeros((9, 9), state.dtype)
    F = F.at[0:3, 0:3].set(J6[0:3, 0:3])
    F = F.at[0:3, 6:9].set(J6[0:3, 3:6])
    F = F.at[6:9, 0:3].set(J6[3:6, 0:3])
    F = F.at[6:9, 6:9].set(J6[3:6, 3:6])
    F = F.at[3:6, 3:6].set(Rc)
    return F


def run_smoother(state0, cov0, gaps, cum_rots, lm_xyz_per_knot, uv_per_knot,
                 obs_valid_per_knot, intrinsics,
                 cfg: EKFConfig = EKFConfig()):
    """Rauch–Tung–Striebel smoother: forward EKF + backward pass.

    Completes the filter family beyond the reference's forward-only
    machinery: the smoothed estimate conditions every knot on ALL
    observations (the fixed-interval analog of the batch BA).  Backward
    recursion in tangent space:
        G_t = P_t F_{t+1}^T P⁻_{t+1}⁻¹
        x_s_t = x_t ⊞ G_t (x_s_{t+1} ⊟ x⁻_{t+1})
        P_s_t = P_t + G_t (P_s_{t+1} - P⁻_{t+1}) G_t^T
    """
    states, covs, pstates, pcovs = run_filter(
        state0, cov0, gaps, cum_rots, lm_xyz_per_knot, uv_per_knot,
        obs_valid_per_knot, intrinsics, cfg, return_predicted=True,
    )
    N = states.shape[0]

    def boxminus(xa, xb):
        dp = xa[:3] - xb[:3]
        dv = xa[7:10] - xb[7:10]
        dq = quat.multiply(quat.conjugate(xb[3:7]), xa[3:7])
        return jnp.concatenate([dp, quat.log(quat.normalize(dq)), dv])

    def boxplus(x, d):
        return jnp.concatenate([
            x[:3] + d[:3],
            quat.box_plus(x[3:7], d[3:6]),
            x[7:10] + d[6:9],
        ])

    def back(carry, inp):
        xs_next, Ps_next = carry
        x_t, P_t, xp_next, Pp_next, gap_next, crot_next = inp
        F = _transition_F(x_t, gap_next, crot_next, cfg)
        G = P_t @ F.T @ jnp.linalg.inv(Pp_next)
        d = G @ boxminus(xs_next, xp_next)
        xs_t = boxplus(x_t, d)
        Ps_t = P_t + G @ (Ps_next - Pp_next) @ G.T
        return (xs_t, Ps_t), (xs_t, Ps_t)

    # iterate t = N-2 .. 0; inputs at index t use the t+1 predicted values
    inputs = (states[:-1], covs[:-1], pstates[1:], pcovs[1:], gaps[1:],
              cum_rots[1:])
    (_, _), (xs_rev, Ps_rev) = jax.lax.scan(
        back, (states[-1], covs[-1]), inputs, reverse=True
    )
    xs = jnp.concatenate([xs_rev, states[-1:]], axis=0)
    Ps = jnp.concatenate([Ps_rev, covs[-1:]], axis=0)
    return xs, Ps
