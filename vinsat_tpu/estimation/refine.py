"""Shooting-based terminal refinement: squeeze the open-loop tail.

After the last detection pass, the streaming driver propagates the terminal
knot state open-loop to the arc end (od_pipe.py:1045-1059); hours of
propagation amplify any terminal velocity/semi-major-axis error into km of
along-track drift (measured: median FINAL error 10.3 km on the 16-orbit
eval despite 16/16 reaching < 2 km mid-arc).

The knot-based BA solution is only *approximately* dynamically consistent
(the dynamics factor is a finite weight Σ ≤ σ_max, and the robust/annealing
schedules restart per window), so its terminal state is NOT the maximum-
likelihood orbit through all detections.  This module re-fits a SINGLE
6-dof initial condition (pos/vel at the first knot) by Gauss-Newton
shooting through the full RK4 dynamics against ALL gated observations —
the classic batch orbit-determination formulation — holding the streaming
solution's (strongly observed) attitudes fixed:

    min_{x_0}  Σ_m  conf_m · ‖uv_m − π(prop(x_0, t_{i_m}), q̂_{i_m})‖²

One lax.scan rolls the state AND the 6×6 sensitivity Φ_k = ∂x_k/∂x_0 down
the knot chain; the reprojection factor's analytic position Jacobian chains
with Φ, so each Gauss-Newton step is a single 6×6 solve.  The whole
refinement jits as one program (λ-damped accept loop, fixed trip count).

The refined terminal state feeds ONLY the tail propagation (and the
returned final states) — the recorded in-arc errors keep the streaming
estimates, preserving the time-to-threshold semantics.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vinsat_tpu.core import dynamics, quat
from vinsat_tpu.estimation import factors


class ShootingResult(NamedTuple):
    states_pv: jnp.ndarray  # (N, 6) refined [pos, vel] at every knot
    residual: jnp.ndarray  # final mean |r| (px)
    residual0: jnp.ndarray  # initial mean |r| (px) at the warm start


class RigidShootingResult(NamedTuple):
    states: jnp.ndarray  # (N, 10) refined [pos, quat, vel] at every knot
    residual: jnp.ndarray  # final mean |r| (px) of the rigid fit
    residual_in: jnp.ndarray  # mean |r| of the INPUT states (guard baseline)


def _rollout_with_sensitivity(x0, gaps, num_hops: int, max_substep: float):
    """Roll [pos, vel] down the knot chain, chaining the 6x6 transition
    Jacobians into the cumulative sensitivity Phi_k = d x_k / d x_0."""
    eye6 = jnp.eye(6, dtype=x0.dtype)

    def step(carry, gap):
        x, Phi = carry
        p1, v1, J = dynamics.propagate_gaps_with_jacobian(
            x[None, :3], x[None, 3:], gap[None], num_hops=num_hops,
            max_substep=max_substep)
        x1 = jnp.concatenate([p1[0], v1[0]])
        Phi1 = J[0] @ Phi
        return (x1, Phi1), (x1, Phi1)

    (_, _), (xs, Phis) = jax.lax.scan(step, (x0, eye6), gaps)
    xs = jnp.concatenate([x0[None], xs], axis=0)
    Phis = jnp.concatenate([eye6[None], Phis], axis=0)
    return xs, Phis


@functools.partial(jax.jit, static_argnames=("num_hops", "max_substep",
                                             "num_iters"))
def shooting_refine(states, gaps, lm_xyz, uv, conf, ii, obs_valid,
                    intrinsics, num_hops: int = 16,
                    max_substep: float = 100.0, num_iters: int = 20):
    """Gauss-Newton shooting fit of the 6-dof initial [pos, vel].

    states (N, 10): the streaming solution — warm start x_0 and the FIXED
    per-knot attitudes; gaps (N,) seconds to next knot (last unused);
    observations as in BAProblem (obs_valid masks padding).  Returns the
    refined per-knot [pos, vel] states and the residual diagnostics.
    """
    dtype = states.dtype
    N = states.shape[0]
    q_fix = states[:, 3:7]
    x0_init = jnp.concatenate([states[0, :3], states[0, 7:10]])
    w = conf * obs_valid

    def residuals(x0):
        xs, Phis = _rollout_with_sensitivity(x0, gaps[:-1], num_hops,
                                             max_substep)
        st10 = jnp.concatenate([xs[:, :3], q_fix, xs[:, 3:]], axis=-1)
        rp = factors.reprojection_factor(st10, lm_xyz, ii, intrinsics)
        r = (uv - rp.uv) * obs_valid[:, None]  # (M, 2)
        # chain: duv/dx0 = duv/dpos_k @ dpos_k/dx0
        Jm = jnp.einsum("mij,mjk->mik", rp.J[:, :, 0:3],
                        Phis[ii][:, 0:3, :])  # (M, 2, 6)
        return r, Jm, xs

    def mean_abs(r):
        return (jnp.abs(r) * w[:, None]).sum() / jnp.maximum(
            2.0 * w.sum(), 1.0)

    def gn_step(carry, _):
        x0, lam, best_x0, best_res = carry
        r, Jm, _ = residuals(x0)
        res = mean_abs(r)
        take = res < best_res
        best_x0 = jnp.where(take, x0, best_x0)
        best_res = jnp.where(take, res, best_res)
        JW = Jm * w[:, None, None]
        H = jnp.einsum("mki,mkj->ij", JW, Jm)
        g = jnp.einsum("mki,mk->i", JW, r)
        # Jacobi-scaled damped solve (pos ~1e3 km vs vel ~1 km/s scales)
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-30))
        Hs = H * s[:, None] * s[None, :] + lam * jnp.eye(6, dtype=dtype)
        dx = s * jnp.linalg.solve(Hs, s * g)
        x0_new = x0 + dx
        r1, _, _ = residuals(x0_new)
        accept = mean_abs(r1) < res
        x0 = jnp.where(accept, x0_new, x0)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-12), lam * 10.0)
        return (x0, lam, best_x0, best_res), res

    r0, _, _ = residuals(x0_init)
    res0 = mean_abs(r0)
    carry0 = (x0_init, jnp.asarray(1e-8, dtype), x0_init, res0)
    (x0, _, best_x0, best_res), _ = jax.lax.scan(
        gn_step, carry0, None, length=num_iters)
    # one final evaluation decides between the last accept and the best seen
    r_last, _, xs_last = residuals(x0)
    res_last = mean_abs(r_last)
    use_last = res_last <= best_res
    x0_out = jnp.where(use_last, x0, best_x0)
    _, _, xs = residuals(x0_out)
    return ShootingResult(states_pv=xs,
                          residual=jnp.minimum(res_last, best_res),
                          residual0=res0)


@functools.partial(jax.jit, static_argnames=("num_hops", "max_substep",
                                             "num_iters"))
def shooting_refine_rigid(states, gaps, cum_rot, lm_xyz, uv, conf, ii,
                          obs_valid, intrinsics, num_hops: int = 16,
                          max_substep: float = 100.0, num_iters: int = 24,
                          att_sigma: float = 1e-2):
    """9-dof shooting fit on the RIGID attitude chain: x0 = [pos, vel] (6)
    plus ONE initial-attitude correction delta (3).

    The angular-rate sequence is known (the same IMU integration the
    dynamics factor uses), so the physically admissible attitudes form a
    3-dof family  q_i(delta) = (q_0 ⊞ delta) ⊗ C_i  with C_i the prefix
    product of the per-gap cumulative rotations.  The streaming solution's
    per-knot attitudes wiggle around this chain with the pixel noise
    (measured ~8e-4 rad), and fixing them in the 6-dof shooting fit turns
    that noise into a reprojection BIAS of ~f·dtheta ≈ 3 px that the fit
    absorbs into pos/vel — the dominant weak-tail error (measured on the
    16-orbit eval: seed 13 fixed-att fit 147 km vs 8.4 km CRLB; this fit
    14.7 km.  docs/BENCHMARKS.md "rigid-chain refinement").

    Perturbation transport: (q0 ⊗ exp(d)) ⊗ C_i = q_i ⊞ (R(C_i)^T d), so
    the reprojection attitude Jacobian chains with R(C_i)^T.  delta
    carries a weak prior (att_sigma, rad) that keeps the extra 3 dof
    conditioned when a window barely observes attitude.

    Returns the refined FULL states (pos/quat/vel; quats are the corrected
    rigid chain), the fit residual, and the residual of the INPUT states —
    the rigid fit has fewer dof than per-knot streaming attitudes so its
    converged residual sits slightly ABOVE the input's (it cannot fit the
    attitude noise); acceptance is a ratio test, not an improvement test.
    """
    dtype = states.dtype
    N = states.shape[0]
    x0_init = jnp.concatenate([states[0, :3], states[0, 7:10]])
    w = conf * obs_valid
    inv_s2 = jnp.asarray(1.0 / (att_sigma ** 2), dtype)

    # prefix chain C_i: C_0 = I, C_{i+1} = C_i ⊗ c_i (associative_scan)
    ident = jnp.zeros((1, 4), dtype).at[0, 3].set(1.0)
    C = jax.lax.associative_scan(
        quat.multiply, jnp.concatenate([ident, cum_rot[:-1]], axis=0))
    Rt = jnp.swapaxes(quat.to_matrix(C), -1, -2)  # R(C_i)^T (N, 3, 3)
    q_chain = quat.normalize(quat.multiply(
        jnp.broadcast_to(states[0, 3:7], (N, 4)), C))

    def residuals(x0, delta):
        xs, Phis = _rollout_with_sensitivity(x0, gaps[:-1], num_hops,
                                             max_substep)
        eps = jnp.einsum("nij,j->ni", Rt, delta)
        q = quat.box_plus(q_chain, eps)
        st10 = jnp.concatenate([xs[:, :3], q, xs[:, 3:]], axis=-1)
        rp = factors.reprojection_factor(st10, lm_xyz, ii, intrinsics)
        r = (uv - rp.uv) * obs_valid[:, None]
        Jx = jnp.einsum("mij,mjk->mik", rp.J[:, :, 0:3],
                        Phis[ii][:, 0:3, :])
        Jd = jnp.einsum("mij,mjk->mik", rp.J[:, :, 3:6], Rt[ii])
        return r, jnp.concatenate([Jx, Jd], axis=-1), st10

    def obj(r, delta):
        return 0.5 * ((r ** 2) * w[:, None]).sum() \
            + 0.5 * inv_s2 * (delta ** 2).sum()

    def mean_abs(r):
        return (jnp.abs(r) * w[:, None]).sum() / jnp.maximum(
            2.0 * w.sum(), 1.0)

    def gn_step(carry, _):
        th, lam, bth, bobj = carry
        r, J, _ = residuals(th[:6], th[6:])
        f = obj(r, th[6:])
        take = f < bobj
        bth = jnp.where(take, th, bth)
        bobj = jnp.where(take, f, bobj)
        JW = J * w[:, None, None]
        H = jnp.einsum("mki,mkj->ij", JW, J)
        H = H.at[6:, 6:].add(inv_s2 * jnp.eye(3, dtype=dtype))
        g = jnp.einsum("mki,mk->i", JW, r)
        g = g.at[6:].add(-inv_s2 * th[6:])
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-30))
        Hs = H * s[:, None] * s[None, :] + lam * jnp.eye(9, dtype=dtype)
        dth = s * jnp.linalg.solve(Hs, s * g)
        thn = th + dth
        r1, _, _ = residuals(thn[:6], thn[6:])
        acc = obj(r1, thn[6:]) < f
        th = jnp.where(acc, thn, th)
        lam = jnp.where(acc, jnp.maximum(lam * 0.3, 1e-12), lam * 10.0)
        return (th, lam, bth, bobj), f

    # guard baseline: the INPUT states' residual (streaming attitudes)
    rp_in = factors.reprojection_factor(states, lm_xyz, ii, intrinsics)
    res_in = mean_abs((uv - rp_in.uv) * obs_valid[:, None])

    th0 = jnp.concatenate([x0_init, jnp.zeros(3, dtype)])
    r0, _, _ = residuals(th0[:6], th0[6:])
    carry0 = (th0, jnp.asarray(1e-8, dtype), th0, obj(r0, th0[6:]))
    (th, _, bth, bobj), _ = jax.lax.scan(gn_step, carry0, None,
                                         length=num_iters)
    r_l, _, _ = residuals(th[:6], th[6:])
    th = jnp.where(obj(r_l, th[6:]) <= bobj, th, bth)
    r, _, st10 = residuals(th[:6], th[6:])
    return RigidShootingResult(states=st10, residual=mean_abs(r),
                               residual_in=res_in)


@functools.partial(jax.jit, static_argnames=("num_hops", "max_substep",
                                             "num_iters"))
def refine_states_device(states, gaps, lm_xyz, uv, conf, ii, obs_valid,
                         intrinsics, num_hops: int = 16,
                         max_substep: float = 100.0, num_iters: int = 20):
    """Device-only refinement with the fallback folded in: returns (N, 10)
    states whose pos/vel are shooting-refined iff the fit is finite AND
    improves the pixel residual, else the input states (graceful
    degradation, window.attempt's policy — but as a device select, so the
    async fast path can chain it with NO host sync)."""
    out = shooting_refine(states, gaps, lm_xyz, uv, conf, ii, obs_valid,
                          intrinsics, num_hops=num_hops,
                          max_substep=max_substep, num_iters=num_iters)
    ok = (jnp.isfinite(out.states_pv).all()
          & (out.residual <= out.residual0))
    pv0 = jnp.concatenate([states[:, :3], states[:, 7:10]], axis=-1)
    pv = jnp.where(ok, out.states_pv, pv0)
    return jnp.concatenate([pv[:, :3], states[:, 3:7], pv[:, 3:]], axis=-1)


@functools.partial(jax.jit, static_argnames=("num_hops", "max_substep",
                                             "num_iters", "num_iters_rigid"))
def refine_states_device_full(states, gaps, cum_rot, lm_xyz, uv, conf, ii,
                              obs_valid, intrinsics, num_hops: int = 16,
                              max_substep: float = 100.0,
                              num_iters: int = 20,
                              num_iters_rigid: int = 24,
                              att_sigma=1e-2, ratio=1.3):
    """Device-only tail refinement with BOTH fits and the selection policy
    folded in (no host sync — async-fast-path safe):

      1. 9-dof RIGID-chain fit (shooting_refine_rigid): x0 + one initial-
         attitude correction transported through the known angular-rate
         chain.  Accepted by the documented RATIO test — finite AND
         residual <= ratio * residual_in (the input states' residual).
         The rigid chain has fewer dof than per-knot streaming attitudes,
         so its converged residual sits slightly ABOVE the input's even
         when the fit is excellent; an improvement test would always
         reject it.  Preferred when accepted: fixing noisy per-knot
         attitudes in the 6-dof fit turns ~8e-4 rad attitude noise into a
         ~3 px reprojection bias absorbed into pos/vel — the dominant
         weak-tail error (seed 13: 147 km 6-dof vs 14.7 km rigid against
         an 8.1 km CRLB).
      2. 6-dof fixed-attitude fit (shooting_refine) as the fallback,
         accepted on its original improvement test.
      3. The input states when neither passes.
    """
    out9 = shooting_refine_rigid(
        states, gaps, cum_rot, lm_xyz, uv, conf, ii, obs_valid, intrinsics,
        num_hops=num_hops, max_substep=max_substep,
        num_iters=num_iters_rigid, att_sigma=att_sigma)
    out6 = shooting_refine(states, gaps, lm_xyz, uv, conf, ii, obs_valid,
                           intrinsics, num_hops=num_hops,
                           max_substep=max_substep, num_iters=num_iters)
    ok6 = (jnp.isfinite(out6.states_pv).all()
           & (out6.residual <= out6.residual0))
    pv0 = jnp.concatenate([states[:, :3], states[:, 7:10]], axis=-1)
    pv6 = jnp.where(ok6, out6.states_pv, pv0)
    st6 = jnp.concatenate([pv6[:, :3], states[:, 3:7], pv6[:, 3:]], axis=-1)
    ok9 = (jnp.isfinite(out9.states).all()
           & (out9.residual <= ratio * jnp.maximum(out9.residual_in, 1e-6)))
    return jnp.where(ok9, out9.states, st6)


def refine_terminal(final_states: np.ndarray, gaps: np.ndarray,
                    lm_xyz: np.ndarray, uv: np.ndarray, conf: np.ndarray,
                    ii: np.ndarray, intrinsics: np.ndarray, dtype,
                    max_substep: float = 100.0, num_iters: int = 20,
                    knot_bucket: int = 16, obs_bucket: int = 64,
                    cum_rot: np.ndarray = None,
                    att_sigma: float = 1e-2,
                    ratio: float = 1.3) -> np.ndarray:
    """Host wrapper: refine the streaming solution over its full knot span
    and return (N, 10) states with the shooting-refined pos/vel and the
    original attitudes (cum_rot=None), or the full rigid-chain selection
    policy (cum_rot given — refine_states_device_full).

    Inputs are padded to bucketed shapes (window.bucket) so the jitted
    refinement compiles once per bucket, not once per sequence — padded
    knots carry gap 0 (zero-length propagation) after the real span and
    padded observations are obs_valid-masked, so result[:N] is exact."""
    from vinsat_tpu.estimation.window import bucket

    jd = jnp.dtype(dtype)
    N = final_states.shape[0]
    M = len(ii)
    n_pad = bucket(N, knot_bucket)
    m_pad = bucket(max(M, 1), obs_bucket, obs_bucket)
    st = np.zeros((n_pad, 10))
    st[:, 6] = 1.0
    st[:N] = final_states
    g = np.zeros(n_pad)
    g[:N] = gaps
    g[N - 1:] = 0.0
    lm = np.zeros((m_pad, 3))
    lm[:M] = lm_xyz
    uvp = np.zeros((m_pad, 2))
    uvp[:M] = uv
    cf = np.zeros(m_pad)
    cf[:M] = conf
    iip = np.zeros(m_pad, np.int32)
    iip[:M] = ii
    ov = np.zeros(m_pad)
    ov[:M] = 1.0
    hops = int(np.ceil(max(gaps.max(), 1.0) / max_substep)) + 1
    if cum_rot is not None:
        cr = np.zeros((n_pad, 4))
        cr[:, 3] = 1.0
        cr[:N] = cum_rot
        out = refine_states_device_full(
            jnp.asarray(st, jd), jnp.asarray(g, jd), jnp.asarray(cr, jd),
            jnp.asarray(lm, jd), jnp.asarray(uvp, jd), jnp.asarray(cf, jd),
            jnp.asarray(iip), jnp.asarray(ov, jd),
            jnp.asarray(intrinsics, jd), num_hops=hops,
            max_substep=max_substep, num_iters=num_iters,
            att_sigma=jnp.asarray(att_sigma, jd),
            ratio=jnp.asarray(ratio, jd),
        )
    else:
        out = refine_states_device(
            jnp.asarray(st, jd), jnp.asarray(g, jd), jnp.asarray(lm, jd),
            jnp.asarray(uvp, jd), jnp.asarray(cf, jd), jnp.asarray(iip),
            jnp.asarray(ov, jd), jnp.asarray(intrinsics, jd),
            num_hops=hops, max_substep=max_substep, num_iters=num_iters,
        )
    return np.asarray(out)[:N]
