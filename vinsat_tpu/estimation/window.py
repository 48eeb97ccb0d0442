"""Streaming orbit-determination driver (the system's main entry point).

Functional replica of streaming_version (estimation/od_pipe.py:911-1062):
windows split on detection gaps, each window solves a growing-prefix BA with
20 LM iterations (vision-only init for the first 10 of window 0), states are
RK4+quaternion propagated across inter-window gaps, and propagation errors /
end-of-window errors are recorded for the time-to-<5km metric.

TPU design:
  * the per-window 20-iteration LM solve is ONE jitted function
    (`solve_window`) — a lax.fori_loop over ba.ba_iteration; no host
    round-trips inside a window;
  * window shapes are padded to buckets so the solve compiles once per
    bucket, not per window;
  * host code only slices numpy arrays and sequences windows.
"""
from __future__ import annotations

import contextlib
import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vinsat_tpu.config import REFERENCE_INTRINSICS
from vinsat_tpu.core import dynamics, quat
from vinsat_tpu.estimation import ba, factors, ingest


def bucket(n: int, step: int = 16, minimum: int = 16) -> int:
    """Quarter-geometric bucket >= max(n, minimum, step): the next multiple
    of max(step, 2^floor(log2(n))/4).

    Growing-prefix windows would otherwise produce a new padded shape (and a
    fresh XLA compile) per window; geometric bucket growth caps the number
    of distinct compiled shapes at ~4*log2(N_total) while wasting at most
    25% padding (a pure power-of-two bucket can waste ~2x scan length,
    which dominates compile AND run time for the sequential block solve).
    `step` sets the minimum padding quantum (the knot_bucket/obs_bucket
    config knobs).
    """
    m = max(minimum, step, n)
    p = 1 << (m - 1).bit_length()  # next pow2 >= m
    q = max(minimum, step, p // 8)  # quarter of previous pow2 tier
    return ((m + q - 1) // q) * q


def _lm_loop(step_i, states0, lamda_init, init_iters, num_iters: int,
             params: ba.SolverParams):
    """Run the per-window LM iteration chain.

    params.max_iters <= num_iters: exactly num_iters iterations (the
    reference-exact fixed-count fori_loop, BA_filtering.py / od_pipe.py
    :1036-1040).  Otherwise the loop runs extra iterations past num_iters
    and returns the BEST-residual iterate (the raw chain oscillates after
    convergence under the λ warm-restart schedule):

      * conv_patience >= the extra budget (the default): ALWAYS run
        max_iters iterations — a static-trip-count fori_loop.  Measured on
        the seed-11 capture (TPU f32): residual-gated early stopping is
        UNRELIABLE on weakly-observable windows — the error keeps
        improving 9.2 km -> 1.65 km between iterations 40 and 60 while
        the residual moves < 1%, and an early-stopped chain returned a
        30.4 km iterate where run-to-60 returns 1.65 km.
      * conv_patience < the extra budget: opt-in residual-gated early
        stop (cheaper) — keep iterating while the best accepted residual
        improved by > conv_rtol within the last conv_patience iterations.

    The best-residual tracker resets when the vision-only init phase ends
    (the residual metric changes when the dynamics factor switches on, so
    the init-phase best is incomparable).

    step_i(i, states, lam) -> BAStep.  Returns (states, lamda,
    last_hessian, mean_residual).
    """
    dtype = states0.dtype
    init = (states0, jnp.asarray(lamda_init, dtype),
            jnp.zeros((9, 9), dtype), jnp.zeros((), dtype))

    if params.max_iters <= num_iters:
        def body(i, carry):
            states, lam, last_h, _ = carry
            step = step_i(i, states, lam)
            return (step.states, step.lamda_init, step.last_hessian,
                    step.mean_residual)

        return jax.lax.fori_loop(0, num_iters, body, init)

    init_iters = jnp.asarray(init_iters)

    if params.conv_patience >= params.max_iters - num_iters:
        # run-to-max + best-iterate: static trip count
        def body_f(i, carry):
            (states, lam, _, _), best_out = carry
            best_states, best_h, best_res = best_out
            step = step_i(i, states, lam)
            res = step.mean_residual
            take = (i == init_iters) | (res < best_res)
            best_out = (
                jnp.where(take, step.states, best_states),
                jnp.where(take, step.last_hessian, best_h),
                jnp.where(take, res, best_res),
            )
            return ((step.states, step.lamda_init, step.last_hessian, res),
                    best_out)

        carry0 = (init, (states0, jnp.zeros((9, 9), dtype),
                         jnp.asarray(jnp.inf, dtype)))
        (_, lam_f, _, _), (bst, bh, bres) = jax.lax.fori_loop(
            0, params.max_iters, body_f, carry0)
        return (bst, lam_f, bh, bres)

    def cond(carry):
        i, _, _, since = carry
        return (i < num_iters) | ((i < params.max_iters)
                                  & (since < params.conv_patience))

    def body(carry):
        i, (states, lam, _, _), best_out, since = carry
        best_states, best_h, best_res = best_out
        step = step_i(i, states, lam)
        res = step.mean_residual
        # metric switch: dynamics factor turns on at i == init_iters, and
        # the init-phase (vision-only) residuals are incomparable with the
        # full metric — reset the best tracker there
        switch = i == init_iters
        take = switch | (res < best_res)
        best_states = jnp.where(take, step.states, best_states)
        best_h = jnp.where(take, step.last_hessian, best_h)
        best_res = jnp.where(take, res, best_res)
        improved = res < best_out[2] * (1.0 - params.conv_rtol)
        since = jnp.where(switch | improved, 0, since + 1)
        out = (step.states, step.lamda_init, step.last_hessian, res)
        return (i + 1, out, (best_states, best_h, best_res), since)

    carry0 = (jnp.asarray(0, jnp.int32), init,
              (states0, jnp.zeros((9, 9), dtype), jnp.asarray(jnp.inf, dtype)),
              jnp.asarray(0, jnp.int32))
    _, (_, lam_f, _, _), (bst, bh, bres), _ = jax.lax.while_loop(
        cond, body, carry0)
    return (bst, lam_f, bh, bres)


def _solve_window(states0, prob: ba.BAProblem, lamda_init, init_iters,
                  num_iters: int, params: ba.SolverParams = ba.SolverParams(),
                  sched_offset=0):
    """num_iters LM iterations over one (padded) window (unjitted impl;
    jitted as `solve_window`, vmapped directly by `solve_window_batch`).

    init_iters: number of leading vision-only iterations (od_pipe.py:1038
    uses 10 for the first window, 0 afterwards).  The schedule index passed
    to α/Σ is iteration + sched_offset: 0-based for streaming (BA(iter,...),
    od_pipe.py:1038), -init_iters for the full-batch path (BA(i-10, ...),
    od_pipe.py:377).  params.max_iters > num_iters adds convergence-gated
    extra iterations (see _lm_loop).

    Returns (states, lamda, last_hessian, mean_residual) — the last is the
    accepted trial residual of the final iteration (the per-window
    convergence diagnostic logged by metrics).
    """

    def step_i(i, states, lam):
        return ba.ba_iteration(
            i + sched_offset, states, prob, lam, params=params,
            initialize=(i < init_iters),
        )

    return _lm_loop(step_i, states0, lamda_init, init_iters, num_iters,
                    params)


solve_window = jax.jit(_solve_window, static_argnames=("num_iters", "params"))


@functools.partial(jax.jit, static_argnames=("num_iters", "params"))
def solve_window_batch(states0_b, prob_b: ba.BAProblem, lamda_b, init_iters,
                       num_iters: int,
                       params: ba.SolverParams = ba.SolverParams(),
                       sched_offset=0):
    """vmapped constellation solve: a batch of same-bucket windows solved
    in one jit call (BASELINE.json config 4 — the collective-free
    data-parallel analog of the reference's process_map fan-out).

    states0_b (B, N, 10); prob_b fields carry a leading B axis except
    intrinsics (shared); lamda_b (B,).
    """

    def one(states0, prob, lam):
        return _solve_window(states0, prob, lam, init_iters,
                             num_iters, params, sched_offset)

    in_prob = ba.BAProblem(
        gaps=0, cum_rot=0, landmarks_xyz=0, landmarks_uv=0, conf=0, ii=0,
        obs_valid=0, knot_valid=0, pair_valid=0, intrinsics=None,
    )
    return jax.vmap(one, in_axes=(0, in_prob, 0))(states0_b, prob_b, lamda_b)


@functools.partial(jax.jit, static_argnames=("num_iters", "params"))
def solve_window_reg(states0, prob: ba.BAProblem, prior: ba.PriorState,
                     lamda_init, num_iters: int,
                     params: ba.SolverParams = ba.SolverParams()):
    """num_iters regularized LM iterations (BA_reg path: the streaming
    variant with a propagated window-marginal prior,
    od_pipe.py:893/BA_filtering.py:100-210).  params.max_iters > num_iters
    adds convergence-gated extra iterations (see _lm_loop)."""

    def step_i(i, states, lam):
        return ba.ba_reg_iteration(
            i, states, prob, prior, lam, params=params, initialize=False,
        )

    return _lm_loop(step_i, states0, lamda_init, 0, num_iters, params)


def _propagate_impl(state10, omega_seq, length, max_len: int):
    """Dense 1 Hz propagation of one state over `length` steps (padded to
    max_len), rolling the quaternion with the IMU rotations.

    Equivalent of propagate_dynamics_init (BA_utils.py:114-129).  Returns
    (max_len+1, 10); entries past `length` hold the final state.
    """
    pos, q, vel = state10[:3], state10[3:7], state10[7:10]
    x0 = jnp.concatenate([pos, vel])

    def body(carry, inp):
        x, qq = carry
        om, k = inp
        active = k < length
        xn = dynamics.rk4_step(x, 1.0)
        qn = quat.multiply(qq, quat.exp(om))
        x = jnp.where(active, xn, x)
        qq = jnp.where(active, qn, qq)
        return (x, qq), (x, qq)

    ks = jnp.arange(max_len)
    (_, _), (xs, qs) = jax.lax.scan(body, (x0, q), (omega_seq, ks))
    xs = jnp.concatenate([x0[None], xs], axis=0)
    qs = jnp.concatenate([q[None], qs], axis=0)
    return jnp.concatenate([xs[:, :3], qs, xs[:, 3:6]], axis=-1)


propagate_segment = jax.jit(_propagate_impl, static_argnames=("max_len",))


@functools.partial(jax.jit, static_argnames=("max_len", "n_pad"))
def _prop_window_fast(cur_padded, last_idx, omega_pad, span, rel_idx_pad,
                      abs_idx_pad, t_prev, t_final, gt_states,
                      max_len: int, n_pad: int):
    """Fused inter-window step of the async streaming fast path, fully on
    device (no host sync): propagate the last optimized knot across the gap
    (od_pipe.py:1006-1029), gather the propagated states at the new knot
    times, compute the propagation errors against GT, and assemble the next
    window's padded initial states [optimized prefix | propagated new knots
    | identity padding].

    cur_padded: previous window's padded solve output (n_prev, 10);
    rel_idx_pad[j]: position of knot t_prev+j on the propagated path;
    abs_idx_pad[j]: absolute knot row t_prev+j into gt_states (clipped).
    Entries at j >= t_final - t_prev are padding (masked by the caller).
    Returns (st0 (n_pad, 10), err_prop (n_pad,)).
    """
    path = _propagate_impl(cur_padded[last_idx], omega_pad, span, max_len)
    prop = jnp.take(path, rel_idx_pad, axis=0)
    gt_prop = jnp.take(gt_states, abs_idx_pad, axis=0)
    err_prop = jnp.linalg.norm(prop[:, :3] - gt_prop[:, :3], axis=-1)
    j = jnp.arange(n_pad)
    old = jnp.take(cur_padded,
                   jnp.minimum(j, cur_padded.shape[0] - 1), axis=0)
    new = jnp.take(prop, jnp.clip(j - t_prev, 0, n_pad - 1), axis=0)
    st = jnp.where((j < t_prev)[:, None], old, new)
    idq = jnp.zeros((n_pad, 10), st.dtype).at[:, 6].set(1.0)
    st = jnp.where((j < t_final)[:, None], st, idq)
    return st, err_prop


@jax.jit
def _end_stats(out, gt_states, idx):
    """End-of-window error + solve-health flag, on device (fast path)."""
    err = jnp.linalg.norm(out[idx, :3] - gt_states[idx, :3])
    return err, jnp.isfinite(out).all()


@functools.partial(jax.jit, static_argnames=("max_len", "n_pad", "num_iters",
                                             "params"))
def _fast_window_full(cur_padded, last_idx, omega_pad, span, rel_idx_pad,
                      abs_idx_pad, t_prev, t_final, gt_states,
                      prob: ba.BAProblem, lamda, num_iters: int,
                      params: ba.SolverParams,
                      max_len: int, n_pad: int):
    """ONE device program for a whole fast-path window > 0: inter-window
    propagation + padded-state assembly (_prop_window_fast), the full LM
    window solve, and the end-of-window error/health stats.  Over a
    remote tunnel each enqueue costs ~40-70 ms of wall even fully async,
    so fusing the 3 per-window programs into 1 cuts the headline stream's
    dispatch count ~3x."""
    st0, err_prop = _prop_window_fast(
        cur_padded, last_idx, omega_pad, span, rel_idx_pad, abs_idx_pad,
        t_prev, t_final, gt_states, max_len, n_pad)
    out, lam_new, last_h, mean_res = _solve_window(
        st0, prob, lamda, jnp.asarray(0), num_iters, params)
    e_dev, f_dev = _end_stats.__wrapped__(out, gt_states, t_final - 1)
    rms_dev = _reproj_rms_impl(out, prob)
    return out, lam_new, err_prop, e_dev, f_dev, rms_dev


class StreamingResult(NamedTuple):
    errors: np.ndarray  # (K,) km position errors at recorded times
    times: np.ndarray  # (K,) frame times of those errors
    first_detection: int
    final_states: np.ndarray  # (N, 10) final optimized knot states
    knot_times: np.ndarray  # (N,)
    # NEES tracking (cfg.track_nees): per-window terminal marginal info,
    # estimated terminal state, GT terminal state — the triples
    # evalx/calibration.calibrate_inflation consumes
    window_infos: Optional[np.ndarray] = None  # (W, 9, 9)
    window_est: Optional[np.ndarray] = None  # (W, 10)
    window_gt: Optional[np.ndarray] = None  # (W, 10)
    # number of windows whose FIRST solve tripped the recovery ladder
    # (non-finite states or reprojection RMS above recover_rms_px) —
    # eval instrumentation for the window-0 hardening (trips should stay
    # 0 on healthy streams; fast-path streams report the sync re-run's
    # count when a trip forces one)
    recovery_trips: int = 0


class StreamingConfig(NamedTuple):
    num_iters: int = 20
    init_iters: int = 10
    # iteration extension (SolverParams.max_iters): run max_iters LM
    # iterations per window (vs the reference's fixed num_iters=20) and
    # return the best-residual iterate.  Weakly-observable single-pass
    # windows need it in f32 (seed-11: 38.7 km at 20 iters vs 1.65 km at
    # 60 = the f64 result) and their error improves while the residual
    # moves <1%, so this is NOT residual-gated by default (measured:
    # early stopping returned a 30.4 km iterate).  Cost: ~3x window
    # device time; set 0 for the reference-exact budget.
    max_iters: int = 60
    # iteration budget for well-conditioned later windows (0 = same as
    # max_iters).  The run-to-60 budget exists for weakly-observable
    # SINGLE-pass problems (seed-11 class); with >= 2 passes the chain's
    # best iterate lands before ~24 iterations — measured on five 10800 s
    # 7-window arcs (CPU f64): final/min/time-to-5km IDENTICAL to 3
    # decimals at 24, 30, and 60, at ~2x less solve time.  The budget is
    # OBSERVABILITY-gated (VERDICT r4 #6), not window-index-gated: it
    # applies only when the solved span's detections form >= 2 passes
    # spanning >= budget_span_min_s seconds (_multi_pass_window).  Does
    # NOT apply to bounded/marginalized modes (their later windows are
    # anchor + ONE pass — exactly the weakly-observable class) or to
    # single-window streams.
    max_iters_later: int = 24
    # minimum detection time-span (s) for the reduced budget: two passes
    # a few minutes apart constrain velocity barely better than one, so
    # short-span prefixes keep the full budget
    budget_span_min_s: float = 1200.0
    lambda_init: float = 1e-4
    noise_pos_km: float = 100.0
    noise_ori_rad: float = 0.2
    noise_vel_rel: float = 0.1
    prop_bucket: int = 1024
    knot_bucket: int = 16
    obs_bucket: int = 64
    dtype: str = "float64"
    # use the BA_reg path (window-marginal prior factor) for windows > 0
    # instead of plain BA (reference main path uses BA, od_pipe.py:1040;
    # BA_reg is its streaming_debugging variant, od_pipe.py:893)
    use_prior: bool = False
    # bounded-memory streaming: each window > 0 solves ONLY the anchor knot
    # (previous terminal) + new knots, with the anchor carrying the TRUE
    # marginal information of everything marginalized out
    # (ba.terminal_marginal_info) as a BA_reg prior.  O(window) per-window
    # cost instead of the growing-prefix O(arc) — the production long-
    # horizon mode (reference analog: streaming_debugging, od_pipe.py:788)
    marginalize: bool = False
    # EKF+BA hybrid (BASELINE config 3): marginalized windows where the EKF
    # predict+update chain both propagates the anchor posterior across the
    # gap AND refines the warm start with the new window's own observations
    # before BA_reg runs (estimation/hybrid.py); implies marginalize
    use_ekf_hybrid: bool = False
    # anchor-prior covariance floors (ba.inflate_info): the CRLB marginal
    # understates the estimator's bias-dominated terminal error; floors
    # keep the anchor from over-pinning the next window.  Defaults from a
    # floor sweep over 1200 s (2-window) and 5400 s (4-window) gapped arcs:
    # pos 0.1 km / rot 0.01 / vel 1e-4 minimizes both; a larger vel floor
    # destroys the carried velocity information that makes bounded windows
    # work (docs/BENCHMARKS.md "bounded-memory streaming")
    prior_pos_floor_km: float = 0.1
    prior_rot_floor: float = 0.01
    prior_vel_floor: float = 1e-4
    # measurement-noise dial (od_pipe.py:941-942): 1.0 = real detections,
    # 0.0 = perfect GT reprojections; interpolates in between
    noise_level: float = 1.0
    # record per-window terminal marginal + NEES samples for covariance
    # calibration (evalx/calibration.py); adds one Schur-complement solve
    # per window on the prefix path (the bounded path computes it anyway)
    track_nees: bool = False
    # GT-in-the-loop SELF-CALIBRATING anchor prior (bounded modes only):
    # once >= auto_calibrate_min_windows NEES samples exist, the anchor
    # information is inflated by the measured per-block factors
    # (calibration.apply_inflation, clamped >= 1 — never deflate below the
    # CRLB) instead of the static prior_*_floor values.  This targets
    # covariance CONSISTENCY (mean block NEES == dof); it is a calibration
    # harness for simulation runs with known GT — use the derived factors/
    # floors to configure GT-free production streams.
    auto_calibrate: bool = False
    auto_calibrate_min_windows: int = 3
    # λ-damping search width (SolverParams.batched_lambda): -1 = AUTO —
    # batched K=9 on accelerators, sequential while_loop on CPU.  Measured
    # on the v5e (utils/mfu.py, docs/BENCHMARKS.md): the sequential λ-trial
    # chain is pure latency on a TPU and the batched search cuts full-
    # iteration device time 1.3x at N=64/256 and 2.7x at N=1024; on CPU
    # the 9x FLOPs are real sequential work and lose.  0 forces the
    # reference-exact sequential loop; K>0 forces a width.
    batched_lambda: int = -1
    # shooting-based terminal refinement before the open-loop tail
    # propagation (estimation/refine.py): re-fit a single 6-dof initial
    # [pos, vel] through the full RK4 dynamics against ALL gated
    # observations (attitudes held at the streaming optimum), then
    # propagate the tail from the refined terminal state.  Measured on the
    # 16-orbit region eval (CPU f64): median FINAL error 10.75 -> 5.67 km,
    # with multi-pass orbits rescued outright (seed 12: 18.6 -> 0.57 km,
    # seed 8: 1.31 -> 0.20) and single-pass orbits unchanged (their tail
    # is the pixel-noise CRLB — noise_level=0 reaches 0.00 km final, so
    # no estimator can improve them).  In-arc recorded errors are
    # unchanged (time-to-threshold semantics); only the tail +
    # final_states differ.  On the fast path the refinement runs as a
    # device-side program with the accept-guard folded in (no host sync).
    tail_refine: bool = True
    # RIGID-CHAIN refinement (VERDICT r4 #1, estimation/refine.py
    # shooting_refine_rigid): fit x0 PLUS one initial-attitude correction
    # transported through the known angular-rate chain, instead of holding
    # the noisy per-knot streaming attitudes fixed.  The 6-dof fixed-
    # attitude fit turns ~8e-4 rad per-knot attitude noise into a ~3 px
    # reprojection bias absorbed into pos/vel — the dominant weak-tail
    # error the CRLB columns exposed (seed 13 real-DB: 172 km final vs an
    # 8.1 km bound; the rigid fit reaches 14.7 km on the captured case).
    # Accepted by the ratio test below (the rigid chain has fewer dof than
    # per-knot attitudes, so its residual sits slightly ABOVE the input's
    # even when excellent); on reject the 6-dof fit / input states apply.
    tail_refine_rigid: bool = True
    # prior sigma (rad) on the rigid fit's attitude correction, and the
    # acceptance ratio vs the input states' reprojection residual
    tail_refine_att_sigma: float = 1e-2
    tail_refine_ratio: float = 1.3
    # residual-gated window recovery: a window solve whose gated
    # reprojection RMS exceeds this many PIXELS is treated as failed (the
    # fit quality is observable without GT: healthy windows measure
    # 5.0-5.3 px at the 4 px detection noise across seeds/backends, while
    # mis-converged ones sit at 20+ px — seed-0 real-DB window 0 measured
    # 21.8 px for a 137-km-wrong basin, hence the 2.3x-margin default)
    # and walks the recovery ladder — heavy-damped re-run, then
    # (recover_f64, f32 streams with a CPU backend present) the SAME
    # window re-solved in f64 on the host CPU, keeping the best-RMS
    # candidate.  Motivating case: the real-landmark-DB eval, where
    # clustered detection geometry makes window 0's vision-only init
    # marginal and TPU-f32 rounding tips 4/16 orbits into a basin later
    # windows never rescue (CPU f64 converges on all of them).
    # 0 disables the gate (non-finite recovery still applies).
    recover_rms_px: float = 12.0
    recover_f64: bool = True
    # PROACTIVE window-0 basin hardening (VERDICT r4 #5): before the
    # device solve of window 0, run its init phase — init_iters
    # vision-only + 10 full LM iterations — in f64 on the host CPU and
    # warm-start the f32 device solve from the result (init_iters=0).
    # Root cause being treated: on clustered real-DB geometry the
    # vision-only init is MARGINAL, and f32 rounding (TPU) tips 4/16
    # orbits into a wrong basin that later windows never rescue — the
    # reactive recovery ladder then pays a full sync re-run + f64
    # re-solve.  The init phase is the basin CHOICE; running just it in
    # f64 keeps the per-stream cost to one small CPU solve while the full
    # budget stays on-device.  No-op on f64 streams and when no CPU
    # backend is registered.
    window0_init_f64: bool = True


_marginal_info_jit = jax.jit(
    ba.terminal_marginal_info, static_argnames=("params",))


def _multi_pass_window(det_t: np.ndarray, cfg: "StreamingConfig") -> bool:
    """Observability proxy for the reduced iteration budget: True when the
    solved span's detection times form >= 2 passes (clusters separated by
    > 200 s — the same gap rule that splits windows, ingest.split_windows /
    od_pipe.py:898-905) covering >= cfg.budget_span_min_s seconds."""
    if len(det_t) < 2:
        return False
    dt = np.unique(np.asarray(det_t, np.float64))
    if len(dt) < 2:
        return False
    passes = 1 + int((np.diff(dt) > 200.0).sum())
    return passes >= 2 and float(dt[-1] - dt[0]) >= cfg.budget_span_min_s


# cap on the per-observation residual norm entering the recover_rms_px
# signal: the ingest gate admits detections up to 1000 px from the GT
# reprojection (gate_and_compact max_err), so a handful of gross outliers
# in an otherwise-converged window must not trip the gate — capped, a few
# 64-px contributions among hundreds of ~4 px ones stay well under the
# 25 px threshold, while a diverged window (every residual >> cap)
# saturates at the cap
_RMS_CAP_PX = 64.0


def _reproj_rms_impl(states, prob: ba.BAProblem):
    """Gated-reprojection residual RMS in pixels at `states` (per-
    observation norms, capped at _RMS_CAP_PX) — the GT-free window solve-
    quality signal driving recover_rms_px (padding masked by obs_valid;
    masked BEFORE squaring so padded-state NaN projections cannot
    contaminate the sum)."""
    uv = factors.project_landmarks(states, prob.landmarks_xyz, prob.ii,
                                   prob.intrinsics)
    w = prob.obs_valid
    d = jnp.where((w > 0)[:, None], uv - prob.landmarks_uv, 0.0)
    r2 = jnp.minimum((d * d).sum(-1), _RMS_CAP_PX * _RMS_CAP_PX)
    return jnp.sqrt((r2 * w).sum() / jnp.maximum(w.sum(), 1.0))


_reproj_rms_jit = jax.jit(_reproj_rms_impl)


@contextlib.contextmanager
def _f64_prep_context():
    """Run data conditioning in f64 wherever the runtime allows.

    The gate reprojections / cumulative rotations / initial-noise transforms
    are accuracy-relevant: f32 conditioning costs km-level final error on
    multi-window arcs (measured: 0.39 km -> 6.5 km on the 10800 s gapped
    bench sequence).  On an f32-only default backend (TPU) with a CPU
    backend also registered (JAX_PLATFORMS=tpu,cpu), prep enables x64 via
    the THREAD-LOCAL `jax.enable_x64` context (re-entrant —
    concurrent streams in other threads are unaffected, unlike a global
    jax.config.update toggle) and pins a process-LOCAL CPU device; with no
    CPU backend it falls back to the solver dtype.  Yields the prep dtype
    (None = solver dtype).
    """
    if jax.config.jax_enable_x64:
        yield jnp.dtype(jnp.float64)
        return
    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except Exception:
        cpu0 = None
    if cpu0 is None:
        yield None
        return
    with jax.enable_x64(True), jax.default_device(cpu0):
        yield jnp.dtype(jnp.float64)


def _tree_to_f64(t):
    """Pytree cast: float leaves -> f64 host arrays, others passthrough."""
    return jax.tree_util.tree_map(
        lambda x: (np.asarray(x, np.float64)
                   if np.issubdtype(np.asarray(x).dtype, np.floating)
                   else np.asarray(x)), t)


def _solve_window_f64_cpu(st0, prob: ba.BAProblem, lamda0, init_iters,
                          num_iters: int, params: ba.SolverParams,
                          prior: Optional[ba.PriorState] = None):
    """Recovery-ladder escalation (StreamingConfig.recover_rms_px): re-run
    ONE window solve in f64 on the host CPU backend and hand the result
    back to the f32 stream.  Returns (states_np, lamda, last_h_np, res)
    in host f64, or None when no CPU backend is registered / the stream is
    already f64 (nothing to escalate to)."""
    if jnp.dtype(jnp.asarray(st0).dtype) == jnp.dtype(jnp.float64):
        return None
    try:
        cpu0 = jax.local_devices(backend="cpu")[0]
    except Exception:
        return None
    st64 = _tree_to_f64(st0)
    prob64 = _tree_to_f64(prob)
    with jax.enable_x64(True), jax.default_device(cpu0):
        if prior is not None:
            out = solve_window_reg(jnp.asarray(st64), prob64,
                                   _tree_to_f64(prior),
                                   jnp.asarray(float(lamda0), jnp.float64),
                                   num_iters, params)
        else:
            out = solve_window(jnp.asarray(st64), prob64,
                               jnp.asarray(float(lamda0), jnp.float64),
                               jnp.asarray(int(init_iters)), num_iters,
                               params)
        o, ln, lh, mr = jax.device_get(out)
    return (np.asarray(o, np.float64), float(ln),
            np.asarray(lh, np.float64), float(mr))


def _window0_init_f64_cpu(st0, prob: ba.BAProblem, lamda0, init_iters: int,
                          params: ba.SolverParams):
    """Window-0 init phase in f64 on the host CPU
    (StreamingConfig.window0_init_f64): init_iters vision-only + 10 full
    LM iterations at a FIXED count (max_iters=0, sequential λ), returning
    the warm-start states as host f64 — or None when the stream is
    already f64 / no CPU backend exists (nothing to harden with).
    Delegates to _solve_window_f64_cpu (same backend lookup, f64 casts,
    and thread-local x64 context as the recovery-ladder escalation)."""
    r = _solve_window_f64_cpu(
        st0, prob, lamda0, init_iters, int(init_iters) + 10,
        params._replace(max_iters=0, batched_lambda=0))
    if r is None or not np.isfinite(r[0]).all():
        return None
    return r[0]


def _pad_prob(n: int, gaps, cum_rot, lm_xyz, lm_uv, conf, ii,
              n_pad: int, m_pad: int, dtype,
              intrinsics=None) -> ba.BAProblem:
    """Pad the host-side (states-independent) problem arrays to bucketed
    shapes.  `n` = number of real knots."""
    m = lm_uv.shape[0]
    g = np.zeros(n_pad)
    g[:n] = gaps
    cr = np.zeros((n_pad, 4))
    cr[:, 3] = 1.0
    cr[:n] = cum_rot
    lxyz = np.zeros((m_pad, 3))
    lxyz[:m] = lm_xyz
    luv = np.zeros((m_pad, 2))
    luv[:m] = lm_uv
    cf = np.zeros(m_pad)
    cf[:m] = conf
    iin = np.zeros(m_pad, dtype=np.int32)
    iin[:m] = ii
    ov = np.zeros(m_pad)
    ov[:m] = 1.0
    kv = np.zeros(n_pad)
    kv[:n] = 1.0
    pv = np.zeros(max(n_pad - 1, 1))
    pv[: max(n - 1, 0)] = 1.0
    jd = jnp.dtype(dtype)
    prob = ba.BAProblem(
        gaps=jnp.asarray(g, jd),
        cum_rot=jnp.asarray(cr, jd),
        landmarks_xyz=jnp.asarray(lxyz, jd),
        landmarks_uv=jnp.asarray(luv, jd),
        conf=jnp.asarray(cf, jd),
        ii=jnp.asarray(iin),
        obs_valid=jnp.asarray(ov, jd),
        knot_valid=jnp.asarray(kv, jd),
        pair_valid=jnp.asarray(pv, jd),
        intrinsics=jnp.asarray(
            np.array(REFERENCE_INTRINSICS if intrinsics is None
                     else intrinsics), jd,
        ),
    )
    return prob


def _pad_problem(states, gaps, cum_rot, lm_xyz, lm_uv, conf, ii,
                 n_pad: int, m_pad: int, dtype,
                 intrinsics=None) -> Tuple[jnp.ndarray, ba.BAProblem]:
    n = states.shape[0]
    st = np.zeros((n_pad, 10))
    st[:, 6] = 1.0  # identity quats on padding
    st[:n] = states
    prob = _pad_prob(n, gaps, cum_rot, lm_xyz, lm_uv, conf, ii, n_pad, m_pad,
                     dtype, intrinsics=intrinsics)
    return jnp.asarray(st, jnp.dtype(dtype)), prob


class PreparedStream(NamedTuple):
    """Conditioned stream inputs shared by every streaming driver (single-
    chip `stream_orbit` and the distributed `dist.stream`): the gated
    detection graph, GT, noised initial states, inter-knot gaps and
    cumulative rotations.  `states0 is None` flags a sequence with no
    solvable graph (no observations survive gating, or < 2 knots)."""

    graph: object
    gt: object
    states0: Optional[np.ndarray]
    gaps: np.ndarray
    cum_rot: np.ndarray
    knot_t: np.ndarray
    intr_np: np.ndarray


def prepare_stream(det_rows: np.ndarray, orbit_pos_eci_km: np.ndarray,
                   seed: int, cfg: StreamingConfig,
                   intrinsics: Optional[np.ndarray] = None
                   ) -> Optional[PreparedStream]:
    """Ingest + condition one detection sequence (od_pipe.py:924-969):
    graph build, GT conditioning, GT-reprojection gating, noise_level
    interpolation, deterministic initial-noise draw, gaps + cumulative
    rotations.  Conditioning runs in f64 wherever the runtime allows
    (_f64_prep_context) — f32 conditioning costs km-level final error.

    Returns None for an empty detection sequence.
    """
    rng = np.random.default_rng(seed)
    T = orbit_pos_eci_km.shape[0]
    if len(det_rows) == 0:
        return None
    graph = ingest.build_graph(det_rows, T)

    with _f64_prep_context() as pjd:
        if pjd is None:
            pjd = jnp.dtype(cfg.dtype)
        gt = ingest.process_ground_truths(orbit_pos_eci_km, graph,
                                          device_dtype=pjd)

        # gate on GT reprojection (od_pipe.py:929-930)
        intr_np = np.asarray(
            intrinsics if intrinsics is not None
            else np.array(REFERENCE_INTRINSICS)
        )
        uv_proj = np.asarray(
            factors.project_landmarks(
                jnp.asarray(gt.states, pjd),
                jnp.asarray(gt.landmarks_xyz, pjd),
                jnp.asarray(graph.ii, jnp.int32), jnp.asarray(intr_np, pjd),
            )
        )
        graph, gt, kept = ingest.gate_and_compact(graph, gt, uv_proj)

        N = len(graph.time_idx)
        if len(graph.ii) == 0 or N < 2:
            return PreparedStream(graph, gt, None, np.zeros(0), np.zeros(0),
                                  graph.time_idx, intr_np)

        if cfg.noise_level != 1.0:
            # interpolate measurements toward perfect GT reprojections
            # (od_pipe.py:941-942)
            uv_kept = uv_proj[kept]
            graph = graph._replace(
                uv=graph.uv + (uv_kept - graph.uv) * (1.0 - cfg.noise_level)
            )

        # initial guess: GT + noise (od_pipe.py:962-969)
        pos0 = gt.states[:, :3] + rng.standard_normal((N, 3)) * cfg.noise_pos_km
        phi = np.asarray(quat.log(jnp.asarray(gt.states[:, 3:7], pjd)))
        phi = phi + rng.standard_normal((N, 3)) * cfg.noise_ori_rad
        q0 = np.asarray(quat.exp(jnp.asarray(phi, pjd)))
        vel_scale = np.abs(gt.states[:, 7:10]).mean()
        vel0 = (gt.states[:, 7:10]
                + rng.standard_normal((N, 3)) * vel_scale * cfg.noise_vel_rel)
        states = np.concatenate([pos0, q0, vel0], axis=1)

        # per-knot gap durations + cumulative rotations
        knot_t = graph.time_idx
        gaps = np.concatenate([np.diff(knot_t), [0]]).astype(np.float64)
        cum_rot = np.asarray(
            factors.cumulative_rotations(
                jnp.asarray(gt.omega_full, pjd), 1.0,
                jnp.asarray(knot_t, jnp.int32)
            )
        )
    return PreparedStream(graph, gt, states, gaps, cum_rot, knot_t, intr_np)


def stream_orbit(det_rows: np.ndarray, orbit_pos_eci_km: np.ndarray,
                 seed: int = 0, cfg: StreamingConfig = StreamingConfig(),
                 solver: ba.SolverParams = ba.SolverParams(),
                 intrinsics: Optional[np.ndarray] = None,
                 metrics=None, checkpoint_path: Optional[str] = None,
                 resume_from: Optional[str] = None,
                 timer=None, fast: Optional[bool] = None) -> StreamingResult:
    """Run streaming OD on one detection sequence.

    det_rows: (M, 6) [frame, lon, lat, xc, yc, conf]; orbit_pos_eci_km:
    (T, 3) GT 1 Hz ECI positions in km.  Returns recorded errors/times for
    the time-to-<5km evaluation (od_pipe.py:1061-1062).

    resume_from: path of a per-window checkpoint previously written via
    `checkpoint_path` (see utils/checkpoint.py).  Windows up to and
    including the checkpointed one are restored (states, trailing hessian,
    λ, recorded errors) instead of re-solved; the run continues from the
    next window and produces results identical to an uninterrupted run
    (the window split and initial-noise draw are deterministic in
    det_rows/seed).

    timer: optional utils.profiling.StageTimer — accumulates wall time per
    driver phase (prep / propagate / pad_transfer / solve / marginal); on a
    remote-TPU tunnel each phase's cost is dominated by its host round
    trips, so this is the dispatch-accounting view of the stream.

    fast: async dispatch mode (None = auto).  On the plain growing-prefix
    path (no prior/marginalization/NEES/metrics/checkpoint/profiling) the
    whole stream is enqueued WITHOUT per-window host syncs: states stay
    device-resident, inter-window propagation + window assembly + error
    recording run as one fused jitted program per window, and errors /
    solve-health flags are fetched once at the end.  Numerically identical
    to the sync path (same jitted solves on bit-identical inputs); if any
    window solve produced non-finite states the stream transparently
    re-runs in sync mode, which has the per-window damped-retry recovery.
    Over a remote-TPU tunnel this hides ~all dispatch latency (measured:
    1.9 s -> ~1.0 s on the 7-window headline bench).
    """
    profiling_on = timer is not None
    if timer is None:
        from vinsat_tpu.utils.profiling import StageTimer

        timer = StageTimer()  # discarded; keeps the stage blocks unconditional
    dtype = cfg.dtype

    with timer.stage("prep"):
        prep = prepare_stream(det_rows, orbit_pos_eci_km, seed, cfg,
                              intrinsics=intrinsics)
    if prep is None:
        return StreamingResult(np.array([]), np.array([]), -1,
                               np.zeros((0, 10)), np.array([], dtype=np.int64))
    if prep.states0 is None:
        return StreamingResult(np.array([]), np.array([]), -1,
                               prep.gt.states, prep.graph.time_idx)
    graph, gt, states = prep.graph, prep.gt, prep.states0
    gaps, cum_rot, knot_t, intr_np = (prep.gaps, prep.cum_rot, prep.knot_t,
                                      prep.intr_np)
    intr = jnp.asarray(intr_np, jnp.dtype(dtype))

    windows = ingest.split_windows(graph.ii, knot_t)

    errors: List[np.ndarray] = []
    times: List[np.ndarray] = []
    first_detection = int(knot_t[windows[0][0] - 1])
    lamda = cfg.lambda_init
    cur_states: Optional[np.ndarray] = None  # optimized prefix (t_final_prev)
    last_hessian: Optional[np.ndarray] = None
    prior_full: Optional[ba.PriorState] = None
    marg_info: Optional[np.ndarray] = None  # (9, 9) anchor information
    t_prev = 0
    i_prev = 0
    max_hops = int(np.ceil(gaps.max() / solver.max_substep)) + 1
    solver_in = solver  # original params (for the sync-mode fallback re-run)
    # a caller-set SolverParams.max_iters wins over the streaming default;
    # opting out of the extra-iteration budget entirely (the bit-exact
    # fixed-count path) is cfg.max_iters=0 with the default solver
    solver = solver._replace(
        num_hops=max(solver.num_hops, max_hops),
        max_iters=solver.max_iters if solver.max_iters > 0
        else cfg.max_iters)
    if solver.batched_lambda == 0 and cfg.batched_lambda != 0:
        if cfg.batched_lambda > 0:
            solver = solver._replace(batched_lambda=cfg.batched_lambda)
        elif jax.devices()[0].platform != "cpu":
            # AUTO: batched λ search on accelerators (sequential-latency
            # win, measured on v5e); sequential loop on CPU
            solver = solver._replace(batched_lambda=9)
    # reduced budget for well-conditioned (multi-pass) later windows
    solver_later = solver
    if cfg.max_iters_later > 0 and solver.max_iters > 0:
        solver_later = solver._replace(
            max_iters=min(solver.max_iters, max(cfg.max_iters_later,
                                                cfg.num_iters + 1)))

    nees_infos: List[np.ndarray] = []
    nees_est: List[np.ndarray] = []
    nees_gt: List[np.ndarray] = []
    n_trips = 0  # recovery-ladder first-rung failures (StreamingResult)

    start_w = 0
    if resume_from is not None:
        from vinsat_tpu.utils import checkpoint as ckpt

        ck = ckpt.load(resume_from)
        start_w = ck["window_idx"] + 1
        cur_states = ck["states"]
        last_hessian = ck["last_hessian"]
        lamda = float(ck["lamda"])
        errors = [ck["errors"]]
        times = [ck["times"]]
        t_prev = len(ck["knot_times"])
        if "marg_info" in ck:
            marg_info = np.asarray(ck["marg_info"])
            i_prev = int(ck["i_prev"])
        if "nees_infos" in ck:
            # NEES history must survive resume: auto_calibrate derives
            # anchor-prior inflation from it, so dropping it would make a
            # resumed run diverge from an uninterrupted one
            nees_infos = list(np.asarray(ck["nees_infos"]))
            nees_est = list(np.asarray(ck["nees_est"]))
            nees_gt = list(np.asarray(ck["nees_gt"]))

    def record_tail(t_init: int):
        # tail propagation (od_pipe.py:1045-1059)
        nonlocal cur_states
        if cfg.tail_refine:
            from vinsat_tpu.estimation import refine

            with timer.stage("refine"):
                cur_states = refine.refine_terminal(
                    cur_states, gaps[:t_init], gt.landmarks_xyz,
                    graph.uv, graph.conf, graph.ii, intr_np, dtype,
                    max_substep=solver.max_substep,
                    cum_rot=(cum_rot[:t_init] if cfg.tail_refine_rigid
                             else None),
                    att_sigma=cfg.tail_refine_att_sigma,
                    ratio=cfg.tail_refine_ratio,
                )
        span = int(knot_t[-1] - knot_t[t_init - 1])
        om = gt.omega_full[knot_t[t_init - 1]:knot_t[-1]]
        max_len = bucket(span, cfg.prop_bucket, cfg.prop_bucket)
        om_pad = np.zeros((max_len, 3))
        om_pad[:om.shape[0]] = om
        with timer.stage("propagate"):
            path = np.asarray(
                propagate_segment(
                    jnp.asarray(cur_states[-1], jnp.dtype(dtype)),
                    jnp.asarray(om_pad, jnp.dtype(dtype)),
                    jnp.asarray(span), max_len,
                )
            )
        new_knots = knot_t[t_init:] - knot_t[t_init - 1]
        states_prop = path[new_knots]
        errors.append(np.linalg.norm(
            states_prop[:, :3] - gt.states[t_init:, :3], axis=-1
        ))
        times.append(knot_t[t_init:])

    def record_tail_fast(t_init: int):
        # tail propagation, device-side (errors fetched at stream end)
        span = int(knot_t[-1] - knot_t[t_init - 1])
        om = gt.omega_full[knot_t[t_init - 1]:knot_t[-1]]
        max_len = bucket(span, cfg.prop_bucket, cfg.prop_bucket)
        om_pad = np.zeros((max_len, 3))
        om_pad[:om.shape[0]] = om
        new_knots = knot_t[t_init:] - knot_t[t_init - 1]
        count = len(new_knots)
        n_pad_t = bucket(count, cfg.knot_bucket)
        rel = np.zeros(n_pad_t, np.int32)
        rel[:count] = new_knots
        absi = np.zeros(n_pad_t, np.int32)
        absi[:count] = np.arange(t_init, len(knot_t))
        _, err_dev_t = _prop_window_fast(
            out_dev, jnp.asarray(t_init - 1), jnp.asarray(om_pad, jd),
            jnp.asarray(span), jnp.asarray(rel), jnp.asarray(absi),
            jnp.asarray(0), jnp.asarray(0), gt_dev, max_len, n_pad_t,
        )
        errors.append((err_dev_t, count))
        times.append(knot_t[t_init:])

    jd = jnp.dtype(dtype)
    bounded = cfg.marginalize or cfg.use_ekf_hybrid
    track = cfg.track_nees or (cfg.auto_calibrate and bounded)

    # async fast path: only the plain growing-prefix mode qualifies (every
    # other mode needs host values between windows)
    fast_ok = (checkpoint_path is None and resume_from is None
               and metrics is None and not profiling_on
               and not cfg.use_prior and not bounded and not track)
    fast = fast_ok if fast is None else (bool(fast) and fast_ok)
    out_dev = None  # device-resident padded solve output (fast path)
    fin_dev: List = []  # per-window device finite-ness flags (fast path)
    rms_dev_l: List = []  # per-window reprojection RMS px (fast path)
    gt_dev = jnp.asarray(gt.states, jd) if fast else None

    def anchor_info(H9: np.ndarray) -> np.ndarray:
        """Inflated anchor-prior information: measured NEES factors once
        auto-calibration has enough windows, static floors otherwise."""
        if (cfg.auto_calibrate
                and len(nees_infos) >= cfg.auto_calibrate_min_windows):
            from vinsat_tpu.evalx import calibration

            c = calibration.calibrate_inflation(nees_infos, nees_est,
                                                nees_gt)
            c = {k: max(v, 1.0) for k, v in c.items()}
            return calibration.apply_inflation(H9, c)
        return ba.inflate_info(H9, cfg.prior_pos_floor_km,
                               cfg.prior_rot_floor, cfg.prior_vel_floor)

    def compose_prior_blocks(H9: np.ndarray):
        """Split a 9x9 [pos, phi, vel] information matrix into the
        prior_factor's (H_state [pos, vel], H_rot [phi]) blocks, and the
        matching 9x9 block re-composition (for extra_diag)."""
        Hs = np.zeros((6, 6))
        Hs[:3, :3] = H9[0:3, 0:3]
        Hs[:3, 3:] = H9[0:3, 6:9]
        Hs[3:, :3] = H9[6:9, 0:3]
        Hs[3:, 3:] = H9[6:9, 6:9]
        Hr = H9[3:6, 3:6]
        H9c = np.zeros((9, 9))
        H9c[0:3, 0:3] = Hs[:3, :3]
        H9c[0:3, 6:9] = Hs[:3, 3:]
        H9c[6:9, 0:3] = Hs[3:, :3]
        H9c[6:9, 6:9] = Hs[3:, 3:]
        H9c[3:6, 3:6] = Hr
        return Hs, Hr, H9c

    for w, (t_final, i_final, seq_end) in enumerate(windows):
        if w < start_w:
            # restored from checkpoint; only the tail propagation of the
            # final window (recorded AFTER its checkpoint write) remains
            if seq_end and t_prev < len(knot_t):
                record_tail(t_prev)
            continue
        sub_anchor: Optional[int] = None
        # OBSERVABILITY-gated budget (VERDICT r4 #6): the reduced budget
        # applies only when the SOLVED SPAN's own detections make the
        # window well-conditioned — >= 2 passes (detection clusters
        # separated by > 200 s) covering >= budget_span_min_s seconds —
        # instead of the former window-index rule (w > 0).  For the
        # growing prefix the two coincide on ordinary streams (the prefix
        # accumulates one pass per window), but the proxy also keeps the
        # full budget on close-pass weakly-observable prefixes, the
        # seed-11 class the run-to-60 budget exists for.  Bounded windows
        # are anchor + ONE pass — always the full budget.
        solver_w = solver
        if not bounded and w > 0 and _multi_pass_window(
                knot_t[graph.ii[:i_final]], cfg):
            solver_w = solver_later
        if w == 0:
            window_states = states[:t_final]
        elif fast:
            # metadata for the FUSED device program (one enqueue per
            # window: propagate + assemble + solve + stats — see
            # _fast_window_full); the host never waits on the device
            # (errors fetched at stream end)
            t_init = t_prev
            span = int(knot_t[t_final - 1] - knot_t[t_init - 1])
            om = gt.omega_full[knot_t[t_init - 1]:knot_t[t_final - 1]]
            max_len = bucket(span, cfg.prop_bucket, cfg.prop_bucket)
            om_pad = np.zeros((max_len, 3))
            om_pad[:om.shape[0]] = om
            new_knots = knot_t[t_init:t_final] - knot_t[t_init - 1]
            count = t_final - t_init
            n_pad = bucket(t_final, cfg.knot_bucket)
            rel = np.zeros(n_pad, np.int32)
            rel[:count] = new_knots
            absi = np.zeros(n_pad, np.int32)
            absi[:count] = np.arange(t_init, t_final)
        else:
            # propagate from the last optimized knot across the gap
            # (od_pipe.py:1006-1029)
            t_init = t_prev
            span = int(knot_t[t_final - 1] - knot_t[t_init - 1])
            om = gt.omega_full[knot_t[t_init - 1]:knot_t[t_final - 1]]
            max_len = bucket(span, cfg.prop_bucket, cfg.prop_bucket)
            om_pad = np.zeros((max_len, 3))
            om_pad[:om.shape[0]] = om
            with timer.stage("propagate"):
                path = np.asarray(
                    propagate_segment(
                        jnp.asarray(cur_states[-1], jd),
                        jnp.asarray(om_pad, jd),
                        jnp.asarray(span), max_len,
                    )
                )
            new_knots = knot_t[t_init:t_final] - knot_t[t_init - 1]
            states_prop = path[new_knots]
            # record propagation errors at the new knots except the last
            err_prop = np.linalg.norm(
                states_prop[:, :3] - gt.states[t_init:t_final, :3], axis=-1
            )[:-1]
            errors.append(err_prop)
            times.append(knot_t[t_init:t_final][:-1])

            if bounded and marg_info is not None:
                # bounded-memory marginalized window: [anchor] + new knots
                sub_anchor = t_prev - 1
                new_states = states_prop
                if cfg.use_ekf_hybrid:
                    from vinsat_tpu.estimation import hybrid

                    gap_max = float(
                        (knot_t[t_init:t_final]
                         - knot_t[t_init - 1:t_final - 1]).max()
                    )
                    hops = int(np.ceil(gap_max / solver.max_substep)) + 1
                    info0 = anchor_info(marg_info)
                    new_states = hybrid.ekf_refine_window(
                        cur_states[-1], info0, knot_t, t_init, t_final,
                        cum_rot, graph, gt, np.asarray(intr), dtype,
                        num_hops=hops, max_substep=solver.max_substep,
                    )
                window_states = np.concatenate(
                    [cur_states[-1:], new_states], axis=0
                )
            else:
                window_states = np.concatenate([cur_states, states_prop],
                                               axis=0)
                if cfg.use_prior:
                    # window-marginal prior on the newly propagated knots
                    spans = (knot_t[t_init:t_final]
                             - knot_t[t_init - 1]).astype(np.float64)
                    cum_spans = factors.span_rotations(
                        jnp.asarray(gt.omega_full, jd), 1.0,
                        jnp.asarray(int(knot_t[t_init - 1])),
                        jnp.asarray(knot_t[t_init:t_final], jnp.int32),
                    )
                    hops = int(np.ceil(spans.max() / solver.max_substep)) + 1
                    pri_new = ba.propagate_prior(
                        jnp.asarray(cur_states[-1], jd),
                        jnp.asarray(last_hessian, jd),
                        jnp.asarray(spans, jd), cum_spans,
                        num_hops=hops, max_substep=solver.max_substep,
                    )
                    prior_full = (np.asarray(pri_new.prop_states),
                                  np.asarray(pri_new.H_state),
                                  np.asarray(pri_new.H_rot), t_init, t_final)

        # each window starts its lambda schedule fresh from lambda_init
        # (od_pipe.py:1033: lamda_init_t = lamda_init)
        lamda = cfg.lambda_init
        init_iters = cfg.init_iters if w == 0 else 0
        extra_diag0: Optional[np.ndarray] = None

        def attempt(solve_fn, warm, ctx=None):
            """Failure detection + recovery ladder (SURVEY §5): a window
            solve that produces non-finite states OR fits its own gated
            observations worse than cfg.recover_rms_px pixels is re-run
            from the same warm start with heavy initial damping; if still
            bad and the stream is f32 with a CPU backend registered
            (cfg.recover_f64), the SAME window re-solves in f64 on the
            host CPU (_solve_window_f64_cpu) — the measured rescue for the
            real-landmark-DB orbits whose window-0 init diverges under
            TPU f32.  Last resort keeps the best finite iterate, else the
            warm start (graceful degradation instead of NaN propagation).

            ctx = (st0, prob, prior, init_iters, solver_params) enables
            the RMS gate + f64 escalation; None = finite check only."""
            rms_gate = cfg.recover_rms_px if (cfg.recover_rms_px > 0
                                              and ctx is not None) else 0.0

            def rms_of(o):
                if not bool(np.isfinite(np.asarray(o)).all()):
                    return np.inf
                if not rms_gate:
                    return 0.0
                return float(_reproj_rms_jit(o, ctx[1]))

            nonlocal n_trips
            cands = []  # (rms, result) of every finite rung
            for rung, lam0 in enumerate((lamda, 1e2)):
                o, ln, lh, mr = solve_fn(lam0)
                r = rms_of(o)  # inf for non-finite states; 0 if gate off
                if r <= rms_gate:
                    return o, ln, lh, mr
                if rung == 0:
                    n_trips += 1
                if np.isfinite(r):
                    cands.append((r, (o, ln, lh, mr)))
            if ctx is not None and cfg.recover_f64:
                st0_c, prob_c, prior_c, init_c, params_c = ctx
                r64 = _solve_window_f64_cpu(st0_c, prob_c, lamda, init_c,
                                            cfg.num_iters, params_c,
                                            prior=prior_c)
                if r64 is not None and np.isfinite(r64[0]).all():
                    o64, ln64, lh64, mr64 = r64
                    res64 = (jnp.asarray(o64, jd), jnp.asarray(ln64, jd),
                             jnp.asarray(lh64, jd), jnp.asarray(mr64, jd))
                    # the escalated solve is re-checked too: from a
                    # poisoned warm start even f64 can mis-converge, so it
                    # competes on RMS instead of being trusted blindly
                    cands.append((rms_of(res64[0]), res64))
            good = [c for c in cands if np.isfinite(c[0])]
            if good:
                return min(good, key=lambda c: c[0])[1]
            return (warm, jnp.asarray(cfg.lambda_init, jnp.dtype(dtype)),
                    jnp.zeros((9, 9), jnp.dtype(dtype)),
                    jnp.asarray(np.nan, jnp.dtype(dtype)))

        if fast:
            # ---- async growing-prefix solve (no host sync) ---------------
            n_pad = bucket(t_final, cfg.knot_bucket)
            m_pad = bucket(i_final, cfg.obs_bucket, cfg.obs_bucket)
            prob = _pad_prob(
                t_final, gaps[:t_final], cum_rot[:t_final],
                gt.landmarks_xyz[:i_final], graph.uv[:i_final],
                graph.conf[:i_final], graph.ii[:i_final], n_pad, m_pad,
                dtype, intrinsics=np.asarray(intr),
            )
            if w == 0:  # window 0: initial states are host-known
                st_np = np.zeros((n_pad, 10))
                st_np[:, 6] = 1.0
                st_np[:t_final] = window_states
                init_w0 = init_iters
                if cfg.window0_init_f64:
                    o64 = _window0_init_f64_cpu(
                        jnp.asarray(st_np, jd), prob, lamda, init_iters,
                        solver)
                    if o64 is not None:
                        st_np = o64
                        init_w0 = 0
                out_states, lam_new, last_h, mean_res = solve_window(
                    jnp.asarray(st_np, jd), prob, lamda,
                    jnp.asarray(init_w0), cfg.num_iters, solver,
                )
                e_dev, f_dev = _end_stats(out_states, gt_dev,
                                          jnp.asarray(t_final - 1))
                rms_dev_l.append(_reproj_rms_jit(out_states, prob))
            else:
                # windows > 0: ONE fused enqueue for propagate + assemble
                # + solve + stats
                out_states, lam_new, err_dev_w, e_dev, f_dev, rms_w = (
                    _fast_window_full(
                        out_dev, jnp.asarray(t_prev - 1),
                        jnp.asarray(om_pad, jd), jnp.asarray(span),
                        jnp.asarray(rel), jnp.asarray(absi),
                        jnp.asarray(t_prev), jnp.asarray(t_final), gt_dev,
                        prob, lamda, cfg.num_iters, solver_w,
                        max_len, n_pad,
                    ))
                rms_dev_l.append(rms_w)
                if count > 1:
                    errors.append((err_dev_w, count - 1))
                    times.append(knot_t[t_prev:t_final][:-1])
            errors.append((e_dev, -1))
            times.append(knot_t[t_final - 1:t_final])
            fin_dev.append(f_dev)
            out_dev = out_states
            t_prev = t_final
            i_prev = i_final
            if seq_end and t_final < len(knot_t):
                if cfg.tail_refine:
                    # device-side shooting refinement, chained async (the
                    # final window's padded prob already holds the whole
                    # arc's gaps/observations)
                    from vinsat_tpu.estimation import refine

                    if cfg.tail_refine_rigid:
                        out_dev = refine.refine_states_device_full(
                            out_states, prob.gaps, prob.cum_rot,
                            prob.landmarks_xyz, prob.landmarks_uv,
                            prob.conf, prob.ii, prob.obs_valid,
                            prob.intrinsics, num_hops=solver.num_hops,
                            max_substep=solver.max_substep,
                            att_sigma=jnp.asarray(
                                cfg.tail_refine_att_sigma, jd),
                            ratio=jnp.asarray(cfg.tail_refine_ratio, jd),
                        )
                    else:
                        out_dev = refine.refine_states_device(
                            out_states, prob.gaps, prob.landmarks_xyz,
                            prob.landmarks_uv, prob.conf, prob.ii,
                            prob.obs_valid, prob.intrinsics,
                            num_hops=solver.num_hops,
                            max_substep=solver.max_substep,
                        )
                record_tail_fast(t_final)
            continue

        if sub_anchor is not None:
            # ---- bounded-memory solve over [anchor, t_final) -------------
            Nw = t_final - sub_anchor
            Mw = i_final - i_prev
            n_pad = bucket(Nw, cfg.knot_bucket)
            m_pad = bucket(max(Mw, 1), cfg.obs_bucket, cfg.obs_bucket)
            with timer.stage("pad_transfer"):
                st0, prob = _pad_problem(
                    window_states, gaps[sub_anchor:t_final],
                    cum_rot[sub_anchor:t_final],
                    gt.landmarks_xyz[i_prev:i_final],
                    graph.uv[i_prev:i_final], graph.conf[i_prev:i_final],
                    graph.ii[i_prev:i_final] - sub_anchor, n_pad, m_pad,
                    dtype, intrinsics=np.asarray(intr),
                )
                if profiling_on:
                    jax.block_until_ready((st0, prob.gaps, prob.landmarks_uv))
            H9_infl = anchor_info(marg_info)
            Hs0, Hr0, H9c = compose_prior_blocks(H9_infl)
            prop_pad = np.zeros((n_pad, 10))
            prop_pad[:, 6] = 1.0
            prop_pad[0] = cur_states[-1]
            Hs_pad = np.zeros((n_pad, 6, 6))
            Hr_pad = np.zeros((n_pad, 3, 3))
            val = np.zeros(n_pad)
            Hs_pad[0] = Hs0
            Hr_pad[0] = Hr0
            val[0] = 1.0
            prior = ba.PriorState(
                jnp.asarray(prop_pad, jd), jnp.asarray(Hs_pad, jd),
                jnp.asarray(Hr_pad, jd), jnp.asarray(val, jd),
            )
            with timer.stage("solve"):
                out_states, lam_new, last_h, mean_res = attempt(
                    lambda l0: solve_window_reg(st0, prob, prior, l0,
                                                cfg.num_iters, solver_w),
                    st0, ctx=(st0, prob, prior, 0, solver_w))
                out_np = np.asarray(out_states)[:Nw]
            cur_states = np.concatenate([cur_states[:-1], out_np], axis=0)
            extra_diag0 = H9c
        else:
            # ---- growing-prefix solve (reference main path) --------------
            n_pad = bucket(t_final, cfg.knot_bucket)
            m_pad = bucket(i_final, cfg.obs_bucket, cfg.obs_bucket)
            with timer.stage("pad_transfer"):
                st0, prob = _pad_problem(
                    window_states, gaps[:t_final], cum_rot[:t_final],
                    gt.landmarks_xyz[:i_final], graph.uv[:i_final],
                    graph.conf[:i_final], graph.ii[:i_final], n_pad, m_pad,
                    dtype, intrinsics=np.asarray(intr),
                )
                if profiling_on:
                    jax.block_until_ready((st0, prob.gaps, prob.landmarks_uv))
            if w == 0 and cfg.window0_init_f64:
                o64 = _window0_init_f64_cpu(st0, prob, lamda, init_iters,
                                            solver_w)
                if o64 is not None:
                    st0 = jnp.asarray(o64, jd)
                    init_iters = 0
            if cfg.use_prior and w > 0 and prior_full is not None:
                ps, hs, hr, a, b = prior_full
                prop_pad = np.zeros((n_pad, 10))
                prop_pad[:, 6] = 1.0
                Hs_pad = np.zeros((n_pad, 6, 6))
                Hr_pad = np.zeros((n_pad, 3, 3))
                val = np.zeros(n_pad)
                prop_pad[a:b] = ps
                Hs_pad[a:b] = hs
                Hr_pad[a:b] = hr
                val[a:b] = 1.0
                prior = ba.PriorState(
                    jnp.asarray(prop_pad, jd), jnp.asarray(Hs_pad, jd),
                    jnp.asarray(Hr_pad, jd), jnp.asarray(val, jd),
                )
                with timer.stage("solve"):
                    out_states, lam_new, last_h, mean_res = attempt(
                        lambda l0: solve_window_reg(st0, prob, prior, l0,
                                                    cfg.num_iters, solver_w),
                        st0, ctx=(st0, prob, prior, 0, solver_w))
            else:
                with timer.stage("solve"):
                    out_states, lam_new, last_h, mean_res = attempt(
                        lambda l0: solve_window(
                            st0, prob, l0, jnp.asarray(init_iters),
                            cfg.num_iters, solver_w), st0,
                        ctx=(st0, prob, None, init_iters, solver_w))
            cur_states = np.asarray(out_states)[:t_final]

        last_hessian = np.asarray(last_h)
        lamda = float(lam_new)
        t_prev = t_final
        i_prev = i_final

        if bounded or track:
            # honest terminal marginal information for the next window's
            # anchor prior (Schur complement over the just-solved window)
            extra = np.zeros((prob.gaps.shape[0], 9, 9))
            if extra_diag0 is not None:
                extra[0] = extra_diag0
            with timer.stage("marginal"):
                info_w = np.asarray(_marginal_info_jit(
                    out_states, prob, solver,
                    extra_diag=jnp.asarray(extra, jd)
                ), dtype=np.float64)
            if bounded:
                marg_info = info_w
            if track:
                nees_infos.append(info_w)
                nees_est.append(cur_states[-1].copy())
                gt_t = gt.states[t_final - 1].copy()
                # gt.states' knot velocities are forward differences and the
                # SEQUENCE-final knot has none (zero pad) — use the central
                # difference of the 1 Hz GT orbit instead
                ti = int(knot_t[t_final - 1])
                lo = max(ti - 1, 0)
                hi = min(ti + 1, orbit_pos_eci_km.shape[0] - 1)
                gt_t[7:10] = ((orbit_pos_eci_km[hi] - orbit_pos_eci_km[lo])
                              / max(hi - lo, 1))
                nees_gt.append(gt_t)
                if metrics is not None:
                    from vinsat_tpu.evalx import calibration

                    metrics.log("nees", window=w, **calibration.block_nees(
                        nees_est[-1], nees_gt[-1], info_w))

        end_err = np.linalg.norm(
            cur_states[-1:, :3] - gt.states[t_final - 1:t_final, :3], axis=-1
        )
        errors.append(end_err)
        times.append(knot_t[t_final - 1:t_final])

        if metrics is not None:
            import time as _time

            metrics.log_window(
                window_idx=w, num_knots=t_final, num_obs=i_final,
                mean_residual=float(mean_res), lamda=lamda,
                wall_s=_time.time() - getattr(metrics, "_t0", _time.time()),
                end_error_km=float(end_err[0]),
            )
            metrics._t0 = _time.time()
        if checkpoint_path is not None:
            from vinsat_tpu.utils import checkpoint as ckpt

            ck_extra = ({} if marg_info is None
                        else {"marg_info": marg_info,
                              "i_prev": np.array(i_prev)})
            if track and nees_infos:
                ck_extra.update(nees_infos=np.asarray(nees_infos),
                                nees_est=np.asarray(nees_est),
                                nees_gt=np.asarray(nees_gt))
            ckpt.save(
                f"{checkpoint_path}.w{w}.npz", states=cur_states,
                last_hessian=last_hessian, window_idx=w, lamda=lamda,
                knot_times=knot_t[:t_final],
                errors=np.concatenate(errors), times=np.concatenate(times),
                extra=ck_extra,
            )

        if seq_end and t_final < len(knot_t):
            record_tail(t_final)

    if fast:
        # single end-of-stream sync: fetch all deferred error arrays and the
        # per-window solve-health flags in one device_get
        dev_arrays = [e[0] for e in errors if isinstance(e, tuple)]
        fetched = jax.device_get([dev_arrays, fin_dev, out_dev, rms_dev_l])
        fins, out_np, rmss = fetched[1], fetched[2], fetched[3]
        bad_rms = (cfg.recover_rms_px > 0
                   and any(not np.isfinite(r) or r > cfg.recover_rms_px
                           for r in rmss))
        if not all(bool(f) for f in fins) or bad_rms:
            # some window solve produced non-finite states or fit its own
            # observations worse than the recover_rms_px gate: re-run the
            # stream in sync mode, which walks the per-window recovery
            # ladder (`attempt`: damped retry -> f64-on-CPU escalation)
            return stream_orbit(
                det_rows, orbit_pos_eci_km, seed=seed, cfg=cfg,
                solver=solver_in, intrinsics=intrinsics, metrics=metrics,
                checkpoint_path=checkpoint_path, resume_from=resume_from,
                timer=timer if profiling_on else None, fast=False,
            )
        it = iter(fetched[0])
        resolved: List[np.ndarray] = []
        for e in errors:
            if isinstance(e, tuple):
                arr = np.asarray(next(it), dtype=np.float64)
                resolved.append(arr[None] if e[1] == -1 else arr[:e[1]])
            else:
                resolved.append(e)
        errors = resolved
        cur_states = np.asarray(out_np)[:t_prev]

    return StreamingResult(
        errors=np.concatenate(errors) if errors else np.array([]),
        times=np.concatenate(times) if times else np.array([]),
        first_detection=first_detection,
        final_states=cur_states,
        knot_times=knot_t[:t_prev],
        window_infos=np.asarray(nees_infos) if nees_infos else None,
        window_est=np.asarray(nees_est) if nees_est else None,
        window_gt=np.asarray(nees_gt) if nees_gt else None,
        recovery_trips=n_trips,
    )
