"""Distributed streaming OD driver: windows sequenced on host, each
window's knots sharded over the mesh "arc" axis.

This brings the DISTRIBUTED path to solver parity with the single-chip
streaming driver (estimation/window.stream_orbit ≙ od_pipe.py:911-1062):
the same window split, inter-window propagation, per-window LM chain with
the run-to-max best-iterate budget, vision-only init on window 0, anchor-
marginal prior (bounded-memory mode), and error recording — but every
window solve runs as ONE jitted shard_map program over the ("orbit",
"arc") mesh (halo exchanges + SPIKE solve + psum'd residual means,
dist/sharded_ba.py).  This is the production shape for long-horizon arcs
(BASELINE.json config 5): window streaming bounds host memory while arc
sharding bounds per-device work.

Layout notes:
  * observations use the scatter-free per-knot budget (N, D, ...) of
    ShardedProblem; D is the window's max obs/knot rounded to a power of
    two, so NO observation is dropped and parity with the ragged single-
    chip layout is exact;
  * knot padding rounds the window's bucketed size up to a multiple of the
    arc-axis size (bucketed growth caps the number of compiled shapes);
  * inter-window propagation (a cheap sequential scan) and the terminal-
    marginal Schur complement run host-side on a single device — they are
    O(window) and not worth a mesh program.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from vinsat_tpu.estimation import ba, ingest
from vinsat_tpu.estimation.window import (StreamingConfig, StreamingResult,
                                          _marginal_info_jit,
                                          _multi_pass_window, _pad_prob,
                                          _window0_init_f64_cpu, bucket,
                                          prepare_stream, propagate_segment)
from vinsat_tpu.dist import sharded_ba

# Shard a window over the "arc" axis only at or above this many (bucketed)
# knots; below it the whole window solves on ONE device of the mesh.
# Measured crossover of the full window solve on the 8-virtual-device CPU
# mesh (dist/bench_scaling.py --dispatch-scan, SCALING_r04.json): single
# device wins up to 128 knots (halo + psum + SPIKE overhead dominates),
# sharding wins from 256.  Real multi-chip shards own their own silicon,
# so 256 is the conservative end; override per deployment via the
# `shard_min_knots` argument.
SHARD_MIN_KNOTS_DEFAULT = 256


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _pow2(n: int, minimum: int = 2) -> int:
    return max(minimum, 1 << (max(n, 1) - 1).bit_length())


def _build_window_problem(states_w, gaps_w, cum_w, lm_w, uv_w, conf_w, ii_w,
                          n_pad: int, d_pad: int, intr_np, dtype
                          ) -> sharded_ba.ShardedProblem:
    """Ragged window slice -> per-knot-budget ShardedProblem (B=1).

    ii_w is window-local (0-based).  d_pad must be >= the max obs count of
    any knot (no observation may drop — parity with the single-chip ragged
    layout)."""
    n = states_w.shape[0]
    st = np.zeros((n_pad, 10))
    st[:, 6] = 1.0
    st[:n] = states_w
    g = np.zeros(n_pad)
    g[:n] = gaps_w
    cr = np.zeros((n_pad, 4))
    cr[:, 3] = 1.0
    cr[:n] = cum_w

    lm = np.zeros((n_pad, d_pad, 3))
    uv = np.zeros((n_pad, d_pad, 2))
    cf = np.zeros((n_pad, d_pad))
    ov = np.zeros((n_pad, d_pad))
    fill = np.zeros(n_pad, dtype=int)
    for j, k in enumerate(ii_w):
        s = fill[k]
        assert s < d_pad, (k, s, d_pad)
        lm[k, s] = lm_w[j]
        uv[k, s] = uv_w[j]
        cf[k, s] = conf_w[j]
        ov[k, s] = 1.0
        fill[k] += 1

    kv = np.zeros(n_pad)
    kv[:n] = 1.0
    pv = np.zeros(n_pad)
    pv[: max(n - 1, 0)] = 1.0
    jd = jnp.dtype(dtype)
    return sharded_ba.ShardedProblem(
        states=jnp.asarray(st, jd)[None],
        gaps=jnp.asarray(g, jd)[None],
        cum_rot=jnp.asarray(cr, jd)[None],
        lm_xyz=jnp.asarray(lm, jd)[None],
        uv=jnp.asarray(uv, jd)[None],
        conf=jnp.asarray(cf, jd)[None],
        obs_valid=jnp.asarray(ov, jd)[None],
        pair_valid=jnp.asarray(pv, jd)[None],
        intrinsics=jnp.asarray(intr_np, jd),
        knot_valid=jnp.asarray(kv, jd)[None],
    )


def stream_orbit_sharded(det_rows: np.ndarray, orbit_pos_eci_km: np.ndarray,
                         mesh: Mesh, seed: int = 0,
                         cfg: StreamingConfig = StreamingConfig(),
                         solver: ba.SolverParams = ba.SolverParams(),
                         intrinsics: Optional[np.ndarray] = None,
                         shard_min_knots: int = -1) -> StreamingResult:
    """Streaming OD with each window solved across the mesh "arc" axis —
    when the window is big enough to profit from it.

    Mirrors `window.stream_orbit`'s sync path (same prep, window split,
    propagation, λ schedule, iteration budget, error recording); supported
    modes: growing-prefix (default) and bounded-memory `marginalize=True`
    (anchor knot carrying the TRUE terminal marginal as a sharded BA_reg
    prior).  The deterministic prep (prepare_stream) is shared with the
    single-chip driver, so results are comparable sequence-for-sequence.

    shard_min_knots: windows below this bucketed knot count solve on ONE
    device (every process computes the identical replicated solve — no
    collectives, no halo padding); -1 = the measured default
    (SHARD_MIN_KNOTS_DEFAULT).  0 shards everything (the pre-policy
    behavior, kept for the overhead benchmarks).
    """
    n_arc = mesh.shape["arc"]
    if shard_min_knots < 0:
        shard_min_knots = SHARD_MIN_KNOTS_DEFAULT
    # one-device submesh for small windows: prefer a device this process
    # owns (under multi-process gloo, non-addressable devices cannot run
    # a local replicated solve)
    try:
        one_dev = mesh.local_mesh.devices.flat[0]
    except Exception:
        import jax

        one_dev = jax.local_devices()[0]
    mesh_one = Mesh(np.asarray([one_dev]).reshape(1, 1),
                    axis_names=("orbit", "arc"))
    dtype = cfg.dtype
    jd = jnp.dtype(dtype)

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

    windows = ingest.split_windows(graph.ii, knot_t)
    first_detection = int(knot_t[windows[0][0] - 1])

    max_hops = int(np.ceil(gaps.max() / solver.max_substep)) + 1
    solver = solver._replace(
        num_hops=max(solver.num_hops, max_hops),
        max_iters=solver.max_iters if solver.max_iters > 0
        else cfg.max_iters)
    # reduced budget for growing-prefix later windows (window.py: measured
    # identical accuracy at >= 24 iterations once a window holds >= 2
    # passes); bounded later windows keep the full budget
    solver_later = solver
    if cfg.max_iters_later > 0 and solver.max_iters > 0 and not cfg.marginalize:
        solver_later = solver._replace(
            max_iters=min(solver.max_iters, max(cfg.max_iters_later,
                                                cfg.num_iters + 1)))

    errors = []
    times = []
    cur_states: Optional[np.ndarray] = None
    marg_info: Optional[np.ndarray] = None
    t_prev = 0
    i_prev = 0
    bounded = cfg.marginalize

    # per-(shape, mode) solver cache: make_sharded_window_solver builds a
    # fresh shard_map'd program; the jit cache underneath still keys on
    # shapes, but keeping one solver per mode avoids re-tracing the mesh
    solvers: Dict[Tuple, object] = {}

    def get_solver(init_iters: int, with_prior: bool, later: bool,
                   small: bool):
        key = (init_iters, with_prior, later, small)
        if key not in solvers:
            solvers[key] = sharded_ba.make_sharded_window_solver(
                mesh_one if small else mesh,
                solver_later if later else solver,
                num_iters=cfg.num_iters, init_iters=init_iters,
                with_prior=with_prior)
        return solvers[key]

    def pad_sizes(Nw: int, i0: int, i1: int, k0: int):
        nb = bucket(Nw, cfg.knot_bucket)
        # dispatch policy: small windows stay on one device (no arc-axis
        # rounding needed), large ones shard over the full arc axis
        small = shard_min_knots > 0 and nb < shard_min_knots
        n_pad = nb if small else _round_up(nb, n_arc)
        counts = np.bincount(graph.ii[i0:i1] - k0, minlength=1)
        d_pad = _pow2(int(counts.max()) if len(counts) else 1)
        return n_pad, d_pad, small

    def propagate(last_state, t_init, t_stop):
        span = int(knot_t[t_stop - 1] - knot_t[t_init - 1])
        om = gt.omega_full[knot_t[t_init - 1]:knot_t[t_stop - 1]]
        max_len = bucket(span, cfg.prop_bucket, cfg.prop_bucket)
        om_pad = np.zeros((max_len, 3))
        om_pad[:om.shape[0]] = om
        path = np.asarray(propagate_segment(
            jnp.asarray(last_state, jd), jnp.asarray(om_pad, jd),
            jnp.asarray(span), max_len,
        ))
        new_knots = knot_t[t_init:t_stop] - knot_t[t_init - 1]
        return path[new_knots]

    def compose_prior_blocks(H9):
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

    def window_marginal(states_w, gaps_w, cum_w, lm_w, uv_w, conf_w, ii_w,
                        extra_diag0):
        """Terminal marginal of the just-solved window (host-side single-
        device Schur scan — identical math to the single-chip driver)."""
        n = states_w.shape[0]
        m = len(ii_w)
        prob = ba.BAProblem(
            gaps=jnp.asarray(gaps_w, jd),
            cum_rot=jnp.asarray(cum_w, jd),
            landmarks_xyz=jnp.asarray(lm_w, jd),
            landmarks_uv=jnp.asarray(uv_w, jd),
            conf=jnp.asarray(conf_w, jd),
            ii=jnp.asarray(ii_w, jnp.int32),
            obs_valid=jnp.ones(m, jd),
            knot_valid=jnp.ones(n, jd),
            pair_valid=jnp.ones(max(n - 1, 1), jd),
            intrinsics=jnp.asarray(intr_np, jd),
        )
        extra = np.zeros((n, 9, 9))
        if extra_diag0 is not None:
            extra[0] = extra_diag0
        return np.asarray(_marginal_info_jit(
            jnp.asarray(states_w, jd), prob, solver,
            extra_diag=jnp.asarray(extra, jd)), dtype=np.float64)

    for w, (t_final, i_final, seq_end) in enumerate(windows):
        extra_diag0 = None
        if w == 0:
            k0 = 0
            window_states = states[:t_final]
        else:
            t_init = t_prev
            states_prop = propagate(cur_states[-1], t_init, t_final)
            err_prop = np.linalg.norm(
                states_prop[:, :3] - gt.states[t_init:t_final, :3], axis=-1
            )[:-1]
            errors.append(err_prop)
            times.append(knot_t[t_init:t_final][:-1])

            if bounded and marg_info is not None:
                k0 = t_prev - 1
                window_states = np.concatenate(
                    [cur_states[-1:], states_prop], axis=0)
            else:
                k0 = 0
                window_states = np.concatenate([cur_states, states_prop],
                                               axis=0)

        i0 = i_prev if (w > 0 and bounded and marg_info is not None) else 0
        Nw = t_final - k0
        n_pad, d_pad, small = pad_sizes(Nw, i0, i_final, k0)

        prob = _build_window_problem(
            window_states, gaps[k0:t_final], cum_rot[k0:t_final],
            gt.landmarks_xyz[i0:i_final], graph.uv[i0:i_final],
            graph.conf[i0:i_final], graph.ii[i0:i_final] - k0,
            n_pad, d_pad, intr_np, dtype,
        )

        init_iters = cfg.init_iters if w == 0 else 0
        if w == 0 and cfg.window0_init_f64:
            # proactive window-0 basin hardening, identical to the single-
            # chip driver (window.py StreamingConfig.window0_init_f64):
            # the init phase re-runs in f64 on the host CPU and the mesh
            # solve warm-starts from it (no-op on f64 streams)
            m_pad = bucket(max(i_final, 1), cfg.obs_bucket, cfg.obs_bucket)
            flat = _pad_prob(t_final, gaps[:t_final], cum_rot[:t_final],
                             gt.landmarks_xyz[:i_final], graph.uv[:i_final],
                             graph.conf[:i_final], graph.ii[:i_final],
                             n_pad, m_pad, dtype, intrinsics=intr_np)
            st_np = np.zeros((n_pad, 10))
            st_np[:, 6] = 1.0
            st_np[:t_final] = window_states
            o64 = _window0_init_f64_cpu(jnp.asarray(st_np, jd), flat,
                                        cfg.lambda_init, init_iters, solver)
            if o64 is not None:
                window_states = o64[:t_final]
                init_iters = 0
                prob = _build_window_problem(
                    window_states, gaps[k0:t_final], cum_rot[k0:t_final],
                    gt.landmarks_xyz[i0:i_final], graph.uv[i0:i_final],
                    graph.conf[i0:i_final], graph.ii[i0:i_final] - k0,
                    n_pad, d_pad, intr_np, dtype,
                )
        use_prior = bounded and w > 0 and marg_info is not None
        prior = None
        if use_prior:
            H9_infl = ba.inflate_info(marg_info, cfg.prior_pos_floor_km,
                                      cfg.prior_rot_floor, cfg.prior_vel_floor)
            Hs0, Hr0, extra_diag0 = compose_prior_blocks(H9_infl)
            ps = np.zeros((n_pad, 10))
            ps[:, 6] = 1.0
            ps[0] = cur_states[-1]
            Hs = np.zeros((n_pad, 6, 6))
            Hr = np.zeros((n_pad, 3, 3))
            val = np.zeros(n_pad)
            Hs[0] = Hs0
            Hr[0] = Hr0
            val[0] = 1.0
            prior = sharded_ba.ShardedPrior(
                prop_states=jnp.asarray(ps, jd)[None],
                H_state=jnp.asarray(Hs, jd)[None],
                H_rot=jnp.asarray(Hr, jd)[None],
                valid=jnp.asarray(val, jd)[None],
            )

        # observability-gated reduced budget, identical rule to the
        # single-chip driver (window._multi_pass_window)
        later = (not bounded and w > 0
                 and _multi_pass_window(knot_t[graph.ii[:i_final]], cfg))
        solve = get_solver(init_iters, use_prior, later=later, small=small)
        lam0 = jnp.full((1,), cfg.lambda_init, jd)
        if use_prior:
            out_b, _, _ = solve(lam0, prob, prior)
        else:
            out_b, _, _ = solve(lam0, prob)
        out_np = np.asarray(out_b[0])[:Nw]
        if not np.isfinite(out_np).all():
            # failure recovery parity (window.attempt): re-run heavily damped,
            # then fall back to the warm start
            lam_hi = jnp.full((1,), 1e2, jd)
            out_b, _, _ = (solve(lam_hi, prob, prior) if use_prior
                           else solve(lam_hi, prob))
            out_np = np.asarray(out_b[0])[:Nw]
            if not np.isfinite(out_np).all():
                out_np = window_states

        if bounded:
            marg_info = window_marginal(
                out_np, gaps[k0:t_final], cum_rot[k0:t_final],
                gt.landmarks_xyz[i0:i_final], graph.uv[i0:i_final],
                graph.conf[i0:i_final], graph.ii[i0:i_final] - k0,
                extra_diag0,
            )

        if k0 > 0:
            cur_states = np.concatenate([cur_states[:-1], out_np], axis=0)
        else:
            cur_states = out_np
        t_prev = t_final
        i_prev = i_final

        end_err = np.linalg.norm(
            cur_states[-1:, :3] - gt.states[t_final - 1:t_final, :3], axis=-1)
        errors.append(end_err)
        times.append(knot_t[t_final - 1:t_final])

        if seq_end and t_final < len(knot_t):
            if cfg.tail_refine:
                # terminal refinement before the open-loop tail, identical
                # to the single-chip record_tail (estimation/refine.py);
                # runs as a plain single-device program — O(arc) work not
                # worth a mesh dispatch
                from vinsat_tpu.estimation import refine

                cur_states = refine.refine_terminal(
                    cur_states, gaps[:t_final], gt.landmarks_xyz,
                    graph.uv, graph.conf, graph.ii, intr_np, dtype,
                    max_substep=solver.max_substep,
                    cum_rot=(cum_rot[:t_final] if cfg.tail_refine_rigid
                             else None),
                    att_sigma=cfg.tail_refine_att_sigma,
                    ratio=cfg.tail_refine_ratio,
                )
            states_prop = propagate(cur_states[-1], t_final, len(knot_t))
            errors.append(np.linalg.norm(
                states_prop[:, :3] - gt.states[t_final:, :3], axis=-1))
            times.append(knot_t[t_final:])

    return StreamingResult(
        errors=np.concatenate(errors) if errors else np.array([]),
        times=np.concatenate(times) if times else np.array([]),
        first_detection=first_detection,
        final_states=cur_states,
        knot_times=knot_t[:t_prev],
    )
