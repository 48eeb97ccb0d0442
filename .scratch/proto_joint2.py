"""Round-5 probe: does a per-knot joint refinement (x0 + 3N attitude
deviations, Schur) warm-started FROM the rigid-chain fit beat the rigid
fit alone on the weak real-DB seeds?

Usage: PYTHONPATH=/root/repo python .scratch/proto_joint2.py 15 13 2 6
"""
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from vinsat_tpu import pipeline  # noqa: E402
from vinsat_tpu.core import dynamics, quat  # noqa: E402
from vinsat_tpu.estimation import window as W, refine, factors  # noqa: E402
from vinsat_tpu.estimation.window import StreamingConfig  # noqa: E402
from vinsat_tpu.evalx import crlb  # noqa: E402
from vinsat_tpu.sim import landmarks as lm_mod  # noqa: E402

sys.path.insert(0, "/root/repo/.scratch")
from proto_joint import joint_refine  # noqa: E402

DB = lm_mod.load_reference_db("/root/reference/sim/landmark_csvs")


def run_seed(seed):
    dur = 10800
    sq = pipeline.simulate_sequence(seed, duration_s=dur, db=DB)
    if len(sq.det_rows) == 0:
        print(f"seed {seed}: no detections")
        return
    cfg = StreamingConfig()
    r = pipeline.run_streaming(sq, seed=seed, cfg=cfg)
    prep = W.prepare_stream(sq.det_rows, sq.orbit_pos_eci_km, seed, cfg)
    graph, gt = prep.graph, prep.gt
    knot_t, gaps = prep.knot_t, prep.gaps
    N = r.final_states.shape[0]
    T = sq.orbit_pos_eci_km.shape[0]
    tail_s = float(T - 1 - knot_t[N - 1])
    cb = crlb.terminal_crlb_km(sq.orbit_pos_eci_km, sq.det_rows)

    intr = jnp.asarray(prep.intr_np)
    lm = jnp.asarray(gt.landmarks_xyz)
    uv = jnp.asarray(graph.uv)
    conf = jnp.asarray(graph.conf)
    ii = jnp.asarray(graph.ii)
    M = len(graph.ii)
    ov = jnp.ones(M)
    g_fit = jnp.asarray(np.concatenate([gaps[:N - 1], [0.0]]))
    hops = int(np.ceil(max(float(gaps[:N - 1].max()) if N > 1 else 1.0, 1.0)
                       / 100.0)) + 1
    gt_end = jnp.asarray(sq.orbit_pos_eci_km[T - 1])

    def term_err(x_lastknot):
        p1, v1, _ = dynamics.propagate_gaps_with_jacobian(
            x_lastknot[None, :3], x_lastknot[None, 3:],
            jnp.asarray([tail_s]), num_hops=int(np.ceil(tail_s / 100)) + 1,
            max_substep=100.0)
        return float(jnp.linalg.norm(p1[0] - gt_end))

    # the streaming final_states ALREADY carry the rigid-chain refinement
    # (tail_refine_rigid default) for pos/vel+attitudes
    st = jnp.asarray(r.final_states[:N])
    e_stream = term_err(jnp.concatenate([st[-1, :3], st[-1, 7:10]]))
    print(f"seed {seed}: stream(final w/ rigid) err@end {e_stream:8.3f} "
          f"(recorded {r.errors[-1]:.3f})  CRLB {cb['crlb_final_km']:.2f} "
          f"N={N} M={M}", flush=True)

    # per-knot joint refinement from the (already rigid-refined) states
    for sig in (5e-4, 2e-3):
        xs, phi, res, res0 = joint_refine(
            st, g_fit, lm, uv, conf, ii, ov, intr, N, att_sigma=sig,
            num_iters=24, num_hops=hops)
        e = term_err(xs[N - 1])
        print(f"  joint sig={sig:g}: res {float(res0):.3f}->{float(res):.3f}"
              f" px  |phi| med {float(jnp.median(jnp.linalg.norm(phi, axis=1))):.1e}"
              f"  err@end {e:9.3f} km", flush=True)


for s in [int(x) for x in sys.argv[1:]] or [15]:
    run_seed(s)
