"""Diagnose the weak-tail CRLB gap: is the shooting fit (a) failing to
reach the residual optimum, or (b) reaching a BIASED optimum (attitude
plug-in bias / objective mismatch)?

Evaluates the shooting objective + terminal error at four parameter
points for one weak seed:
  1. refined x0 (streaming + shooting), streaming attitudes
  2. GT x0, streaming attitudes
  3. GT x0, GT attitudes
  4. shooting fit STARTED at GT x0 (streaming attitudes)
"""
import sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from vinsat_tpu import pipeline  # noqa: E402
from vinsat_tpu.estimation import window as W, refine, factors  # noqa: E402
from vinsat_tpu.estimation.window import StreamingConfig  # noqa: E402
from vinsat_tpu.evalx import crlb  # noqa: E402

seed = int(sys.argv[1]) if len(sys.argv) > 1 else 13
dur = 10800
sq = pipeline.simulate_sequence(seed, duration_s=dur)
cfg = StreamingConfig()
r = pipeline.run_streaming(sq, seed=seed, cfg=cfg)
print(f"stream: min {r.errors.min():.3f} km final {r.errors[-1]:.3f} km",
      flush=True)

prep = W.prepare_stream(sq.det_rows, sq.orbit_pos_eci_km, seed, cfg)
graph, gt = prep.graph, prep.gt
knot_t, gaps = prep.knot_t, prep.gaps
N = r.final_states.shape[0]
T = sq.orbit_pos_eci_km.shape[0]
tail_s = float(T - 1 - knot_t[N - 1])
print(f"N knots (solved span) {N} / {len(knot_t)} total, tail {tail_s:.0f} s")

cb = crlb.terminal_crlb_km(sq.orbit_pos_eci_km, sq.det_rows)
print(f"CRLB final {cb['crlb_final_km']:.3f} km  n_obs {cb['n_obs']}")

intr = jnp.asarray(prep.intr_np)
lm = jnp.asarray(gt.landmarks_xyz)
uv = jnp.asarray(graph.uv)
conf = jnp.asarray(graph.conf)
ii = jnp.asarray(graph.ii)
M = len(graph.ii)
ov = jnp.ones(M)
g_span = jnp.asarray(np.concatenate([gaps[:N - 1], [max(tail_s, 0.0)]]))
hops = int(np.ceil(max(float(g_span.max()), 1.0) / 100.0)) + 1

q_est = jnp.asarray(r.final_states[:N, 3:7])
q_gt = jnp.asarray(gt.states[:N, 3:7])
gt_end = jnp.asarray(
    np.concatenate([sq.orbit_pos_eci_km[T - 1],
                    gt.states[N - 1, 7:10]]))  # only pos used


def probe(x0, q_fix, label):
    xs, Phis = refine._rollout_with_sensitivity(x0, g_span, hops, 100.0)
    # rows: x0=knot0, knots 1..N-1, arc end
    st10 = jnp.concatenate([xs[:N, :3], q_fix, xs[:N, 3:]], axis=-1)
    rp = factors.reprojection_factor(st10, lm, ii, intr)
    res = (jnp.abs(uv - rp.uv) * conf[:, None]).sum() / (2.0 * conf.sum())
    # weighted L2 too (the GN objective)
    res2 = jnp.sqrt((((uv - rp.uv) ** 2) * conf[:, None]).sum()
                    / (2.0 * conf.sum()))
    err_end = jnp.linalg.norm(xs[-1, :3] - gt_end[:3])
    err_lastknot = jnp.linalg.norm(
        xs[N - 1, :3] - jnp.asarray(gt.states[N - 1, :3]))
    print(f"{label:36s} meanabs {float(res):8.4f} px  rms {float(res2):8.4f} "
          f"px  err@lastknot {float(err_lastknot):9.3f} km  "
          f"err@end {float(err_end):9.3f} km", flush=True)
    return res


x0_ref = jnp.concatenate([jnp.asarray(r.final_states[0, :3]),
                          jnp.asarray(r.final_states[0, 7:10])])
x0_gt = jnp.concatenate([jnp.asarray(gt.states[0, :3]),
                         jnp.asarray(gt.states[0, 7:10])])

probe(x0_ref, q_est, "refined x0, streaming attitudes")
probe(x0_gt, q_est, "GT x0, streaming attitudes")
probe(x0_gt, q_gt, "GT x0, GT attitudes")
probe(x0_ref, q_gt, "refined x0, GT attitudes")

# shooting fit started at GT x0 with streaming attitudes: does the
# residual optimum sit AWAY from GT (bias) or does the optimizer fail?
st_gt_start = np.array(r.final_states[:N])
st_gt_start[0, :3] = gt.states[0, :3]
st_gt_start[0, 7:10] = gt.states[0, 7:10]
out = refine.shooting_refine(
    jnp.asarray(st_gt_start), jnp.asarray(np.concatenate(
        [gaps[:N - 1], [0.0]])), lm, uv, conf, ii, ov, intr,
    num_hops=hops, num_iters=20)
x0_fit = jnp.concatenate([out.states_pv[0, :3], out.states_pv[0, 3:]])
print(f"fit-from-GT: res0 {float(out.residual0):.4f} -> "
      f"res {float(out.residual):.4f}")
probe(x0_fit, q_est, "fit from GT x0, streaming atts")

# and with GT attitudes fixed (pure test of the 6-dof objective)
st_gt_q = np.array(st_gt_start)
st_gt_q[:, 3:7] = gt.states[:N, 3:7]
out2 = refine.shooting_refine(
    jnp.asarray(st_gt_q), jnp.asarray(np.concatenate(
        [gaps[:N - 1], [0.0]])), lm, uv, conf, ii, ov, intr,
    num_hops=hops, num_iters=20)
x0_fit2 = jnp.concatenate([out2.states_pv[0, :3], out2.states_pv[0, 3:]])
print(f"fit-from-GT (GT atts): res0 {float(out2.residual0):.4f} -> "
      f"res {float(out2.residual):.4f}")
probe(x0_fit2, q_gt, "fit from GT x0, GT atts")

# attitude error magnitude of the streaming estimate
dq = np.abs(np.asarray(q_est) - np.asarray(q_gt)).max(axis=1)
ang = 2 * np.arcsin(np.clip(np.linalg.norm(
    np.asarray(q_est)[:, :3] - np.asarray(q_gt)[:, :3], axis=1) / 1, 0, 1))
print(f"attitude err: max|dq| {dq.max():.2e}, rough ang median "
      f"{np.median(ang):.2e} rad")
