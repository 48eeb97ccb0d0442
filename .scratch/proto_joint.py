"""Prototype: joint [x0 (6) + per-knot attitude (3N, prior-anchored)]
shooting refinement via Schur complement.  Measures terminal error vs the
fixed-attitude shooting fit on weak-tail seeds."""
import sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp  # noqa: E402

from vinsat_tpu import pipeline  # noqa: E402
from vinsat_tpu.core import quat  # noqa: E402
from vinsat_tpu.estimation import window as W, refine, factors  # noqa: E402
from vinsat_tpu.estimation.window import StreamingConfig  # noqa: E402
from vinsat_tpu.evalx import crlb  # noqa: E402


def joint_refine(states, gaps, lm, uv, conf, ii, ov, intr, n_valid,
                 att_sigma=2e-3, num_iters=24, num_hops=16):
    dtype = states.dtype
    N = states.shape[0]
    q_fix = states[:, 3:7]
    x0_init = jnp.concatenate([states[0, :3], states[0, 7:10]])
    w = conf * ov
    inv_s2 = 1.0 / (att_sigma ** 2)
    knot_live = jnp.zeros(N).at[ii].add(ov) > 0  # knots with any obs

    def residuals(x0, phi):
        xs, Phis = refine._rollout_with_sensitivity(x0, gaps[:-1], num_hops,
                                                    100.0)
        q = quat.box_plus(q_fix, phi)
        st10 = jnp.concatenate([xs[:, :3], q, xs[:, 3:]], axis=-1)
        rp = factors.reprojection_factor(st10, lm, ii, intr)
        r = (uv - rp.uv) * ov[:, None]
        Jx = jnp.einsum("mij,mjk->mik", rp.J[:, :, 0:3], Phis[ii][:, 0:3, :])
        Jp = rp.J[:, :, 3:6]
        return r, Jx, Jp, xs

    def obj(r, phi):
        return 0.5 * ((r ** 2) * w[:, None]).sum() \
            + 0.5 * inv_s2 * (phi ** 2).sum()

    def mean_abs(r):
        return (jnp.abs(r) * w[:, None]).sum() / jnp.maximum(2 * w.sum(), 1.)

    def gn_step(carry, _):
        x0, phi, lam, bx, bp, bobj = carry
        r, Jx, Jp, _ = residuals(x0, phi)
        f = obj(r, phi)
        take = f < bobj
        bx = jnp.where(take, x0, bx)
        bp = jnp.where(take, phi, bp)
        bobj = jnp.where(take, f, bobj)
        Wm = w[:, None, None]
        H00 = jnp.einsum("mki,mkj->ij", Jx * Wm, Jx)
        g0 = jnp.einsum("mki,mk->i", Jx * Wm, r)
        A = jnp.zeros((N, 3, 3), dtype).at[ii].add(
            jnp.einsum("mki,mkj->mij", Jp * Wm, Jp))
        A = A + inv_s2 * jnp.eye(3, dtype=dtype)
        gi = jnp.zeros((N, 3), dtype).at[ii].add(
            jnp.einsum("mki,mk->mi", Jp * Wm, r)) - inv_s2 * phi
        B = jnp.zeros((N, 6, 3), dtype).at[ii].add(
            jnp.einsum("mki,mkj->mij", Jx * Wm, Jp))
        Ainv = jnp.linalg.inv(A)
        H_s = H00 - jnp.einsum("nij,njk,nlk->il", B, Ainv, B)
        g_s = g0 - jnp.einsum("nij,njk,nk->i", B, Ainv, gi)
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(H_s), 1e-30))
        Hs = H_s * s[:, None] * s[None, :] + lam * jnp.eye(6, dtype=dtype)
        dx = s * jnp.linalg.solve(Hs, s * g_s)
        dphi = jnp.einsum("nij,nj->ni", Ainv,
                          gi - jnp.einsum("nkj,k->nj", B, dx))
        x0n = x0 + dx
        phin = phi + dphi
        r1, _, _, _ = residuals(x0n, phin)
        f1 = obj(r1, phin)
        acc = f1 < f
        x0 = jnp.where(acc, x0n, x0)
        phi = jnp.where(acc, phin, phi)
        lam = jnp.where(acc, jnp.maximum(lam * 0.3, 1e-12), lam * 10.0)
        return (x0, phi, lam, bx, bp, bobj), f

    phi0 = jnp.zeros((N, 3), dtype)
    r0, _, _, _ = residuals(x0_init, phi0)
    carry0 = (x0_init, phi0, jnp.asarray(1e-8, dtype), x0_init, phi0,
              obj(r0, phi0))
    (x0, phi, _, bx, bp, bobj), _ = jax.lax.scan(gn_step, carry0, None,
                                                 length=num_iters)
    r_l, _, _, _ = residuals(x0, phi)
    use_last = obj(r_l, phi) <= bobj
    x0 = jnp.where(use_last, x0, bx)
    phi = jnp.where(use_last, phi, bp)
    r, _, _, xs = residuals(x0, phi)
    return xs, phi, mean_abs(r), mean_abs(r0)


def global_att_refine(states, gaps, lm, uv, conf, ii, ov, intr, cum_rot,
                      att_sigma=5e-3, num_iters=24, num_hops=16):
    """9-dof fit: x0 (6) + ONE attitude correction delta (3) applied at
    knot 0 and transported through the KNOWN angular-rate chain:
      q_i(delta) = q_est_i ⊞ (R(C_i)^T delta),  C_i = c_0 ⊗ ... ⊗ c_{i-1}.
    """
    dtype = states.dtype
    N = states.shape[0]
    q_fix = states[:, 3:7]
    x0_init = jnp.concatenate([states[0, :3], states[0, 7:10]])
    w = conf * ov
    inv_s2 = 1.0 / (att_sigma ** 2)

    # prefix chain C_i (N, 4): C_0 = I, C_{i+1} = C_i ⊗ c_i
    ident = jnp.zeros((1, 4), dtype).at[0, 3].set(1.0)
    C = jax.lax.associative_scan(
        quat.multiply, jnp.concatenate([ident, cum_rot[:-1]], axis=0))
    Rt = jnp.swapaxes(quat.to_matrix(C), -1, -2)  # R(C_i)^T (N, 3, 3)

    # RIGID attitude chain: q_i(delta) = (q0_est ⊞ delta) ⊗ C_i — the
    # known angular-rate integration makes attitudes a 3-dof family; the
    # streaming per-knot estimates wiggle around this chain with the pixel
    # noise, and those wiggles are what bias the fixed-attitude fit.
    q_chain_base = quat.normalize(quat.multiply(
        jnp.broadcast_to(q_fix[0], (N, 4)), C))

    def residuals(x0, delta):
        xs, Phis = refine._rollout_with_sensitivity(x0, gaps[:-1], num_hops,
                                                    100.0)
        eps = jnp.einsum("nij,j->ni", Rt, delta)  # per-knot transported corr
        q = quat.box_plus(q_chain_base, eps)
        st10 = jnp.concatenate([xs[:, :3], q, xs[:, 3:]], axis=-1)
        rp = factors.reprojection_factor(st10, lm, ii, intr)
        r = (uv - rp.uv) * ov[:, None]
        Jx = jnp.einsum("mij,mjk->mik", rp.J[:, :, 0:3], Phis[ii][:, 0:3, :])
        Jd = jnp.einsum("mij,mjk->mik", rp.J[:, :, 3:6], Rt[ii])  # (M, 2, 3)
        J = jnp.concatenate([Jx, Jd], axis=-1)  # (M, 2, 9)
        return r, J, xs

    def obj(r, delta):
        return 0.5 * ((r ** 2) * w[:, None]).sum() \
            + 0.5 * inv_s2 * (delta ** 2).sum()

    def mean_abs(r):
        return (jnp.abs(r) * w[:, None]).sum() / jnp.maximum(2 * w.sum(), 1.)

    def gn_step(carry, _):
        th, lam, bth, bobj = carry
        x0, delta = th[:6], th[6:]
        r, J, _ = residuals(x0, delta)
        f = obj(r, delta)
        take = f < bobj
        bth = jnp.where(take, th, bth)
        bobj = jnp.where(take, f, bobj)
        JW = J * w[:, None, None]
        H = jnp.einsum("mki,mkj->ij", JW, J)
        H = H.at[6:, 6:].add(inv_s2 * jnp.eye(3, dtype=dtype))
        g = jnp.einsum("mki,mk->i", JW, r)
        g = g.at[6:].add(-inv_s2 * delta)
        s = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-30))
        Hs = H * s[:, None] * s[None, :] + lam * jnp.eye(9, dtype=dtype)
        dth = s * jnp.linalg.solve(Hs, s * g)
        thn = th + dth
        r1, _, _ = residuals(thn[:6], thn[6:])
        f1 = obj(r1, thn[6:])
        acc = f1 < f
        th = jnp.where(acc, thn, th)
        lam = jnp.where(acc, jnp.maximum(lam * 0.3, 1e-12), lam * 10.0)
        return (th, lam, bth, bobj), f

    th0 = jnp.concatenate([x0_init, jnp.zeros(3, dtype)])
    r0, _, _ = residuals(x0_init, th0[6:])
    carry0 = (th0, jnp.asarray(1e-8, dtype), th0, obj(r0, th0[6:]))
    (th, _, bth, bobj), _ = jax.lax.scan(gn_step, carry0, None,
                                         length=num_iters)
    r_l, _, _ = residuals(th[:6], th[6:])
    th = jnp.where(obj(r_l, th[6:]) <= bobj, th, bth)
    r, _, xs = residuals(th[:6], th[6:])
    return xs, th[6:], mean_abs(r), mean_abs(r0)


def run_seed(seed, att_sigmas=(0.0, 2e-3, 1e-2)):
    dur = 10800
    sq = pipeline.simulate_sequence(seed, duration_s=dur)
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
    # gaps over solved span; LAST gap = tail so xs[-1] is arc end... no:
    # keep parity with refine (fit over solved span), then measure err@end
    # by extending with the tail gap
    g_fit = jnp.asarray(np.concatenate([gaps[:N - 1], [0.0]]))
    hops = int(np.ceil(max(float(gaps[:N - 1].max()) if N > 1 else 1.0, 1.0)
                       / 100.0)) + 1
    gt_end = jnp.asarray(sq.orbit_pos_eci_km[T - 1])

    def term_err(x_lastknot):
        # propagate last-knot pv through the tail
        p1, v1, _ = __import__("vinsat_tpu.core.dynamics",
                               fromlist=["dynamics"]).propagate_gaps_with_jacobian(
            x_lastknot[None, :3], x_lastknot[None, 3:],
            jnp.asarray([tail_s]), num_hops=int(np.ceil(tail_s / 100)) + 1,
            max_substep=100.0)
        return float(jnp.linalg.norm(p1[0] - gt_end))

    print(f"seed {seed}: stream final {r.errors[-1]:.2f} km, "
          f"CRLB {cb['crlb_final_km']:.2f} km, N={N}, M={M}", flush=True)
    st = jnp.asarray(r.final_states[:N])
    cum = jnp.asarray(prep.cum_rot[:N])
    for sig in att_sigmas:
        if sig == 0.0:
            out = refine.shooting_refine(st, g_fit, lm, uv, conf, ii, ov,
                                         intr, num_hops=hops, num_iters=20)
            xs = out.states_pv
            res, res0 = float(out.residual), float(out.residual0)
            tag = "fixed-att"
        else:
            xs, d, res, res0 = global_att_refine(st, g_fit, lm, uv, conf,
                                                 ii, ov, intr, cum,
                                                 att_sigma=sig,
                                                 num_hops=hops)
            res, res0 = float(res), float(res0)
            tag = f"g-att s={sig:g} |d|={float(jnp.linalg.norm(d)):.1e}"
        e_end = term_err(xs[N - 1])
        e_knot = float(jnp.linalg.norm(xs[N - 1, :3]
                                       - jnp.asarray(gt.states[N - 1, :3])))
        print(f"  {tag:14s} res {res0:.3f}->{res:.3f} px  "
              f"err@lastknot {e_knot:7.3f}  err@end {e_end:9.3f} km",
              flush=True)


if __name__ == "__main__":
    for s in [int(x) for x in sys.argv[1:]] or [13]:
        run_seed(s)
