"""Orbital + attitude dynamics with lax.scan RK4 integrators.

The acceleration model replicates the reference's two-body + J2 form,
including its non-standard r_mat J2 term (sim/orbit_gen.py:130-143, identical
in estimation/BA/BA_utils.py:883-899): simulator and estimator share the same
form so the system is self-consistent.  A textbook J2 model is available via
DynamicsConfig.textbook_j2 (form of estimation/BA/BA_utils.py:822-833).

TPU-first design notes:
  * trajectory rollout is a single `lax.scan` (vmap-able over a batch of
    orbits) instead of the reference's sequential Python loop
    (orbit_gen.py:220-235);
  * gap bridging inside the BA dynamics factor uses a fixed number of
    variable-size RK4 "hops" (<= max_substep each) like the reference's skip
    path (BA_utils.py:52-71), giving static shapes under jit;
  * the 6x6 state-transition Jacobian is propagated *in the same scan* via
    forward sensitivity (J_{k+1} = dRK4/dx @ J_k) instead of re-running
    autograd over the whole rollout (reference: BA_utils.py:506 runs
    O(9N) reverse passes through the full rollout).
"""
from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp

MU_EARTH = 398600.4418  # km^3/s^2
J2_COEFF = 1.75553e10  # km^5/s^2, ~ J2*mu*Re^2 (orbit_gen.py:130)
J2_UNITLESS = 1.08264e-3
R_EARTH_KM = 6378.137

# Non-standard J2 weight matrix (orbit_gen.py:134-138)
# numpy (not jnp) so importing this module never initializes the XLA
# backend (required for jax.distributed.initialize ordering in multi-host
# workers); jnp ops consume numpy constants transparently under trace
_RMAT = np.array(
    [
        [6.0, -1.5, -1.5],
        [6.0, -1.5, -1.5],
        [3.0, -4.5, -4.5],
    ]
)


def orbit_accel_reference(r, mu=MU_EARTH, j2=J2_COEFF):
    """v_dot = -(mu/|r|^3) r + (j2/|r|^7) (RMAT @ r^2) ∘ r  (orbit_gen.py:141)."""
    rn = jnp.linalg.norm(r, axis=-1, keepdims=True)
    j2_term = (jnp.asarray(_RMAT, r.dtype) * (r[..., None, :] ** 2)).sum(-1)
    return -(mu / rn**3) * r + (j2 / rn**7) * j2_term * r


def orbit_accel_textbook(r, mu=MU_EARTH, j2=J2_UNITLESS, re=R_EARTH_KM):
    """Standard J2 acceleration (form of BA_utils.py:822-833, in km)."""
    rn = jnp.linalg.norm(r, axis=-1, keepdims=True)
    z = r[..., 2:3]
    a_2bp = -(mu / rn**3) * r
    iz = jnp.zeros_like(r).at[..., 2].set(1.0)
    coef = 3.0 * mu * j2 * re**2 / (2.0 * rn**5)
    a_j2 = coef * ((5.0 * z**2 / rn**2 - 1.0) * r - 2.0 * z * iz)
    return a_2bp + a_j2


def orbit_dynamics(x, textbook_j2: bool = False):
    """State derivative for x=[r(3), v(3)] in km, km/s."""
    r, v = x[..., :3], x[..., 3:6]
    accel = orbit_accel_textbook(r) if textbook_j2 else orbit_accel_reference(r)
    return jnp.concatenate([v, accel], axis=-1)


def rk4_step(x, h, textbook_j2: bool = False):
    """One classical RK4 step of the orbit dynamics (orbit_gen.py:145-152).

    `h` may be a scalar or broadcastable to x[..., :1] (per-sample steps, as
    in the reference's skip propagation BA_utils.py:63-65).
    """
    f = functools.partial(orbit_dynamics, textbook_j2=textbook_j2)
    h = jnp.asarray(h, dtype=x.dtype)
    if h.ndim < x.ndim:
        h = h[..., None] if h.ndim == x.ndim - 1 else h
    f1 = f(x)
    f2 = f(x + 0.5 * h * f1)
    f3 = f(x + 0.5 * h * f2)
    f4 = f(x + h * f3)
    return x + (h / 6.0) * (f1 + 2 * f2 + 2 * f3 + f4)


def rollout_orbit(x0, num_steps: int, h: float, textbook_j2: bool = False):
    """Integrate num_steps RK4 steps; returns (num_steps+1, ..., 6).

    lax.scan replacement for the Python loop at orbit_gen.py:220-221.
    """

    def body(x, _):
        xn = rk4_step(x, h, textbook_j2)
        return xn, xn

    _, xs = jax.lax.scan(body, x0, None, length=num_steps)
    return jnp.concatenate([x0[None], xs], axis=0)


def rollout_orbit_hifi(x0, num_steps: int, h: float,
                       mjd0_tt: float = 51544.5 + 4700.0):
    """Integrate with the FULL hi-fi force model (core/forces: J2 + drag +
    SRP + sun/moon third-body ≙ ground_truth_sat_dynamics,
    BA_utils.py:788-877) — the truth-model option for measuring the
    estimator's model-mismatch robustness (estimation stays two-body+J2).

    The ephemeris epoch advances with integration time (the reference's
    cached-Julia variant froze it per call).
    """
    from vinsat_tpu.core import forces

    def deriv(x, t_s):
        mjd = mjd0_tt + t_s / 86400.0
        a = forces.hifi_accel_km(x[..., :3], x[..., 3:6], mjd)
        return jnp.concatenate([x[..., 3:6], a], axis=-1)

    def body(carry, _):
        x, t = carry
        f1 = deriv(x, t)
        f2 = deriv(x + 0.5 * h * f1, t + 0.5 * h)
        f3 = deriv(x + 0.5 * h * f2, t + 0.5 * h)
        f4 = deriv(x + h * f3, t + h)
        xn = x + (h / 6.0) * (f1 + 2 * f2 + 2 * f3 + f4)
        return (xn, t + h), xn

    t0 = jnp.zeros((), x0.dtype)
    _, xs = jax.lax.scan(body, (x0, t0), None, length=num_steps)
    return jnp.concatenate([x0[None], xs], axis=0)


# ---------------------------------------------------------------------------
# Attitude: quaternion kinematics + Euler rigid-body dynamics
# ---------------------------------------------------------------------------

# 3U CubeSat inertia (orbit_gen.py:155-157): m=4 kg, 0.1x0.1x0.34 m
_M_SAT = 4.0
INERTIA_3U = np.array(
    [
        (_M_SAT / 12) * (0.1**2 + 0.34**2),
        (_M_SAT / 12) * (0.1**2 + 0.34**2),
        (_M_SAT / 12) * (0.1**2 + 0.1**2),
    ]
)


def attitude_dynamics(x, inertia_diag=INERTIA_3U):
    """State derivative for x=[q(4, scalar-last), omega(3)].

    q_dot = 1/2 q ⊗ [omega, 0]; omega_dot = -J^{-1}(omega × J omega)
    (orbit_gen.py:184-195, converted to scalar-last).
    """
    from vinsat_tpu.core import quat

    q = quat.normalize(x[..., :4])
    w = x[..., 4:7]
    wq = jnp.concatenate([w, jnp.zeros_like(w[..., :1])], axis=-1)
    q_dot = 0.5 * quat.multiply(q, wq)
    J = inertia_diag.astype(x.dtype)
    Jw = J * w
    w_dot = -jnp.cross(w, Jw) / J
    return jnp.concatenate([q_dot, w_dot], axis=-1)


def attitude_rk4_step(x, h, inertia_diag=INERTIA_3U):
    """RK4 + renormalize (orbit_gen.py:197-206)."""
    f = functools.partial(attitude_dynamics, inertia_diag=inertia_diag)
    f1 = f(x)
    f2 = f(x + 0.5 * h * f1)
    f3 = f(x + 0.5 * h * f2)
    f4 = f(x + h * f3)
    xn = x + (h / 6.0) * (f1 + 2 * f2 + 2 * f3 + f4)
    qn = xn[..., :4] / jnp.linalg.norm(xn[..., :4], axis=-1, keepdims=True)
    return jnp.concatenate([qn, xn[..., 4:7]], axis=-1)


def rollout_attitude(x0, num_steps: int, h: float):
    def body(x, _):
        xn = attitude_rk4_step(x, h)
        return xn, xn

    _, xs = jax.lax.scan(body, x0, None, length=num_steps)
    return jnp.concatenate([x0[None], xs], axis=0)


# ---------------------------------------------------------------------------
# Gap propagation (dynamics-factor bridge) with forward sensitivity
# ---------------------------------------------------------------------------


def _hop_sizes(gaps, num_hops: int, max_substep: float, dtype):
    """Split per-knot gap durations into <= num_hops steps of <= max_substep.

    Returns (num_hops, N) step sizes h_{k,i} with sum_k h_{k,i} = gaps_i.
    Mirrors the reference skip decomposition (BA_utils.py:59-65): full hops of
    max_substep followed by one remainder hop (possibly zero).
    """
    gaps = gaps.astype(dtype)
    k = jnp.arange(num_hops, dtype=dtype)[:, None]
    full = jnp.floor(gaps / max_substep)[None, :]
    rem = (gaps % max_substep)[None, :]
    h = jnp.where(k < full, max_substep, jnp.where(k == full, rem, 0.0))
    return h


def propagate_gaps(pos, vel, gaps, num_hops: int = 16, max_substep: float = 100.0,
                   textbook_j2: bool = False):
    """Propagate each knot state forward by its own gap duration.

    pos, vel: (N, 3); gaps: (N,) seconds.  Returns (pos_pred, vel_pred) at
    t_i + gaps_i.  Equivalent to propagate_orbit_dynamics[_skip]
    (BA_utils.py:52-87) with static shapes.
    """
    x = jnp.concatenate([pos, vel], axis=-1)
    hs = _hop_sizes(gaps, num_hops, max_substep, x.dtype)

    def body(x, h):
        xn = rk4_step(x, h[:, None], textbook_j2)
        xn = jnp.where(h[:, None] > 0, xn, x)
        return xn, None

    xN, _ = jax.lax.scan(body, x, hs)
    return xN[..., :3], xN[..., 3:6]


def propagate_gaps_with_jacobian(pos, vel, gaps, num_hops: int = 16,
                                 max_substep: float = 100.0,
                                 textbook_j2: bool = False):
    """Same as propagate_gaps but also returns the 6x6 transition Jacobian.

    J_i = d x_pred_i / d x_i, accumulated per hop via forward sensitivity
    (chain rule through each RK4 step).  Replaces the reference's
    autograd-of-rollout (BA_utils.py:506) with one extra 6x6 matmul chain.
    """
    x = jnp.concatenate([pos, vel], axis=-1)
    N = x.shape[0]
    hs = _hop_sizes(gaps, num_hops, max_substep, x.dtype)

    step_jac = jax.vmap(
        jax.jacfwd(lambda xx, hh: rk4_step(xx, hh, textbook_j2)),
        in_axes=(0, 0),
    )

    def body(carry, h):
        x, J = carry
        A = step_jac(x, h)  # (N, 6, 6)
        xn = rk4_step(x, h[:, None], textbook_j2)
        Jn = jnp.einsum("nij,njk->nik", A, J)
        active = (h > 0)[:, None]
        xn = jnp.where(active, xn, x)
        Jn = jnp.where(active[..., None], Jn, J)
        return (xn, Jn), None

    J0 = jnp.broadcast_to(jnp.eye(6, dtype=x.dtype), (N, 6, 6))
    (xN, JN), _ = jax.lax.scan(body, (x, J0), hs)
    return xN[..., :3], xN[..., 3:6], JN


def propagate_dense(pos0, vel0, duration: int, h: float = 1.0,
                    textbook_j2: bool = False):
    """Dense 1 Hz propagation of a single state for `duration` steps.

    Returns (duration+1, 6).  Equivalent to propagate_orbit_dynamics_init
    (BA_utils.py:89-101).
    """
    x0 = jnp.concatenate([pos0, vel0], axis=-1)
    return rollout_orbit(x0, duration, h, textbook_j2)
