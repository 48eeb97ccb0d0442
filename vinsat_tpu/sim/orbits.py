"""Orbital-element sampling and vmapped trajectory generation.

Functional surface of sim/orbit_gen.py: Keplerian<->Cartesian conversion
(oe2eci :13, eci2oe :67), random polar / ISS-like orbit sampling
(oe_gen :350, get_polar_orbit :359, get_iss_like_orbit :363,
get_random_orbit :369) and full position+attitude trajectory rollout
(generate_eci_traj :208) — redesigned as lax.scan rollouts vmappable over a
batch of orbits instead of per-step Python loops.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from vinsat_tpu.core import dynamics, frames, quat

R_EARTH_KM = 6378.0  # reference uses the spherical 6378.0 for a_min/a_max offsets


class OrbitalElements(NamedTuple):
    """Classical orbital elements (a in km, angles in rad)."""

    a: jnp.ndarray
    e: jnp.ndarray
    i: jnp.ndarray
    Omega: jnp.ndarray
    omega: jnp.ndarray
    nu: jnp.ndarray


def _rotz(g):
    c, s = jnp.cos(g), jnp.sin(g)
    z, o = jnp.zeros_like(g), jnp.ones_like(g)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], axis=-1),
            jnp.stack([s, c, z], axis=-1),
            jnp.stack([z, z, o], axis=-1),
        ],
        axis=-2,
    )


def _rotx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    z, o = jnp.zeros_like(a), jnp.ones_like(a)
    return jnp.stack(
        [
            jnp.stack([o, z, z], axis=-1),
            jnp.stack([z, c, -s], axis=-1),
            jnp.stack([z, s, c], axis=-1),
        ],
        axis=-2,
    )


def anomaly_true_to_eccentric(nu, e):
    """True anomaly -> eccentric anomaly (orbit_gen.py:46-50), branch-free."""
    E = jnp.arccos((e + jnp.cos(nu)) / (1 + e * jnp.cos(nu)))
    return jnp.where(nu > jnp.pi, 2 * jnp.pi - E, E)


def oe_to_eci(oe: OrbitalElements, mu: float = dynamics.MU_EARTH):
    """Keplerian elements -> ECI state [r(3), v(3)] km, km/s.

    Matches oe2eci (orbit_gen.py:13-44), general branch (the degenerate
    i=0/e=0 special cases reduce to the same rotation product here because
    the rotations compose continuously).
    """
    n = jnp.sqrt(mu / oe.a**3)
    E = anomaly_true_to_eccentric(oe.nu, oe.e)
    se, ce = jnp.sin(E), jnp.cos(E)
    b = jnp.sqrt(1 - oe.e**2)
    r_peri = jnp.stack([oe.a * (ce - oe.e), oe.a * b * se, jnp.zeros_like(E)], axis=-1)
    v_peri = (oe.a * n / (1 - oe.e * ce))[..., None] * jnp.stack(
        [-se, b * ce, jnp.zeros_like(E)], axis=-1
    )
    R = _rotz(oe.Omega) @ _rotx(oe.i) @ _rotz(oe.omega)
    r = jnp.einsum("...ij,...j->...i", R, r_peri)
    v = jnp.einsum("...ij,...j->...i", R, v_peri)
    return jnp.concatenate([r, v], axis=-1)


def eci_to_oe(x, mu: float = dynamics.MU_EARTH):
    """ECI state -> orbital elements (orbit_gen.py:67-128), batched."""
    R, V = x[..., :3], x[..., 3:6]
    r = jnp.linalg.norm(R, axis=-1)
    v = jnp.linalg.norm(V, axis=-1)
    H = jnp.cross(R, V)
    h = jnp.linalg.norm(H, axis=-1)
    zhat = jnp.zeros_like(R).at[..., 2].set(1.0)
    Nv = jnp.cross(zhat, H)
    n = jnp.linalg.norm(Nv, axis=-1)
    rv = jnp.sum(R * V, axis=-1)
    e_vec = ((v**2 - mu / r)[..., None] * R - rv[..., None] * V) / mu
    e = jnp.linalg.norm(e_vec, axis=-1)
    eps = 0.5 * v**2 - mu / r
    a = -mu / (2 * eps)
    i = jnp.arccos(jnp.clip(H[..., 2] / h, -1, 1))
    Omega = jnp.arccos(jnp.clip(Nv[..., 0] / n, -1, 1))
    Omega = jnp.where(Nv[..., 1] < 0, 2 * jnp.pi - Omega, Omega)
    om = jnp.arccos(jnp.clip(jnp.sum(Nv * e_vec, axis=-1) / (n * e), -1, 1))
    om = jnp.where(e_vec[..., 2] < 0, 2 * jnp.pi - om, om)
    nu = jnp.arccos(jnp.clip(jnp.sum(e_vec * R, axis=-1) / (e * r), -1, 1))
    nu = jnp.where(rv < 0, 2 * jnp.pi - nu, nu)
    return OrbitalElements(a, e, i, Omega, om, nu)


# ---------------------------------------------------------------------------
# Random orbit sampling (sim/orbit_gen.py:350-374)
# ---------------------------------------------------------------------------


def sample_polar_oe(key, a_min_alt=525.0, a_max_alt=575.0):
    """Near-polar orbit: i ~ 90 deg +- ~0.2 rad jitter (orbit_gen.py:350-361)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    a = R_EARTH_KM + a_min_alt + (a_max_alt - a_min_alt) * jax.random.uniform(k1)
    e = 0.01 * jax.random.uniform(k2)
    half = jnp.pi / 2
    i = half + 0.2 * (jax.random.uniform(k3) - 0.5)
    ang = 2 * jnp.pi * jax.random.uniform(k4)
    del k5
    return OrbitalElements(a, e, i, ang, ang, ang)


def sample_iss_like_oe(key, a_min_alt=525.0, a_max_alt=575.0):
    """ISS-like inclination 51.5 deg +- 0.1 rad jitter (orbit_gen.py:363-367)."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    a = R_EARTH_KM + a_min_alt + (a_max_alt - a_min_alt) * jax.random.uniform(k1)
    e = 0.01 * jax.random.uniform(k2)
    i0 = 51.5 * jnp.pi / 180
    i = i0 + 0.1 * (jax.random.uniform(k3) - 0.5)
    ang = 2 * jnp.pi * jax.random.uniform(k4)
    return OrbitalElements(a, e, i, ang, ang, ang)


def sample_random_oe(key):
    """50/50 polar vs ISS-like (orbit_gen.py:369-374)."""
    k1, k2 = jax.random.split(key)
    polar = sample_polar_oe(k2)
    iss = sample_iss_like_oe(k2)
    pick = jax.random.uniform(k1) < 0.5
    return jax.tree.map(lambda a, b: jnp.where(pick, a, b), iss, polar)


# ---------------------------------------------------------------------------
# Trajectory generation
# ---------------------------------------------------------------------------


class Trajectory(NamedTuple):
    """A simulated orbit arc at 1/dt Hz.

    pos_eci:  (T, 3) km           vel_eci: (T, 3) km/s
    quat_nadir_eci: (T, 4)        scalar-last nadir-pointing attitude (ECI)
    quat_body_eci: (T, 4)         tumbling rigid-body attitude (ECI)
    omega_body: (T, 3) rad/s      body rates of the tumbling attitude
    times: (T,) s
    """

    pos_eci: jnp.ndarray
    vel_eci: jnp.ndarray
    quat_nadir_eci: jnp.ndarray
    quat_body_eci: jnp.ndarray
    omega_body: jnp.ndarray
    times: jnp.ndarray

    @property
    def pos_ecef(self):
        return frames.eci_to_ecef(self.pos_eci, self.times)


import functools


@functools.partial(jax.jit, static_argnames=("duration_s", "dt", "dtype",
                                             "hifi"))
def _generate_trajectory_impl(key, oe, duration_s, dt, dtype, hifi=False):
    x0 = oe_to_eci(oe)
    num_steps = int(round(duration_s / dt))
    if hifi:
        # full force model as TRUTH (drag/SRP/third-body) while the
        # estimator keeps two-body+J2: the model-mismatch configuration
        orbit_traj = dynamics.rollout_orbit_hifi(x0, num_steps, dt)
    else:
        orbit_traj = dynamics.rollout_orbit(x0, num_steps, dt)

    # tumbling body attitude: random initial quaternion + ~2 deg/s rates
    # (orbit_gen.py:226-235)
    kq, kw = jax.random.split(key)
    q0 = jax.random.normal(kq, (4,), dtype=dtype)
    q0 = q0 / jnp.linalg.norm(q0)
    w0 = 2 * (jnp.pi / 180) * jax.random.normal(kw, (3,), dtype=dtype)
    att_traj = dynamics.rollout_attitude(jnp.concatenate([q0, w0]), num_steps, dt)

    times = jnp.arange(num_steps + 1, dtype=dtype) * dt
    pos = orbit_traj[:, :3]
    return Trajectory(
        pos_eci=pos,
        vel_eci=orbit_traj[:, 3:6],
        quat_nadir_eci=frames.nadir_quaternion(pos),
        quat_body_eci=att_traj[:, :4],
        omega_body=att_traj[:, 4:7],
        times=times,
    )


def generate_trajectory(key, oe: Optional[OrbitalElements] = None,
                        duration_s: int = 10800, dt: float = 1.0,
                        dtype=jnp.float64, hifi: bool = False) -> Trajectory:
    """Simulate a full position+attitude trajectory (generate_eci_traj
    :208-243 + get_nadir_attitude :300).

    One jitted lax.scan over the arc; vmap over `key` for a constellation
    batch.  dtype falls back to f32 automatically when x64 is disabled.
    hifi=True integrates the full force model (drag/SRP/third-body) as
    truth — the model-mismatch robustness configuration.
    """
    if oe is None:
        key, k_oe = jax.random.split(key)
        oe = sample_random_oe(k_oe)
    dtype = jnp.dtype(dtype)
    if dtype == jnp.float64 and not jax.config.jax_enable_x64:
        dtype = jnp.dtype(jnp.float32)
    oe = jax.tree.map(lambda v: jnp.asarray(v, dtype=dtype), oe)
    return _generate_trajectory_impl(key, oe, duration_s, dt, dtype, hifi)


def generate_constellation(key, num_orbits: int, duration_s: int = 10800,
                           dt: float = 1.0, dtype=jnp.float64) -> Trajectory:
    """vmapped batch of independent random orbits (replaces the reference's
    process_map fan-out, sim/nadir_sim.py:281-282)."""
    keys = jax.random.split(key, num_orbits)
    return jax.vmap(
        lambda k: generate_trajectory(k, None, duration_s, dt, dtype)
    )(keys)
