"""High-fidelity perturbation force models (the reference's optional C29
stack, estimation/BA/utils.py), fully in JAX with jit-safe control flow.

Provides: analytic low-precision sun/moon ephemerides (utils.py:107-178),
Harris-Priester atmospheric density (utils.py:219-304), drag (:330-348), SRP
(:485-496), third-body point-mass accelerations (:513-582), plus the
combined `ground_truth_dynamics` (BA_utils.py:788-877) usable as the
simulator's hi-fi truth model.  The dead Julia ephemeris bridge
(BA_utils.py:925-947) is replaced by the analytic ephemerides evaluated
on-device.

Units here are SI metres (matching the reference's force stack); the
`hifi_accel_km` wrapper adapts to the km-based estimation stack.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Constants (estimation/BA/utils.py:73-470)
MJD_ZERO = 2400000.5
MJD2000 = 51544.0
R_EARTH_M = 6.378136300e6
P_SUN = 4.560e-6  # N/m^2 at 1 AU
AU = 1.49597870700e11
GM_SUN = 132712440041.939400e9
GM_MOON = 4902.800066e9
GM_EARTH = 3.986004415e14
AS2RAD = 2.0 * np.pi / 360.0 / 3600.0
WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563
ECC2 = WGS84_F * (2.0 - WGS84_F)
OMEGA_EARTH = 7.292115146706979e-5
OBLIQUITY = 23.43929111 * np.pi / 180.0


def _rx(angle):
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.array([[1.0, 0.0, 0.0], [0.0, c, s], [0.0, -s, c]])


def _frac(x):
    return x - jnp.floor(x)


def sun_position(mjd_tt):
    """Low-precision analytic solar ephemeris, EME2000 metres
    (sun_position, utils.py:107-123; Montenbruck & Gill p.70-73)."""
    T = (mjd_tt - MJD2000) / 36525.0
    M = 2.0 * jnp.pi * _frac(0.9931267 + 99.9973583 * T)
    L = 2.0 * jnp.pi * _frac(
        0.7859444 + M / (2.0 * jnp.pi)
        + (6892.0 * jnp.sin(M) + 72.0 * jnp.sin(2.0 * M)) / 1296.0e3
    )
    r = 149.619e9 - 2.499e9 * jnp.cos(M) - 0.021e9 * jnp.cos(2 * M)
    p_ecl = jnp.stack([r * jnp.cos(L), r * jnp.sin(L), jnp.zeros_like(r)], -1)
    return jnp.einsum("ij,...j->...i", _rx(-OBLIQUITY), p_ecl)


def moon_position(mjd_tt):
    """Low-precision analytic lunar ephemeris, EME2000 metres
    (moon_position, utils.py:141-178)."""
    T = (mjd_tt - MJD2000) / 36525.0
    L0 = _frac(0.606433 + 1336.851344 * T)
    l = 2 * jnp.pi * _frac(0.374897 + 1325.552410 * T)
    lp = 2 * jnp.pi * _frac(0.993133 + 99.997361 * T)
    D = 2 * jnp.pi * _frac(0.827361 + 1236.853086 * T)
    F = 2 * jnp.pi * _frac(0.259086 + 1342.227825 * T)

    dL = (
        22640 * jnp.sin(l) - 4586 * jnp.sin(l - 2 * D) + 2370 * jnp.sin(2 * D)
        + 769 * jnp.sin(2 * l) - 668 * jnp.sin(lp) - 412 * jnp.sin(2 * F)
        - 212 * jnp.sin(2 * l - 2 * D) - 206 * jnp.sin(l + lp - 2 * D)
        + 192 * jnp.sin(l + 2 * D) - 165 * jnp.sin(lp - 2 * D)
        - 125 * jnp.sin(D) - 110 * jnp.sin(l + lp) + 148 * jnp.sin(l - lp)
        - 55 * jnp.sin(2 * F - 2 * D)
    )
    L = 2 * jnp.pi * _frac(L0 + dL / 1296.0e3)
    S = F + (dL + 412 * jnp.sin(2 * F) + 541 * jnp.sin(lp)) * AS2RAD
    h = F - 2 * D
    N = (
        -526 * jnp.sin(h) + 44 * jnp.sin(l + h) - 31 * jnp.sin(-l + h)
        - 23 * jnp.sin(lp + h) + 11 * jnp.sin(-lp + h)
        - 25 * jnp.sin(-2 * l + F) + 21 * jnp.sin(-l + F)
    )
    B = (18520.0 * jnp.sin(S) + N) * AS2RAD
    r = (
        385000e3 - 20905e3 * jnp.cos(l) - 3699e3 * jnp.cos(2 * D - l)
        - 2956e3 * jnp.cos(2 * D) - 570e3 * jnp.cos(2 * l)
        + 246e3 * jnp.cos(2 * l - 2 * D) - 205e3 * jnp.cos(lp - 2 * D)
        - 171e3 * jnp.cos(l + 2 * D) - 152e3 * jnp.cos(l + lp - 2 * D)
    )
    p_ecl = jnp.stack(
        [r * jnp.cos(L) * jnp.cos(B), r * jnp.sin(L) * jnp.cos(B),
         r * jnp.sin(B)], -1
    )
    return jnp.einsum("ij,...j->...i", _rx(-OBLIQUITY), p_ecl)


# Harris-Priester tables (utils.py:229-255)
HP_H = np.array([
    100., 120., 130., 140., 150., 160., 170., 180., 190., 200.,
    210., 220., 230., 240., 250., 260., 270., 280., 290., 300.,
    320., 340., 360., 380., 400., 420., 440., 460., 480., 500.,
    520., 540., 560., 580., 600., 620., 640., 660., 680., 700.,
    720., 740., 760., 780., 800., 840., 880., 920., 960., 1000.])
HP_C_MIN = np.array([
    4.974e+05, 2.490e+04, 8.377e+03, 3.899e+03, 2.122e+03, 1.263e+03,
    8.008e+02, 5.283e+02, 3.617e+02, 2.557e+02, 1.839e+02, 1.341e+02,
    9.949e+01, 7.488e+01, 5.709e+01, 4.403e+01, 3.430e+01, 2.697e+01,
    2.139e+01, 1.708e+01, 1.099e+01, 7.214e+00, 4.824e+00, 3.274e+00,
    2.249e+00, 1.558e+00, 1.091e+00, 7.701e-01, 5.474e-01, 3.916e-01,
    2.819e-01, 2.042e-01, 1.488e-01, 1.092e-01, 8.070e-02, 6.012e-02,
    4.519e-02, 3.430e-02, 2.632e-02, 2.043e-02, 1.607e-02, 1.281e-02,
    1.036e-02, 8.496e-03, 7.069e-03, 4.680e-03, 3.200e-03, 2.210e-03,
    1.560e-03, 1.150e-03])
HP_C_MAX = np.array([
    4.974e+05, 2.490e+04, 8.710e+03, 4.059e+03, 2.215e+03, 1.344e+03,
    8.758e+02, 6.010e+02, 4.297e+02, 3.162e+02, 2.396e+02, 1.853e+02,
    1.455e+02, 1.157e+02, 9.308e+01, 7.555e+01, 6.182e+01, 5.095e+01,
    4.226e+01, 3.526e+01, 2.511e+01, 1.819e+01, 1.337e+01, 9.955e+00,
    7.492e+00, 5.684e+00, 4.355e+00, 3.362e+00, 2.612e+00, 2.042e+00,
    1.605e+00, 1.267e+00, 1.005e+00, 7.997e-01, 6.390e-01, 5.123e-01,
    4.121e-01, 3.325e-01, 2.691e-01, 2.185e-01, 1.779e-01, 1.452e-01,
    1.190e-01, 9.776e-02, 8.059e-02, 5.741e-02, 4.210e-02, 3.130e-02,
    2.360e-02, 1.810e-02])
HP_RA_LAG = 0.523599
HP_N_PRM = 3


def ecef_to_geodetic_m(ecef_m, iters: int = 10):
    """(lon_rad, lat_rad, alt_m) via the fixed-point iteration of
    sECEFtoGEOD (utils.py:361-398) with a static trip count."""
    x, y, z = ecef_m[..., 0], ecef_m[..., 1], ecef_m[..., 2]
    rho2 = x**2 + y**2
    dz = ECC2 * z
    N = jnp.zeros_like(z)
    for _ in range(iters):
        zdz = z + dz
        Nh = jnp.sqrt(rho2 + zdz**2)
        sinphi = zdz / Nh
        N = WGS84_A / jnp.sqrt(1.0 - ECC2 * sinphi**2)
        dz = N * ECC2 * sinphi
    zdz = z + dz
    lat = jnp.arctan2(zdz, jnp.sqrt(rho2))
    lon = jnp.arctan2(y, x)
    alt = jnp.sqrt(rho2 + zdz**2) - N
    return lon, lat, alt


def density_harris_priester(r_eci_m, r_sun_m):
    """Local atmospheric density kg/m^3 (density_harris_priester,
    utils.py:219-304), vectorized + clamped (0 outside 100..1000 km)."""
    _, _, alt = ecef_to_geodetic_m(r_eci_m)
    height = alt / 1.0e3
    ra_sun = jnp.arctan2(r_sun_m[..., 1], r_sun_m[..., 0])
    dec_sun = jnp.arctan2(
        r_sun_m[..., 2], jnp.sqrt(r_sun_m[..., 0]**2 + r_sun_m[..., 1]**2)
    )
    c_dec = jnp.cos(dec_sun)
    u = jnp.stack(
        [c_dec * jnp.cos(ra_sun + HP_RA_LAG),
         c_dec * jnp.sin(ra_sun + HP_RA_LAG),
         jnp.sin(dec_sun)], -1
    )
    rn = jnp.linalg.norm(r_eci_m, axis=-1)
    c_psi2 = 0.5 + 0.5 * jnp.sum(r_eci_m * u, -1) / rn

    h_clip = jnp.clip(height, 100.0, 999.999)
    # lift the numpy tables to device arrays for traced gather indexing
    hp_h = jnp.asarray(HP_H)
    hp_lo = jnp.asarray(HP_C_MIN)
    hp_hi = jnp.asarray(HP_C_MAX)
    ih = jnp.clip(jnp.searchsorted(hp_h, h_clip) - 1, 0, 48)
    h_min = (hp_h[ih] - hp_h[ih + 1]) / jnp.log(hp_lo[ih + 1] / hp_lo[ih])
    h_max = (hp_h[ih] - hp_h[ih + 1]) / jnp.log(hp_hi[ih + 1] / hp_hi[ih])
    d_min = hp_lo[ih] * jnp.exp((hp_h[ih] - h_clip) / h_min)
    d_max = hp_hi[ih] * jnp.exp((hp_h[ih] - h_clip) / h_max)
    density = (d_min + (d_max - d_min) * c_psi2**HP_N_PRM) * 1.0e-12
    in_range = (height >= 100.0) & (height <= 1000.0)
    return jnp.where(in_range, density, 0.0)


def accel_drag(x_m, rho, mass=1.0, area=0.1, cd=2.0):
    """Drag acceleration m/s^2 (accel_drag, utils.py:330-348 with T=I as in
    the reference's simplified frame model)."""
    r, v = x_m[..., :3], x_m[..., 3:6]
    omega = jnp.array([0.0, 0.0, OMEGA_EARTH], x_m.dtype)
    v_rel = v - jnp.cross(jnp.broadcast_to(omega, r.shape), r)
    v_abs = jnp.linalg.norm(v_rel, axis=-1, keepdims=True)
    return -0.5 * cd * (area / mass) * rho[..., None] * v_abs * v_rel


def accel_srp(x_m, r_sun_m, mass=1.0, area=1.0, cr=1.8):
    """Solar radiation pressure m/s^2 (accel_srp, utils.py:485-496)."""
    d = x_m[..., :3] - r_sun_m
    dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d * (cr * (area / mass) * P_SUN * AU**2 / dn**3)


def accel_point_mass(r_sat_m, r_body_m, gm):
    """Third-body point-mass acceleration incl. the indirect term
    (accel_point_mass, utils.py:571-582)."""
    d = r_sat_m - r_body_m
    dn = jnp.linalg.norm(d, axis=-1, keepdims=True)
    bn = jnp.linalg.norm(r_body_m, axis=-1, keepdims=True)
    return -gm * (d / dn**3 + r_body_m / bn**3)


def two_body_j2_accel(r_m):
    """Series-expansion gravity up to J2, metres (the "working gravity code"
    of ground_truth_sat_dynamics, BA_utils.py:822-833)."""
    mu = 3.986004418e14
    j2 = 1.08264e-3
    rn = jnp.linalg.norm(r_m, axis=-1, keepdims=True)
    a_2bp = -mu * r_m / rn**3
    iz = jnp.zeros_like(r_m).at[..., 2].set(1.0)
    zz = jnp.sum(r_m * iz, -1, keepdims=True)
    a_j2 = ((3 * mu * j2 * R_EARTH_M**2) / (2 * rn**5)) * (
        ((5 * zz**2 / rn**2) - 1.0) * r_m - 2.0 * zz * iz
    )
    return a_2bp + a_j2


def ground_truth_dynamics(x_m, mjd_tt=MJD2000 + 4700.0, mass=1.0,
                          area_drag=0.1, cd=2.0, area_srp=1.0, cr=1.8):
    """Full hi-fi state derivative [v, a] in metres
    (ground_truth_sat_dynamics, BA_utils.py:788-877): J2 gravity +
    Harris-Priester drag + SRP + sun/moon third-body, with the analytic
    ephemerides replacing the cached Julia outputs."""
    r_sun = sun_position(mjd_tt)
    r_moon = moon_position(mjd_tt)
    r = x_m[..., :3]
    a = two_body_j2_accel(r)
    rho = density_harris_priester(r, r_sun)
    a = a + accel_drag(x_m, rho, mass, area_drag, cd)
    a = a + accel_srp(x_m, r_sun, mass, area_srp, cr)
    a = a + accel_point_mass(r, r_sun, GM_SUN)
    a = a + accel_point_mass(r, r_moon, GM_MOON)
    return jnp.concatenate([x_m[..., 3:6], a], axis=-1)


def hifi_accel_km(r_km, v_km_s, mjd_tt=MJD2000 + 4700.0):
    """km/s^2 adapter for the estimation stack's km convention."""
    x_m = jnp.concatenate([r_km * 1e3, v_km_s * 1e3], axis=-1)
    return ground_truth_dynamics(x_m, mjd_tt)[..., 3:6] / 1e3
