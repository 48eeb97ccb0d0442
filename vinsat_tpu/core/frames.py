"""Reference frames: GMST Earth rotation, ECI<->ECEF, geodetic<->ECEF.

Replicates the reference's simplified frame model (a single GMST Rz rotation,
no precession/nutation): estimation/BA/BA_utils.py:1171-1252 and
sim/orbit_gen.py:285-298.  All functions are pure JAX, batched over leading
axes.

Units: kilometres everywhere unless noted (the reference mixes m/km; here the
estimation stack is km, and the camera/ellipsoid geometry in sim/camera.py is
metres to match WGS84 constants).
"""
from __future__ import annotations

import jax.numpy as jnp

from vinsat_tpu.core import quat

# GMST model constants (BA_utils.py:1172-1173, orbit_gen.py:286-287)
THETA_G0_DEG = 280.16
OMEGA_EARTH_DEG_PER_S = 360.0 / 86164.100352

# WGS84 (BA_utils.py:1178-1180), km
WGS84_A_KM = 6378.137
WGS84_B_KM = 6356.752
WGS84_E2 = 1.0 - (WGS84_B_KM**2 / WGS84_A_KM**2)

# Ellipsoid used by the camera ray-cast (sim/SatCam.py:126-127), metres
ELLIPSOID_A_M = 6378137.0
ELLIPSOID_C_M = 6356752.314245


def gmst_rad(times_s):
    """Greenwich mean sidereal angle at t seconds past the epoch (radians)."""
    return jnp.deg2rad(THETA_G0_DEG + OMEGA_EARTH_DEG_PER_S * times_s)


def rz_eci_to_ecef(times_s):
    """Rotation matrix R(t) with r_ecef = R @ r_eci (orbit_gen.py:285-298).

    Returns (..., 3, 3) for times of shape (...).
    """
    th = gmst_rad(times_s)
    c, s = jnp.cos(th), jnp.sin(th)
    zero = jnp.zeros_like(th)
    one = jnp.ones_like(th)
    return jnp.stack(
        [
            jnp.stack([c, s, zero], axis=-1),
            jnp.stack([-s, c, zero], axis=-1),
            jnp.stack([zero, zero, one], axis=-1),
        ],
        axis=-2,
    )


def eci_to_ecef(r_eci, times_s):
    """ECI -> ECEF positions (BA_utils.py:1210-1218)."""
    Rz = rz_eci_to_ecef(times_s)
    return jnp.einsum("...ij,...j->...i", Rz, r_eci)


def ecef_to_eci(r_ecef, times_s):
    """ECEF -> ECI positions (BA_utils.py:1185-1195)."""
    th = gmst_rad(times_s)
    c, s = jnp.cos(th), jnp.sin(th)
    x, y, z = r_ecef[..., 0], r_ecef[..., 1], r_ecef[..., 2]
    return jnp.stack([x * c - y * s, x * s + y * c, z], axis=-1)


def geodetic_to_ecef(lat_deg, lon_deg, alt_km=0.0):
    """Geodetic lat/lon/alt -> ECEF km (BA_utils.py:1221-1236)."""
    phi = jnp.deg2rad(lat_deg)
    lam = jnp.deg2rad(lon_deg)
    N = WGS84_A_KM / jnp.sqrt(1.0 - WGS84_E2 * jnp.sin(phi) ** 2)
    x = (N + alt_km) * jnp.cos(phi) * jnp.cos(lam)
    y = (N + alt_km) * jnp.cos(phi) * jnp.sin(lam)
    z = ((WGS84_B_KM**2 / WGS84_A_KM**2) * N + alt_km) * jnp.sin(phi)
    return jnp.stack([x, y, z], axis=-1)


def lonlat_to_eci(lon_deg, lat_deg, times_s, alt_km=0.0):
    """Ground point (lon, lat) at time t -> ECI km (BA_utils.py:1238-1251).

    Note the reference passes the *frame index* as `times` here, which is the
    same convention (1 Hz, t = frame).
    """
    r_ecef = geodetic_to_ecef(lat_deg, lon_deg, alt_km)
    return ecef_to_eci(r_ecef, times_s)


def ecef_to_geodetic(r_ecef_km, iters: int = 5):
    """ECEF km -> (lat_deg, lon_deg, alt_km) via fixed-point iteration.

    Bowring-style iteration with a static trip count (jit-friendly); the
    reference uses astropy EarthLocation (sim/SatCam.py:181) / an iterative
    loop (estimation/BA/utils.py:361).
    """
    x, y, z = r_ecef_km[..., 0], r_ecef_km[..., 1], r_ecef_km[..., 2]
    lon = jnp.arctan2(y, x)
    p = jnp.sqrt(x**2 + y**2)
    lat = jnp.arctan2(z, p * (1.0 - WGS84_E2))
    for _ in range(iters):
        sin_lat = jnp.sin(lat)
        N = WGS84_A_KM / jnp.sqrt(1.0 - WGS84_E2 * sin_lat**2)
        alt = p / jnp.cos(lat) - N
        lat = jnp.arctan2(z, p * (1.0 - WGS84_E2 * N / (N + alt)))
    sin_lat = jnp.sin(lat)
    N = WGS84_A_KM / jnp.sqrt(1.0 - WGS84_E2 * sin_lat**2)
    alt = p / jnp.cos(lat) - N
    return jnp.rad2deg(lat), jnp.rad2deg(lon), alt


def nadir_rotation(pos):
    """Nadir-pointing camera rotation from a position vector.

    Builds R = [xc | yc | zc] (columns) with
      zc = -pos/|pos|            (camera boresight points at Earth's centre)
      rc = (ẑ × zc)/|ẑ × zc|    (east-ish axis), xc = -rc
      yc = rc × zc               (south-ish axis)
    matching sim/orbit_gen.py:300-320 (get_nadir_attitude).  Works in
    whatever frame `pos` is given (ECI or ECEF).
    """
    zc = -pos / jnp.linalg.norm(pos, axis=-1, keepdims=True)
    zhat = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], dtype=pos.dtype), pos.shape)
    rc = jnp.cross(zhat, zc)
    rc = rc / jnp.linalg.norm(rc, axis=-1, keepdims=True)
    xc = -rc
    yc = jnp.cross(rc, zc)
    return jnp.stack([xc, yc, zc], axis=-1)  # columns


def nadir_quaternion(pos):
    """Scalar-last quaternion of the nadir rotation (orbit_gen.py:300-320)."""
    return quat.from_matrix(nadir_rotation(pos))


def nadir_axes(pos):
    """(dir, up, right) unit vectors of the nadir camera.

    Matches get_nadir_attitude_vectors (orbit_gen.py:322-348): returns
    (zc, -yc, xc) which the sim packs as dir/up/right.
    """
    R = nadir_rotation(pos)
    xc, yc, zc = R[..., 0], R[..., 1], R[..., 2]
    return zc, -yc, xc
