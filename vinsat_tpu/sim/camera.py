"""Pinhole nadir camera + WGS84 ellipsoid ray-casting, pure JAX.

Functional surface of sim/SatCam.py's geometric half: intrinsics from HFOV
(:44-57), world->pixel projection (:87-92, :149-154), pixel->ray (:94-96),
closed-form ray ∩ ellipsoid (:125-147), footprint corner lon/lats (:175-185).

All positions here are ECEF **metres** (matching the sim-side convention,
sim/nadir_sim.py:62); the estimation stack (km, ECI) has its own projection
in estimation/factors.py.  Everything is batched over leading axes and
jit/vmap safe: ray misses return NaN instead of None.
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp

from vinsat_tpu.core import frames

ELLIPSOID_A = 6378137.0  # m (SatCam.py:126)
ELLIPSOID_C = 6356752.314245  # m (SatCam.py:127)


class CameraModel(NamedTuple):
    """Static intrinsics."""

    width_px: int
    height_px: int
    fx: float
    fy: float
    cx: float
    cy: float

    @classmethod
    def from_hfov(cls, hfov_deg: float = 66.0, width_px: int = 4608,
                  height_px: int = 2592) -> "CameraModel":
        f = (width_px / 2) / math.tan(math.radians(hfov_deg) / 2)
        return cls(width_px, height_px, f, f, width_px / 2, height_px / 2)

    @property
    def K(self):
        return jnp.array(
            [[self.fx, 0.0, self.cx], [0.0, self.fy, self.cy], [0.0, 0.0, 1.0]]
        )


class CameraPose(NamedTuple):
    """Extrinsics: position + world-from-camera rotation columns.

    R_wc columns are (right, -up, dir) matching SatCam.__init__
    (SatCam.py:50-55, note the sign flip on up_vec at :52).
    """

    position: jnp.ndarray  # (..., 3) ECEF m
    R_wc: jnp.ndarray  # (..., 3, 3)

    @classmethod
    def from_vectors(cls, position, dir_vec, up_vec, right_vec):
        R_wc = jnp.stack([right_vec, -up_vec, dir_vec], axis=-1)
        return cls(position, R_wc)

    @classmethod
    def nadir(cls, position):
        """Nadir-pointing pose from position only (via frames.nadir_axes)."""
        d, u, r = frames.nadir_axes(position)
        return cls.from_vectors(position, d, u, r)


def world_to_pixel(cam: CameraModel, pose: CameraPose, points):
    """ECEF points (..., P, 3) -> pixel coords (..., P, 2) + depth (..., P).

    Implements uv = K [R_cw | -R_cw t] pt (SatCam.py:87-92,149-154).  Points
    behind the camera get negative depth; callers mask on depth > 0.
    """
    rel = points - pose.position[..., None, :]
    cam_pts = jnp.einsum("...ji,...pj->...pi", pose.R_wc, rel)  # R_cw = R_wc^T
    z = cam_pts[..., 2]
    safe_z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = cam.fx * cam_pts[..., 0] / safe_z + cam.cx
    v = cam.fy * cam_pts[..., 1] / safe_z + cam.cy
    return jnp.stack([u, v], axis=-1), z


def pixel_to_ray(cam: CameraModel, pose: CameraPose, uv):
    """Pixel coords (..., P, 2) -> unit world ray (..., P, 3)
    (SatCam.py:94-96)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    d_cam = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    d_world = jnp.einsum("...ij,...pj->...pi", pose.R_wc, d_cam)
    return d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True)


def cast_ray_to_earth(origin, direction, a: float = ELLIPSOID_A,
                      c: float = ELLIPSOID_C):
    """Closed-form first intersection of rays with the WGS84 ellipsoid.

    Vectorized form of SatCam.cast_ray_to_earth (SatCam.py:125-147): solves
    the quadratic in ray length d; misses (negative radicand or d<0) return
    NaN points.  origin (..., 3) broadcast against direction (..., P, 3).
    """
    b = a
    x, y, z = origin[..., None, 0], origin[..., None, 1], origin[..., None, 2]
    u, v, w = direction[..., 0], direction[..., 1], direction[..., 2]
    a2, b2, c2 = a * a, b * b, c * c
    value = -a2 * b2 * w * z - a2 * c2 * v * y - b2 * c2 * u * x
    radical = (
        a2 * b2 * w**2 + a2 * c2 * v**2 - a2 * v**2 * z**2
        + 2 * a2 * v * w * y * z - a2 * w**2 * y**2 + b2 * c2 * u**2
        - b2 * u**2 * z**2 + 2 * b2 * u * w * x * z - b2 * w**2 * x**2
        - c2 * u**2 * y**2 + 2 * c2 * u * v * x * y - c2 * v**2 * x**2
    )
    magnitude = a2 * b2 * w**2 + a2 * c2 * v**2 + b2 * c2 * u**2
    safe_rad = jnp.maximum(radical, 0.0)
    d = (value - a * b * c * jnp.sqrt(safe_rad)) / magnitude
    hit = (radical >= 0) & (d >= 0)
    pt = origin[..., None, :] + d[..., None] * direction
    return jnp.where(hit[..., None], pt, jnp.nan), hit


def corner_rays(cam: CameraModel, pose: CameraPose):
    """Rays through the 4 image corners tl, tr, br, bl (SatCam.py:98-104)."""
    corners = jnp.array(
        [
            [0.0, 0.0],
            [float(cam.width_px), 0.0],
            [float(cam.width_px), float(cam.height_px)],
            [0.0, float(cam.height_px)],
        ]
    )
    shape = pose.position.shape[:-1] + (4, 2)
    return pixel_to_ray(cam, pose, jnp.broadcast_to(corners, shape))


def footprint_lonlat(cam: CameraModel, pose: CameraPose):
    """Ground-footprint corner (lon, lat) degrees, (..., 4, 2); NaN on miss.

    Equivalent to get_corner_lonlats (SatCam.py:175-185) with the geodetic
    conversion done by frames.ecef_to_geodetic instead of astropy.
    """
    rays = corner_rays(cam, pose)
    pts_m, hit = cast_ray_to_earth(pose.position, rays)
    lat, lon, _ = frames.ecef_to_geodetic(pts_m / 1000.0)
    lonlat = jnp.stack([lon, lat], axis=-1)
    return jnp.where(hit[..., None], lonlat, jnp.nan), hit


def footprint_bounds(cam: CameraModel, pose: CameraPose):
    """(lon_min, lat_min, lon_max, lat_max) of the footprint; NaN-safe and
    antimeridian-aware.

    Used for the landmark-visibility gate (SatCam.py:239-247 uses the tl/br
    corners; here the full min/max box over all valid corners).  When the
    footprint straddles ±180° (naive lon span > 180°, the wrap test of
    SatCam.py:218-219), negative corner longitudes are lifted by +360 so the
    box stays contiguous — lon_max may then exceed 180.  Consumers
    (landmarks.in_bounds_mask, kernels/matching.visible_count) test both
    lon and lon+360 against the box, which is exact for wrapped and
    unwrapped boxes alike.
    """
    lonlat, hit = footprint_lonlat(cam, pose)
    lon = lonlat[..., 0]
    lat = lonlat[..., 1]
    lon_lo = jnp.where(hit, lon, jnp.inf).min(axis=-1)
    lon_hi = jnp.where(hit, lon, -jnp.inf).max(axis=-1)
    wrap = (lon_hi - lon_lo) > 180.0
    lon_w = jnp.where(lon < 0, lon + 360.0, lon)
    lon_lo_w = jnp.where(hit, lon_w, jnp.inf).min(axis=-1)
    lon_hi_w = jnp.where(hit, lon_w, -jnp.inf).max(axis=-1)
    lon_min = jnp.where(wrap, lon_lo_w, lon_lo)
    lon_max = jnp.where(wrap, lon_hi_w, lon_hi)
    lat_min = jnp.where(hit, lat, jnp.inf).min(axis=-1)
    lat_max = jnp.where(hit, lat, -jnp.inf).max(axis=-1)
    all_hit = hit.all(axis=-1)
    return jnp.stack([lon_min, lat_min, lon_max, lat_max], axis=-1), all_hit


def lonlat_to_pixel(cam: CameraModel, pose: CameraPose, lon_deg, lat_deg):
    """Ground (lon, lat) -> pixel coords (SatCam.py:193-201), WGS84 surface."""
    pts_km = frames.geodetic_to_ecef(lat_deg, lon_deg)
    uv, z = world_to_pixel(cam, pose, pts_km * 1000.0)
    return uv, z
