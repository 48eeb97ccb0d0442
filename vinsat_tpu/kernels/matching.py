"""Pallas TPU kernel: tiled landmark visibility counting / matching.

The per-frame imaging gate needs, for every frame, the number of
detector-accepted landmarks inside the footprint box (SatCam.py:232-262) —
an (F x L) interval test that is the sim's hottest non-projection op
(BASELINE.json: "ld_downselect landmark matching becomes a Pallas
tiled-distance kernel").

Kernel layout: frames on the sublane axis (tile of 8), landmarks on the
lane axis (full row per program, resident in VMEM), one pass accumulating
the per-frame count on the VPU.  Falls back to pure-jnp on CPU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

FRAME_TILE = 8


def _visible_count_kernel(bounds_ref, lon_ref, lat_ref, best_ref, out_ref):
    """bounds (8, 4) [lon_min, lat_min, lon_max, lat_max]; lon/lat/best
    (1, L); out (8, 1) counts."""
    lon = lon_ref[0, :]  # (L,)
    lat = lat_ref[0, :]
    best = best_ref[0, :]
    lon_min = bounds_ref[:, 0:1]  # (8, 1)
    lat_min = bounds_ref[:, 1:2]
    lon_max = bounds_ref[:, 2:3]
    lat_max = bounds_ref[:, 3:4]
    # antimeridian-aware: wrapped boxes carry lon_max > 180 (see
    # camera.footprint_bounds), so test lon and lon+360 (padding lon=1e9
    # stays outside either way)
    lon_l = lon[None, :] + 360.0
    in_lon = ((lon[None, :] > lon_min) & (lon[None, :] < lon_max)) | (
        (lon_l > lon_min) & (lon_l < lon_max)
    )
    inside = (
        in_lon
        & (lat[None, :] > lat_min) & (lat[None, :] < lat_max)
        & (best[None, :] > 0)
    )
    out_ref[:, 0] = jnp.sum(inside.astype(jnp.float32), axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def visible_count(bounds, lon, lat, best, interpret: bool = False):
    """Per-frame count of accepted landmarks inside each footprint box.

    bounds (F, 4); lon/lat (L,); best (L,) 0/1.  Returns (F,) int32.
    """
    from jax.experimental import pallas as pl

    F = bounds.shape[0]
    L = lon.shape[0]
    f_pad = ((F + FRAME_TILE - 1) // FRAME_TILE) * FRAME_TILE
    l_pad = ((L + 127) // 128) * 128
    bounds_p = jnp.zeros((f_pad, 4), jnp.float32).at[:F].set(
        bounds.astype(jnp.float32))
    # padding boxes are empty (min > max) so they count zero
    bounds_p = bounds_p.at[F:, 0].set(1.0)
    lon_p = jnp.full((1, l_pad), 1e9, jnp.float32).at[0, :L].set(
        lon.astype(jnp.float32))
    lat_p = jnp.full((1, l_pad), 1e9, jnp.float32).at[0, :L].set(
        lat.astype(jnp.float32))
    best_p = jnp.zeros((1, l_pad), jnp.float32).at[0, :L].set(
        best.astype(jnp.float32))

    grid = (f_pad // FRAME_TILE,)
    out = pl.pallas_call(
        _visible_count_kernel,
        out_shape=jax.ShapeDtypeStruct((f_pad, 1), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((FRAME_TILE, 4), lambda i: (i, 0)),
            pl.BlockSpec((1, l_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, l_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, l_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((FRAME_TILE, 1), lambda i: (i, 0)),
        interpret=interpret,
    )(bounds_p, lon_p, lat_p, best_p)
    return out[:F, 0].astype(jnp.int32)


def visible_count_reference(bounds, lon, lat, best):
    """Pure-jnp oracle (and CPU fallback); antimeridian-aware like the
    kernel."""
    lon_l = lon[None, :] + 360.0
    in_lon = (
        (lon[None, :] > bounds[:, 0:1]) & (lon[None, :] < bounds[:, 2:3])
    ) | ((lon_l > bounds[:, 0:1]) & (lon_l < bounds[:, 2:3]))
    inside = (
        in_lon
        & (lat[None, :] > bounds[:, 1:2]) & (lat[None, :] < bounds[:, 3:4])
        & (best[None, :] > 0)
    )
    return inside.sum(axis=1).astype(jnp.int32)


def nearest_landmark(lonlat_query, lon_db, lat_db, tile: int = 512):
    """Tiled nearest-landmark matching: for each query (Q, 2) find the
    argmin squared lon/lat distance into the DB (L,).

    The detection-to-landmark association step of the matching pipeline
    (replaces the per-class CSV lookups of nadir_sim.get_lon_lat_from_cls).
    Pure-jnp tiled implementation (XLA maps this reduction well on TPU); a
    Pallas variant is unnecessary because the (Q, L) distance matrix fits
    the MXU-friendly batched form below.
    """
    q = lonlat_query
    d2_best = jnp.full((q.shape[0],), jnp.inf, q.dtype)
    idx_best = jnp.zeros((q.shape[0],), jnp.int32)
    L = lon_db.shape[0]
    num_tiles = (L + tile - 1) // tile
    for t in range(num_tiles):
        lo = t * tile
        hi = min(L, lo + tile)
        dlon = q[:, 0:1] - lon_db[None, lo:hi]
        dlat = q[:, 1:2] - lat_db[None, lo:hi]
        d2 = dlon * dlon + dlat * dlat
        tile_min = d2.min(axis=1)
        tile_arg = d2.argmin(axis=1).astype(jnp.int32) + lo
        upd = tile_min < d2_best
        d2_best = jnp.where(upd, tile_min, d2_best)
        idx_best = jnp.where(upd, tile_arg, idx_best)
    return idx_best, d2_best
