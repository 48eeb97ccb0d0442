"""MGRS 6°x8° grid-zone table, as both a dict and dense JAX arrays.

Functional surface of sim/getMGRS.py:5-30: regular zones 01C..60W plus the
X band (72..84) and the Norway/Svalbard special zones (31V/32V widened,
31X/33X/35X/37X widened, 32X/34X/36X removed).

The TPU-side representation is a (Z, 4) bounds array + parallel label list so
zone lookup is a vectorized interval test instead of a dict scan
(SatCam.get_region, sim/SatCam.py:187-191).
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

LON_STEP = 6
LAT_STEP = 8
_LAT_LABELS = ["C", "D", "E", "F", "G", "H", "J", "K", "L", "M",
               "N", "P", "Q", "R", "S", "T", "U", "V", "W", "X"]


def mgrs_grid() -> Dict[str, Tuple[float, float, float, float]]:
    """Zone label -> (lon_min, lat_min, lon_max, lat_max) degrees."""
    lons = np.arange(-180, 180, LON_STEP)
    lats = np.arange(-80, 80, LAT_STEP)
    grid: Dict[str, Tuple[float, float, float, float]] = {}
    for i, lat in enumerate(lats):
        for j, lon in enumerate(lons):
            grid[str(j + 1).zfill(2) + _LAT_LABELS[i]] = (
                float(lon), float(lat), float(lon + LON_STEP), float(lat + LAT_STEP)
            )
    for j in range(1, 61):
        grid[str(j).zfill(2) + "X"] = (
            float(lons[j - 1]), 72.0, float(lons[j - 1] + LON_STEP), 84.0
        )
    grid["31V"] = (0.0, 56.0, 3.0, 64.0)
    grid["32V"] = (3.0, 56.0, 12.0, 64.0)
    grid["31X"] = (0.0, 72.0, 9.0, 84.0)
    grid["33X"] = (9.0, 72.0, 21.0, 84.0)
    grid["35X"] = (21.0, 72.0, 33.0, 84.0)
    grid["37X"] = (33.0, 72.0, 42.0, 84.0)
    for dead in ("32X", "34X", "36X"):
        del grid[dead]
    return grid


_GRID = mgrs_grid()
ZONE_LABELS: List[str] = list(_GRID.keys())
# numpy constant: importing must not initialize the XLA backend
ZONE_BOUNDS = np.array([_GRID[k] for k in ZONE_LABELS])  # (Z, 4)
ZONE_INDEX = {k: i for i, k in enumerate(ZONE_LABELS)}

# The 16 regions with trained detectors in the reference
# (sim/nadir_sim.py:156-157, sim/SatCam.py:64-65).
ACTIVE_REGIONS = ["10S", "10T", "11R", "12R", "16T", "17R", "17T", "18S",
                  "32S", "32T", "33S", "33T", "52S", "53S", "54S", "54T"]


def zone_of(lon_deg, lat_deg):
    """Vectorized zone lookup: returns int index into ZONE_LABELS, -1 if none.

    Replaces the dict scan of SatCam.get_region (SatCam.py:187-191).
    """
    lon = jnp.asarray(lon_deg)[..., None]
    lat = jnp.asarray(lat_deg)[..., None]
    b = ZONE_BOUNDS
    inside = (b[:, 0] <= lon) & (lon <= b[:, 2]) & (b[:, 1] <= lat) & (lat <= b[:, 3])
    any_hit = inside.any(axis=-1)
    idx = jnp.argmax(inside, axis=-1)
    return jnp.where(any_hit, idx, -1)


def active_region_mask() -> jnp.ndarray:
    """(Z,) bool mask of the 16 detector-active regions."""
    mask = np.zeros(len(ZONE_LABELS), dtype=bool)
    for r in ACTIVE_REGIONS:
        mask[ZONE_INDEX[r]] = True
    return jnp.array(mask)
