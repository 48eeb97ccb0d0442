"""Device-mesh construction for the two parallel axes that exist in this
problem domain (SURVEY.md §2 native/distributed table):

  * "orbit"  — data parallelism over independent orbits/windows (the
    reference's process_map fan-out, sim/nadir_sim.py:282, made collective-
    free: fully independent work per device);
  * "arc"    — sequence/arc parallelism: knots of one long orbit arc sharded
    across devices, with the block-tridiagonal BA solve distributed via the
    SPIKE reduction in dist/tridiag.py (the CP/SP analog; BASELINE.json
    config 5).

TP/PP/EP have no counterpart in a 9N-state least-squares problem and are
deliberately not fabricated.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_orbit: Optional[int] = None, n_arc: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """Create an ("orbit", "arc") mesh over the available devices.

    Defaults: all devices on the arc axis if only n_arc given, all on the
    orbit axis if only n_orbit given, else orbit-major split.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n_orbit is None and n_arc is None:
        n_orbit, n_arc = 1, n
    elif n_orbit is None:
        n_orbit = n // n_arc
    elif n_arc is None:
        n_arc = n // n_orbit
    assert n_orbit * n_arc <= n, (n_orbit, n_arc, n)
    dev = np.array(devices[: n_orbit * n_arc]).reshape(n_orbit, n_arc)
    return Mesh(dev, axis_names=("orbit", "arc"))


def orbit_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-of-orbits arrays: leading axis split over the orbit axis."""
    return NamedSharding(mesh, P("orbit"))


def arc_sharding(mesh: Mesh) -> NamedSharding:
    """Knot-axis arrays of a single arc: leading axis split over arc."""
    return NamedSharding(mesh, P("arc"))


def batch_arc_sharding(mesh: Mesh) -> NamedSharding:
    """(batch, knots, ...) arrays: batch over orbit, knots over arc."""
    return NamedSharding(mesh, P("orbit", "arc"))
