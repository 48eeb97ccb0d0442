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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed for multi-host pods and return the global
    device count.

    The reference has no distributed backend at all (SURVEY.md §5); here
    multi-host runs use XLA collectives over ICI/DCN.  Call once per process
    before building meshes; with TPU pod env vars set, all arguments are
    auto-detected.  Placement guidance: keep the "arc" axis within a host's
    ICI domain and put the "orbit" (data-parallel, collective-free) axis
    across hosts so no BA collective crosses DCN.
    """
    import jax

    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return len(jax.devices())


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
