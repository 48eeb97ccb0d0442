"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA/JAX env vars before jax initializes, hence the top-of-file
os.environ writes.  float64 is enabled for CPU numerical validation (the TPU
production path is f32; dtype-sensitivity is tested explicitly).
"""
import os

# Force CPU: the shell env may pre-set JAX_PLATFORMS to a real TPU platform
# (e.g. an axon tunnel); tests must run on the virtual CPU mesh regardless.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The env var alone is not enough here: the container's sitecustomize may
# have force-registered a remote TPU platform; config.update wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound (scan-heavy
# solvers); repeat runs hit the cache and finish in a fraction of the time.
# Keyed per host-CPU-fingerprint: XLA:CPU AOT entries from a different
# host's feature set segfault on load (utils/cache.py).
from vinsat_tpu.utils.cache import cache_dir as _host_cache_dir  # noqa: E402

_cache_dir = _host_cache_dir(
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

# multi-device CPU executables segfault on cache-read (broken jaxlib
# serialization roundtrip) — exclude them (utils/cache.py)
from vinsat_tpu.utils.cache import (  # noqa: E402
    install_multidevice_cpu_cache_guard)

install_multidevice_cpu_cache_guard()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
