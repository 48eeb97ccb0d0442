"""Host-keyed persistent compilation cache directory.

XLA:CPU AOT executables embed the COMPILE machine's CPU feature set, and
jax's persistent compilation cache does not key entries by it.  When a
container migrates to a host with a different feature set (observed
mid-round: entries compiled with +prefer-no-scatter/+amx-class features
loaded on a host without them), `cpu_aot_loader` warns "This could lead
to execution errors such as SIGILL" — and cache reads can segfault the
process (measured: pytest runs died inside
compilation_cache.get_executable_and_time).

Every cache-dir consumer (tests/conftest, cli, bench, configs) therefore
places the cache in a per-host-fingerprint subdirectory: same host ->
warm cache; migrated host -> clean recompile instead of a crash.
"""
from __future__ import annotations

import hashlib
import os
import platform

_FLAG_CACHE: str | None = None


def host_fingerprint() -> str:
    """Short stable fingerprint of the host CPU feature set."""
    global _FLAG_CACHE
    if _FLAG_CACHE is not None:
        return _FLAG_CACHE
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:
        pass
    digest = hashlib.sha256(
        (platform.machine() + "|" + flags).encode()
    ).hexdigest()[:12]
    _FLAG_CACHE = "host-" + digest
    return _FLAG_CACHE


def cache_dir(base: str) -> str:
    """Per-host subdirectory of `base`, created if needed."""
    d = os.path.join(base, host_fingerprint())
    os.makedirs(d, exist_ok=True)
    return d
