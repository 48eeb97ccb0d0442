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
    model = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if not flags and line.startswith(("flags", "Features")):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                if not model and line.startswith("model name"):
                    # XLA:CPU derives tuning pseudo-features
                    # (+prefer-no-scatter/-gather) from the CPU MODEL, not
                    # the ISA flag list — entries compiled on a same-flags
                    # different-model host still warn "could lead to
                    # SIGILL" on load (observed); key on the model too
                    model = line.split(":", 1)[1].strip()
                if flags and model:
                    break
    except OSError:
        pass
    digest = hashlib.sha256(
        (platform.machine() + "|" + model + "|" + flags).encode()
    ).hexdigest()[:12]
    _FLAG_CACHE = "host-" + digest
    return _FLAG_CACHE


def cache_dir(base: str) -> str:
    """Per-host subdirectory of `base`, created if needed."""
    d = os.path.join(base, host_fingerprint())
    os.makedirs(d, exist_ok=True)
    return d


def configure_persistent_cache(base: str) -> str:
    """Set up the persistent compilation cache for this process: host-keyed
    directory, multi-device-CPU guard, and REMOTE-AWARE write thresholds.

    On a remote-compile backend (axon tunnel) every un-jitted host-side
    jnp op compiles a one-op executable through the compile service —
    measured: ~800 tiny programs x ~0.4 s tunnel wall = ~6 min of EVERY
    bench run, each reporting < 0.5 s of local compile time and therefore
    never persisted under jax's default threshold.  Persist everything
    (threshold 0) when the default backend is not plain CPU; keep the
    0.5 s threshold on CPU where recompiles are cheap and entry churn
    isn't."""
    import jax

    d = cache_dir(base)
    jax.config.update("jax_compilation_cache_dir", d)
    install_multidevice_cpu_cache_guard()
    try:
        on_cpu = jax.devices()[0].platform == "cpu"
    except Exception:
        on_cpu = True
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      0.5 if on_cpu else 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return d


_GUARD_INSTALLED = False


def install_multidevice_cpu_cache_guard() -> None:
    """Exclude MULTI-DEVICE XLA:CPU executables from the persistent cache.

    This jaxlib's serialization roundtrip of multi-virtual-device CPU
    shard_map executables is broken: the cache write appears to succeed,
    but the first cross-process read segfaults inside
    compilation_cache.get_executable_and_time (observed on the sharded BA
    step with and without Pallas; single-device entries and TPU entries
    roundtrip fine).  Installed by every cache-dir consumer that can
    compile multi-device CPU programs (tests/conftest, configs, launch);
    such programs simply recompile per process.
    """
    global _GUARD_INSTALLED
    if _GUARD_INSTALLED:
        return
    _GUARD_INSTALLED = True

    from jax._src import compilation_cache as _cc

    orig_get = _cc.get_executable_and_time
    orig_put = _cc.put_executable_and_time

    def get_guarded(cache_key, compile_options, backend,
                    executable_devices):
        if backend.platform == "cpu" and len(executable_devices) > 1:
            return None, None
        return orig_get(cache_key, compile_options, backend,
                        executable_devices)

    def put_guarded(cache_key, module_name, executable, backend,
                    compile_time):
        try:
            if (backend.platform == "cpu"
                    and len(executable.local_devices()) > 1):
                return None
        except Exception:
            pass
        return orig_put(cache_key, module_name, executable, backend,
                        compile_time)

    _cc.get_executable_and_time = get_guarded
    _cc.put_executable_and_time = put_guarded
