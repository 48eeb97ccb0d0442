from vinsat_tpu.utils import checkpoint, metrics, profiling  # noqa: F401
