from vinsat_tpu.tools import labeling  # noqa: F401
