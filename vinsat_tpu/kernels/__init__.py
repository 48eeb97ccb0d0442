from vinsat_tpu.kernels import matching  # noqa: F401
