from vinsat_tpu.kernels import matching, normal_eq  # noqa: F401
