from vinsat_tpu.estimation import ba, factors  # noqa: F401
