from vinsat_tpu.evalx import ate, px_err  # noqa: F401
