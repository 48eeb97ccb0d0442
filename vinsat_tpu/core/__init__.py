from vinsat_tpu.core import dynamics, frames, quat  # noqa: F401
