from vinsat_tpu.sim import camera, detections, landmarks, mgrs, orbits  # noqa: F401
