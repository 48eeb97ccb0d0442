"""Round-5 measurement: 10800 s imagery-driven sequence at HEAD, TPU vs
CPU wall + OD accuracy (VERDICT r4 weak #3 / next #4).

Run TPU: env PYTHONPATH=/root/repo:/root/.axon_site python .scratch/measure_imagery.py
Run CPU: env PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python .scratch/measure_imagery.py
"""
import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")

from vinsat_tpu.utils.cache import configure_persistent_cache  # noqa: E402

configure_persistent_cache("/root/repo/.jax_cache")

from vinsat_tpu import pipeline  # noqa: E402

platform = jax.devices()[0].platform
on_tpu = platform not in ("cpu",)
if not on_tpu:
    jax.config.update("jax_enable_x64", True)
dtype = "float32" if on_tpu else "float64"
print(f"platform={platform} dtype={dtype}", flush=True)

dur = int(os.environ.get("IMG_DURATION_S", 10800))
t0 = time.time()
seq = pipeline.simulate_sequence_imagery(1, duration_s=dur)
sim_s = time.time() - t0
print(f"imagery sim: {sim_s:.1f} s, {len(seq.det_rows)} det rows", flush=True)

from vinsat_tpu.estimation.window import StreamingConfig  # noqa: E402

cfg = StreamingConfig(dtype=dtype)
t0 = time.time()
r = pipeline.run_streaming(seq, seed=1, cfg=cfg)
od_s = time.time() - t0
final = float(r.errors[-1]) if len(r.errors) else float("nan")
print(f"OD: {od_s:.1f} s wall, final {final:.3f} km, "
      f"min {r.errors.min():.3f} km, trips {r.recovery_trips}", flush=True)
print(f"SUMMARY platform={platform} sim_s={sim_s:.1f} od_s={od_s:.1f} "
      f"final_km={final:.3f}", flush=True)
