import json
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_default_matmul_precision", "highest")
from vinsat_tpu.utils.cache import configure_persistent_cache
configure_persistent_cache("/root/repo/.jax_cache")
from vinsat_tpu.estimation import ba
from vinsat_tpu.kernels.tridiag_pallas import block_tridiag_solve_pallas
from vinsat_tpu.utils import mfu

print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
for N in (1024, 2048, 4096):
    k = 9
    rng = np.random.default_rng(0)
    A = rng.normal(size=(N, k, k))
    D = jnp.asarray(np.einsum("tij,tkj->tik", A, A) + 10.0 * np.eye(k), jnp.float32)
    U = jnp.asarray(rng.normal(size=(N - 1, k, k)) * 0.3, jnp.float32)
    b = jnp.asarray(rng.normal(size=(N, k)), jnp.float32)
    x_ref = np.asarray(ba.block_tridiag_solve(D, U, b))
    ref_norm = float(np.linalg.norm(x_ref))
    variants = {
        "pallas_pcr": block_tridiag_solve_pallas,
        "chunked_bcr": lambda D, U, b: ba.block_tridiag_solve_chunked(
            D, U, b, ba._bcr_chunks(D.shape[0]), reduced="bcr"),
    }
    for name, fn in variants.items():
        f = jax.jit(fn)
        try:
            x = np.asarray(f(D, U, b))
        except Exception as e:
            print(json.dumps({"variant": name, "N": N, "error": repr(e)[:200]}), flush=True)
            continue
        rel = float(np.linalg.norm(x - x_ref)) / ref_norm
        def step(carry, Uc, f=f):
            DD, bb = carry
            return f(DD, Uc, bb)
        def chain(carry, out):
            DD, bb = carry
            return (DD + 1e-30 * out[:, :, None] * out[:, None, :], bb + 1e-30 * out)
        t = mfu.time_looped(step, chain, (D, b), U, R=128, repeats=3)
        print(json.dumps({"variant": name, "N": N, "device_ms": round(t * 1e3, 4),
                          "rel_err": float(f"{rel:.2e}")}), flush=True)
