import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vinsat_tpu.dist import mesh as mesh_mod
from vinsat_tpu.dist import tridiag
from vinsat_tpu.estimation import ba


def _spd_system(rng, N, k):
    D = rng.normal(size=(N, k, k))
    D = D @ D.transpose(0, 2, 1) + 8 * np.eye(k)
    U = rng.normal(size=(N - 1, k, k)) * 0.25
    b = rng.normal(size=(N, k))
    return D, U, b


def test_mesh_shapes():
    m = mesh_mod.make_mesh(n_arc=8)
    assert m.shape == {"orbit": 1, "arc": 8}
    m2 = mesh_mod.make_mesh(n_orbit=2, n_arc=4)
    assert m2.shape == {"orbit": 2, "arc": 4}


@pytest.mark.parametrize("n_arc", [2, 4, 8])
def test_sharded_tridiag_matches_sequential(rng, n_arc):
    N, k = 32, 9
    D, U, b = _spd_system(rng, N, k)
    U_pad = np.concatenate([U, np.zeros((1, k, k))], axis=0)
    m = mesh_mod.make_mesh(n_arc=n_arc)
    x = np.asarray(
        tridiag.sharded_block_tridiag_solve(
            m, jnp.array(D), jnp.array(U_pad), jnp.array(b)
        )
    )
    x_ref = np.asarray(
        ba.block_tridiag_solve(jnp.array(D), jnp.array(U), jnp.array(b))
    )
    np.testing.assert_allclose(x, x_ref, rtol=1e-7, atol=1e-9)


def test_sharded_tridiag_single_shard(rng):
    N, k = 8, 3
    D, U, b = _spd_system(rng, N, k)
    U_pad = np.concatenate([U, np.zeros((1, k, k))], axis=0)
    m = mesh_mod.make_mesh(n_arc=1)
    x = np.asarray(
        tridiag.sharded_block_tridiag_solve(
            m, jnp.array(D), jnp.array(U_pad), jnp.array(b)
        )
    )
    H = np.asarray(ba.dense_from_blocks(jnp.array(D), jnp.array(U)))
    x_ref = np.linalg.solve(H, b.reshape(-1)).reshape(N, k)
    np.testing.assert_allclose(x, x_ref, rtol=1e-7, atol=1e-9)
