import numpy as np
import jax.numpy as jnp

from vinsat_tpu.kernels import matching


def test_visible_count_interpret_matches_reference(rng):
    F, L = 37, 500
    bounds = np.stack(
        [rng.uniform(-10, 0, F), rng.uniform(-10, 0, F),
         rng.uniform(0, 10, F), rng.uniform(0, 10, F)], axis=1
    )
    lon = rng.uniform(-15, 15, L)
    lat = rng.uniform(-15, 15, L)
    best = (rng.random(L) < 0.4).astype(np.float64)
    got = np.asarray(
        matching.visible_count(
            jnp.array(bounds), jnp.array(lon), jnp.array(lat),
            jnp.array(best), interpret=True,
        )
    )
    want = np.asarray(
        matching.visible_count_reference(
            jnp.array(bounds), jnp.array(lon), jnp.array(lat), jnp.array(best)
        )
    )
    np.testing.assert_array_equal(got, want)


def test_nearest_landmark(rng):
    L, Q = 700, 23
    lon_db = jnp.array(rng.uniform(-180, 180, L))
    lat_db = jnp.array(rng.uniform(-80, 80, L))
    qi = rng.integers(0, L, Q)
    q = jnp.stack([lon_db[qi], lat_db[qi]], axis=1)
    q = q + 0.001  # nudge, stays nearest
    idx, d2 = matching.nearest_landmark(q, lon_db, lat_db, tile=128)
    np.testing.assert_array_equal(np.asarray(idx), qi)
    assert float(jnp.max(d2)) < 1e-5


def test_labeling_grid():
    from vinsat_tpu.tools.labeling import label_grid

    lm = np.array([
        # centroid, left/bot, right/top — inside the window
        [-122.0, 36.0, -122.1, 35.9, -121.9, 36.1],
        # outside the window
        [10.0, 10.0, 9.9, 9.9, 10.1, 10.1],
    ])
    rows = label_grid(lm, -123.0, 35.0, -121.0, 37.0, 200, 100)
    assert rows.shape == (1, 5)
    cls, xc, yc, w, h = rows[0]
    assert cls == 0
    np.testing.assert_allclose(xc, 0.5, atol=1e-6)
    np.testing.assert_allclose(yc, 0.5, atol=1e-6)
    assert 0 < w < 0.2 and 0 < h < 0.2


def test_normal_eq_kernel_interpret_matches_reference(rng):
    import jax.numpy as jnp

    from vinsat_tpu.kernels import normal_eq

    N, D = 13, 4
    J = jnp.array(rng.normal(size=(N, D, 2, 9)))
    r = jnp.array(rng.normal(size=(N, D, 2)))
    w = jnp.array(rng.random((N, D)))
    G, g = normal_eq.assemble_normal_eq(J, r, w, interpret=True)
    G_ref, g_ref = normal_eq.assemble_normal_eq_reference(J, r, w)
    np.testing.assert_allclose(np.asarray(G), np.asarray(G_ref), rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5,
                               atol=1e-6)
