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


def test_sharded_pallas_assembly_matches_einsum(rng):
    """The fused Pallas normal-eq assembly path of the sharded BA step
    matches the XLA einsum path on a well-posed problem (interpret mode).

    Uses the GT+noise geometry of test_sharded_ba so the first LM trial is
    robustly accepted on both paths (an ill-posed random problem can flip
    the lambda-acceptance branch on 1e-7 kernel rounding)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from test_sharded_ba import INTR, _build_problem
    from vinsat_tpu.dist import mesh as mesh_mod, sharded_ba
    from vinsat_tpu.estimation import ba
    from vinsat_tpu.kernels import normal_eq

    n_knots, D = 16, 4
    st, gaps, cum, lm, uv, conf, ii, lm_flat = _build_problem(rng, n_knots, D)
    params = ba.SolverParams(num_hops=3, max_substep=100.0)
    mesh = mesh_mod.make_mesh(n_orbit=1, n_arc=4)
    pv = np.ones((1, n_knots))
    pv[:, -1] = 0.0
    sprob = sharded_ba.ShardedProblem(
        states=st[None], gaps=gaps[None], cum_rot=cum[None],
        lm_xyz=jnp.array(lm)[None], uv=uv.reshape(n_knots, D, 2)[None],
        conf=conf.reshape(n_knots, D)[None],
        obs_valid=jnp.ones((1, n_knots, D)), pair_valid=jnp.array(pv),
        intrinsics=INTR,
    )
    step_ref = sharded_ba.make_sharded_ba_step(mesh, params)
    out_ref, _ = step_ref(jnp.asarray(0), jnp.full((1,), 1e-4), sprob)

    # NOTE: multi-device executables (like both step programs here) are
    # excluded from the persistent compilation cache — their jaxlib
    # serialization roundtrip segfaults (see conftest.py).
    orig = normal_eq.assemble_normal_eq
    normal_eq.assemble_normal_eq = functools.partial(orig, interpret=True)
    try:
        step_pal = sharded_ba.make_sharded_ba_step(
            mesh, params, use_pallas_assembly=True)
        out_pal, _ = step_pal(jnp.asarray(0), jnp.full((1,), 1e-4), sprob)
    finally:
        normal_eq.assemble_normal_eq = orig
    # kernel accumulates in f32 -> small state-update differences
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=1e-4, atol=5e-4)
