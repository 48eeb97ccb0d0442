import numpy as np
import jax.numpy as jnp

from vinsat_tpu.core import frames


def test_eci_ecef_roundtrip(rng):
    r = rng.normal(size=(32, 3)) * 7000.0
    t = rng.uniform(0, 10800, size=(32,))
    r_ecef = frames.eci_to_ecef(jnp.array(r), jnp.array(t))
    r_back = frames.ecef_to_eci(r_ecef, jnp.array(t))
    np.testing.assert_allclose(np.asarray(r_back), r, atol=1e-9)


def test_rz_orthonormal(rng):
    t = jnp.array(rng.uniform(0, 1e5, size=(8,)))
    Rz = np.asarray(frames.rz_eci_to_ecef(t))
    np.testing.assert_allclose(Rz @ Rz.transpose(0, 2, 1), np.tile(np.eye(3), (8, 1, 1)), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(Rz), 1.0, atol=1e-12)


def test_geodetic_ecef_roundtrip(rng):
    lat = rng.uniform(-80, 80, size=(64,))
    lon = rng.uniform(-180, 180, size=(64,))
    alt = rng.uniform(0, 10, size=(64,))
    r = frames.geodetic_to_ecef(jnp.array(lat), jnp.array(lon), jnp.array(alt))
    lat2, lon2, alt2 = frames.ecef_to_geodetic(r, iters=8)
    np.testing.assert_allclose(np.asarray(lat2), lat, atol=1e-7)
    np.testing.assert_allclose(np.asarray(lon2), lon, atol=1e-10)
    np.testing.assert_allclose(np.asarray(alt2), alt, atol=1e-6)


def test_geodetic_known_points():
    # Equator, prime meridian, sea level -> (a, 0, 0)
    r = np.asarray(frames.geodetic_to_ecef(jnp.array(0.0), jnp.array(0.0)))
    np.testing.assert_allclose(r, [frames.WGS84_A_KM, 0.0, 0.0], atol=1e-9)
    # North pole -> (0, 0, b)
    r = np.asarray(frames.geodetic_to_ecef(jnp.array(90.0), jnp.array(0.0)))
    np.testing.assert_allclose(r[2], frames.WGS84_B_KM, atol=1e-3)


def test_nadir_rotation_properties(rng):
    pos = rng.normal(size=(16, 3))
    pos = pos / np.linalg.norm(pos, axis=-1, keepdims=True) * 6900.0
    R = np.asarray(frames.nadir_rotation(jnp.array(pos)))
    # orthonormal, det +1
    np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (16, 1, 1)), atol=1e-12)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
    # boresight (3rd column) points to Earth centre
    zc = R[..., 2]
    np.testing.assert_allclose(zc, -pos / 6900.0, atol=1e-12)


def test_nadir_quaternion_consistent(rng):
    from vinsat_tpu.core import quat

    pos = rng.normal(size=(8, 3)) * 7000.0
    q = frames.nadir_quaternion(jnp.array(pos))
    R1 = np.asarray(quat.to_matrix(q))
    R2 = np.asarray(frames.nadir_rotation(jnp.array(pos)))
    np.testing.assert_allclose(R1, R2, atol=1e-9)


def test_lonlat_to_eci_matches_composition(rng):
    lon = jnp.array(rng.uniform(-180, 180, size=(8,)))
    lat = jnp.array(rng.uniform(-80, 80, size=(8,)))
    t = jnp.array(rng.uniform(0, 10800, size=(8,)))
    want = frames.ecef_to_eci(frames.geodetic_to_ecef(lat, lon), t)
    got = frames.lonlat_to_eci(lon, lat, t)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-9)
