import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from vinsat_tpu.core import quat


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_multiply_matches_scipy(rng):
    q1 = random_quats(rng, 32)
    q2 = random_quats(rng, 32)
    got = np.asarray(quat.multiply(jnp.array(q1), jnp.array(q2)))
    # scipy Rotation uses scalar-last too; composition R(q1)R(q2) == q1 ⊗ q2
    want = (Rotation.from_quat(q1) * Rotation.from_quat(q2)).as_quat()
    # quaternions are sign-ambiguous
    sign = np.sign(np.sum(got * want, axis=-1, keepdims=True))
    np.testing.assert_allclose(got, want * sign, atol=1e-12)


def test_rotate_matches_matrix(rng):
    q = random_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    got = np.asarray(quat.rotate(jnp.array(q), jnp.array(v)))
    want = Rotation.from_quat(q).apply(v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_rotate_inverse(rng):
    q = random_quats(rng, 16)
    v = rng.normal(size=(16, 3))
    got = np.asarray(quat.rotate_inverse(jnp.array(q), jnp.array(v)))
    want = Rotation.from_quat(q).inv().apply(v)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_exp_log_roundtrip(rng):
    phi = rng.normal(size=(64, 3)) * 0.5
    q = quat.exp(jnp.array(phi))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(q), axis=-1), 1.0, atol=1e-12)
    phi2 = np.asarray(quat.log(q))
    np.testing.assert_allclose(phi2, phi, atol=1e-9)


def test_exp_small_angle():
    phi = jnp.array([[0.0, 0.0, 0.0], [1e-20, 0.0, 0.0]])
    q = np.asarray(quat.exp(phi))
    np.testing.assert_allclose(q[:, 3], 1.0, atol=1e-15)
    np.testing.assert_allclose(q[:, :3], 0.0, atol=1e-15)


def test_matrix_roundtrip(rng):
    q = random_quats(rng, 64)
    R = quat.to_matrix(jnp.array(q))
    np.testing.assert_allclose(
        np.asarray(R), Rotation.from_quat(q).as_matrix(), atol=1e-12
    )
    q2 = np.asarray(quat.from_matrix(R))
    sign = np.sign(np.sum(q2 * q, axis=-1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-9)


def test_attitude_jacobian_is_tangent_lift(rng):
    """Gq should equal d(q ⊗ exp(phi))/dphi * 2 at phi=0 (reference scaling)."""
    import jax

    q = jnp.array(random_quats(rng, 8))

    def f(phi, qq):
        return quat.multiply(qq, quat.exp(phi))

    J = jax.vmap(jax.jacfwd(f), in_axes=(0, 0))(jnp.zeros((8, 3)), q)
    Gq = quat.attitude_jacobian(q)
    np.testing.assert_allclose(np.asarray(J) * 2.0, np.asarray(Gq), atol=1e-12)


def test_omega_from_sequence_recovers_constant_rate(rng):
    w = np.array([0.01, -0.02, 0.005])
    dt = 1.0
    n = 50
    qs = [np.array([0.0, 0.0, 0.0, 1.0])]
    for _ in range(n):
        qs.append(np.asarray(quat.multiply(jnp.array(qs[-1]), quat.exp(jnp.array(w * dt)))))
    qs = jnp.array(np.stack(qs))
    om = np.asarray(quat.omega_from_sequence(qs, dt))
    np.testing.assert_allclose(om[:-1], np.tile(w, (n, 1)), atol=1e-10)
    np.testing.assert_allclose(om[-1], 0.0, atol=0)
