"""Scalar-last quaternion algebra in pure JAX.

Convention: q = [x, y, z, w] (scalar LAST), matching the reference's
estimation-side convention (estimation/BA/BA_utils.py:992-1000).  The
reference's simulator uses scalar-first with explicit swaps
(sim/orbit_gen.py:164-176,267); here scalar-last is used everywhere.

All functions broadcast over leading batch dimensions and are jit/vmap/grad
safe (no data-dependent control flow).
"""
from __future__ import annotations

import jax.numpy as jnp


def normalize(q, eps: float = 0.0):
    """Unit-normalize a quaternion along the last axis."""
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / (n + eps)


def multiply(q1, q2):
    """Hamilton product q1 ⊗ q2, scalar-last.

    Matches estimation/BA/BA_utils.py:992-1000 exactly (component formulas).
    """
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def conjugate(q):
    """Quaternion conjugate [-x, -y, -z, w] (BA_utils.py:987-990)."""
    return jnp.concatenate([-q[..., :3], q[..., 3:4]], axis=-1)


def exp(phi):
    """Axis-angle tangent vector -> unit quaternion (BA_utils.py:970-985).

    Small-angle-safe AND differentiable at phi=0: both the sinc factor and
    the scalar part are expressed as functions of theta^2 with Taylor-series
    branches selected by `where`, so forward/reverse AD through the switch
    point picks the (correct) polynomial branch instead of a zero branch.
    """
    t2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = t2 < 1e-12
    safe_t2 = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(safe_t2)
    # sin(theta/2)/theta, Taylor: 1/2 - t2/48 + t2^2/3840
    sinc_half = jnp.where(
        small, 0.5 - t2 / 48.0, jnp.sin(theta / 2.0) / theta
    )
    # cos(theta/2), Taylor: 1 - t2/8 + t2^2/384
    w = jnp.where(small, 1.0 - t2 / 8.0, jnp.cos(theta / 2.0))
    return jnp.concatenate([phi * sinc_half, w], axis=-1)


def log(q):
    """Unit quaternion -> axis-angle tangent vector (BA_utils.py:949-967)."""
    q = jnp.clip(normalize(q), -1.0, 1.0)
    w = jnp.clip(q[..., 3], -1.0, 1.0)
    theta = 2.0 * jnp.arccos(w)
    s = jnp.sin(theta / 2)
    safe_s = jnp.where(jnp.abs(s) < 1e-12, 1.0, s)
    n = q[..., :3] / safe_s[..., None]
    out = n * theta[..., None]
    return jnp.where(jnp.abs(s)[..., None] < 1e-12, 2.0 * q[..., :3], out)


def rotate(q, v):
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v.

    Equivalent to apply_pose_transformation_quat with no translation
    (BA_utils.py:1022-1042): v' = (q ⊗ [v,0] ⊗ q*) xyz.
    """
    qn = normalize(q)
    vq = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
    return multiply(qn, multiply(vq, conjugate(qn)))[..., :3]


def rotate_inverse(q, v):
    """Rotate v by the inverse rotation: R(q)^T @ v.

    Equivalent to apply_inverse_pose_transformation with no translation
    (BA_utils.py:1052-1069): v' = (q* ⊗ [v,0] ⊗ q) xyz.
    """
    qn = normalize(q)
    vq = jnp.concatenate([v, jnp.zeros_like(v[..., :1])], axis=-1)
    return multiply(conjugate(qn), multiply(vq, qn))[..., :3]


def to_matrix(q):
    """Unit quaternion -> 3x3 rotation matrix (column-stack of rotated axes)."""
    x, y, z, w = jnp.moveaxis(normalize(q), -1, 0)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def from_matrix(R):
    """3x3 rotation matrix -> scalar-last unit quaternion (Shepperd's method,
    branch-free via selecting the numerically best of the 4 candidates)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    qw = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22], axis=-1)
    # candidates are in [w, x, y, z] order above; reorder to scalar-last
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cand, 4comp wxyz)
    diag = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(diag, axis=-1)
    q_wxyz = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[
        ..., 0, :
    ]
    q = jnp.concatenate([q_wxyz[..., 1:], q_wxyz[..., :1]], axis=-1)
    return normalize(q)


def attitude_jacobian(q):
    """Tangent-lift matrix Gq (4x3), scalar-last (BA_utils.py:19-28).

    d q(phi)/d phi at phi=0 for q(phi) = q ⊗ exp(phi), up to the reference's
    convention (no 1/2 factor — matches BA_utils.attitude_jacobian).
    """
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    return jnp.stack(
        [
            jnp.stack([w, -z, y], axis=-1),
            jnp.stack([z, w, -x], axis=-1),
            jnp.stack([-y, x, w], axis=-1),
            jnp.stack([-x, -y, -z], axis=-1),
        ],
        axis=-2,
    )


def box_plus(q, phi):
    """Retraction: q ⊞ phi = normalize(q ⊗ exp(phi)) (BA_filtering.py:58-59)."""
    return normalize(multiply(q, exp(phi)))


def omega_from_sequence(q_seq, dt):
    """Finite-difference body angular rates from a quaternion sequence.

    Matches compute_omega_from_quat (BA_utils.py:1361-1367): omega_k =
    log(q_k* ⊗ q_{k+1}) / dt, final entry zero-padded.
    """
    dq = multiply(conjugate(q_seq[:-1]), q_seq[1:])
    dq = normalize(dq)
    omega = log(dq) / dt
    return jnp.concatenate([omega, jnp.zeros_like(omega[:1])], axis=0)
