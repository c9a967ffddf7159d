"""Quaternion algebra for the TPU-native LIO engine.

Conventions
-----------
* Quaternions are stored as ``(..., 4)`` arrays in **[w, x, y, z]** order.
* Hamilton convention, right-handed: ``qmul(a, b)`` corresponds to Eigen's
  ``a * b`` and rotating a vector is ``R(q) @ v``.
* All functions are shape-polymorphic over leading batch dimensions and are
  safe to ``jax.vmap`` / ``jax.jit``.

Behavioral parity targets (reference: hyye/lio-mapping):
* ``delta_q``       -> include/utils/math_utils.h:117-128 (DeltaQ)
* ``left_matrix``   -> include/utils/math_utils.h:140-149 (LeftQuatMatrix)
* ``right_matrix``  -> include/utils/math_utils.h:152-161 (RightQuatMatrix)
* ``rot_to_ypr``    -> include/utils/math_utils.h:188-203 (R2ypr, degrees)
* ``ypr_to_rot``    -> include/utils/math_utils.h:205-230 (ypr2R, degrees)
* ``slerp``         -> Eigen slerp as used in PointOdometry.cc:252-257
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "identity",
    "normalize",
    "qmul",
    "conjugate",
    "inverse",
    "rotate",
    "to_matrix",
    "from_matrix",
    "delta_q",
    "from_axis_angle",
    "to_axis_angle",
    "exp",
    "log",
    "slerp",
    "left_matrix",
    "right_matrix",
    "angular_distance",
    "rot_to_ypr",
    "ypr_to_rot",
    "skew",
]


def identity(dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def normalize(q: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def qmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b (Eigen's ``a * b``)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def conjugate(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def inverse(q: jnp.ndarray) -> jnp.ndarray:
    """Inverse assuming (near-)unit quaternion."""
    return conjugate(normalize(q))


def rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector(s) ``v`` by unit quaternion(s) ``q``: R(q) @ v.

    Uses the 15-mul expansion (q * (0,v) * q^-1) without building R.
    """
    qw = q[..., 0:1]
    qv = q[..., 1:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion [w,x,y,z] (branchless, Shepperd)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22

    # Four candidate constructions; pick the numerically best by max pivot.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 0.0)) / 2.0
    q0 = jnp.stack(
        [qw0, (m21 - m12) / (4.0 * qw0 + 1e-30), (m02 - m20) / (4.0 * qw0 + 1e-30),
         (m10 - m01) / (4.0 * qw0 + 1e-30)], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 0.0)) / 2.0
    q1 = jnp.stack(
        [(m21 - m12) / (4.0 * qx1 + 1e-30), qx1, (m01 + m10) / (4.0 * qx1 + 1e-30),
         (m02 + m20) / (4.0 * qx1 + 1e-30)], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 0.0)) / 2.0
    q2 = jnp.stack(
        [(m02 - m20) / (4.0 * qy2 + 1e-30), (m01 + m10) / (4.0 * qy2 + 1e-30), qy2,
         (m12 + m21) / (4.0 * qy2 + 1e-30)], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 0.0)) / 2.0
    q3 = jnp.stack(
        [(m10 - m01) / (4.0 * qz3 + 1e-30), (m02 + m20) / (4.0 * qz3 + 1e-30),
         (m12 + m21) / (4.0 * qz3 + 1e-30), qz3], axis=-1)

    pivots = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22, -m00 - m11 + m22], axis=-1)
    case = jnp.argmax(pivots, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)
    q = jnp.take_along_axis(qs, case[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return normalize(q)


def delta_q(theta: jnp.ndarray) -> jnp.ndarray:
    """Small-angle quaternion [1, theta/2] (NOT normalized), reference DeltaQ."""
    half = 0.5 * theta
    one = jnp.ones(theta.shape[:-1] + (1,), dtype=theta.dtype)
    return jnp.concatenate([one, half], axis=-1)


def from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    half = 0.5 * angle[..., None]
    return jnp.concatenate([jnp.cos(half), jnp.sin(half) * axis], axis=-1)


def to_axis_angle(q: jnp.ndarray):
    qn = normalize(q)
    # Force positive w for a canonical (shortest) rotation.
    qn = jnp.where(qn[..., 0:1] < 0, -qn, qn)
    sin_half = jnp.linalg.norm(qn[..., 1:4], axis=-1)
    angle = 2.0 * jnp.arctan2(sin_half, qn[..., 0])
    axis = qn[..., 1:4] / jnp.maximum(sin_half, 1e-12)[..., None]
    return axis, angle


def exp(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential: rotation vector -> unit quaternion.

    Autodiff-safe at phi = 0 (norm is computed on a guarded argument so the
    untaken branch of the small-angle select cannot produce NaN gradients).
    """
    sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = sq < 1e-16
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))  # guarded: no sqrt(0) grad
    half = 0.5 * angle
    k_small = 0.5 - sq / 48.0
    k_big = jnp.sin(half) / angle
    k = jnp.where(small, k_small, k_big)
    w = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * phi], axis=-1)


def log(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion -> rotation vector (inverse of exp)."""
    axis, angle = to_axis_angle(q)
    return axis * angle[..., None]


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Eigen-equivalent slerp between unit quaternions, elementwise in s."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1_adj = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    d = jnp.clip(d, -1.0, 1.0)
    theta = jnp.arccos(d)
    sin_theta = jnp.sin(theta)
    s = jnp.asarray(s)[..., None] if jnp.ndim(s) == jnp.ndim(q0) - 1 else jnp.asarray(s)
    use_lerp = sin_theta < 1e-5
    w0 = jnp.where(use_lerp, 1.0 - s, jnp.sin((1.0 - s) * theta) / jnp.maximum(sin_theta, 1e-30))
    w1 = jnp.where(use_lerp, s, jnp.sin(s * theta) / jnp.maximum(sin_theta, 1e-30))
    return normalize(w0 * q0 + w1 * q1_adj)


def left_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """4x4 matrix L(q) with q*p == L(q) @ coeffs(p), coeffs in Eigen order [x,y,z,w].

    Matches reference LeftQuatMatrix (math_utils.h:140-149) exactly, including
    the [x,y,z,w] coefficient layout.
    """
    w = q[..., 0]
    v = q[..., 1:4]
    top_left = w[..., None, None] * jnp.eye(3, dtype=q.dtype) + skew(v)
    row = -v[..., None, :]
    col = v[..., :, None]
    m = jnp.concatenate(
        [jnp.concatenate([top_left, col], axis=-1),
         jnp.concatenate([row, w[..., None, None]], axis=-1)],
        axis=-2,
    )
    return m


def right_matrix(p: jnp.ndarray) -> jnp.ndarray:
    """4x4 matrix R(p) with q*p == R(p) @ coeffs(q); coeffs order [x,y,z,w]."""
    w = p[..., 0]
    v = p[..., 1:4]
    top_left = w[..., None, None] * jnp.eye(3, dtype=p.dtype) - skew(v)
    row = -v[..., None, :]
    col = v[..., :, None]
    m = jnp.concatenate(
        [jnp.concatenate([top_left, col], axis=-1),
         jnp.concatenate([row, w[..., None, None]], axis=-1)],
        axis=-2,
    )
    return m


def angular_distance(q0: jnp.ndarray, q1: jnp.ndarray) -> jnp.ndarray:
    """Angle (rad) of q0^-1 * q1, Eigen angularDistance equivalent."""
    d = qmul(conjugate(normalize(q0)), normalize(q1))
    return 2.0 * jnp.arctan2(jnp.linalg.norm(d[..., 1:4], axis=-1), jnp.abs(d[..., 0]))


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """(...,3) -> (...,3,3) skew-symmetric matrix [v]x (math_utils.h:131-137)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def rot_to_ypr(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> yaw/pitch/roll in DEGREES (reference R2ypr)."""
    n = m[..., :, 0]
    o = m[..., :, 1]
    a = m[..., :, 2]
    y = jnp.arctan2(n[..., 1], n[..., 0])
    p = jnp.arctan2(-n[..., 2], n[..., 0] * jnp.cos(y) + n[..., 1] * jnp.sin(y))
    r = jnp.arctan2(
        a[..., 0] * jnp.sin(y) - a[..., 1] * jnp.cos(y),
        -o[..., 0] * jnp.sin(y) + o[..., 1] * jnp.cos(y),
    )
    return jnp.stack([y, p, r], axis=-1) * (180.0 / jnp.pi)


def ypr_to_rot(ypr_deg: jnp.ndarray) -> jnp.ndarray:
    """yaw/pitch/roll in DEGREES -> rotation matrix Rz(y)Ry(p)Rx(r)."""
    ypr = ypr_deg * (jnp.pi / 180.0)
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    m = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return m.reshape(ypr.shape[:-1] + (3, 3))
