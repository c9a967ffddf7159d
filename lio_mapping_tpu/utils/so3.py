"""SO(3) maps and Jacobians.

Parity targets (reference: include/utils/geometry_utils.h:193-280):
``right_jacobian`` / ``right_jacobian_inverse`` are the standard SO(3) right
Jacobian J_r(phi) and its inverse, used by the reference's GN solvers and
validated by test/test_rotations.cc.
"""

from __future__ import annotations

import jax.numpy as jnp

from .quaternion import skew

__all__ = ["exp_matrix", "log_matrix", "right_jacobian", "right_jacobian_inverse", "left_jacobian"]


def exp_matrix(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: rotation vector -> rotation matrix."""
    angle = jnp.linalg.norm(phi, axis=-1)
    small = angle < 1e-8
    a = jnp.where(small, 1.0 - angle**2 / 6.0, jnp.sin(angle) / jnp.maximum(angle, 1e-30))
    b = jnp.where(small, 0.5 - angle**2 / 24.0, (1.0 - jnp.cos(angle)) / jnp.maximum(angle**2, 1e-30))
    k = skew(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + a[..., None, None] * k + b[..., None, None] * (k @ k)


def log_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> rotation vector (principal branch)."""
    tr = jnp.trace(m, axis1=-2, axis2=-1)
    cos_a = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    angle = jnp.arccos(cos_a)
    w = jnp.stack(
        [m[..., 2, 1] - m[..., 1, 2], m[..., 0, 2] - m[..., 2, 0], m[..., 1, 0] - m[..., 0, 1]],
        axis=-1,
    )
    sin_a = jnp.sin(angle)
    scale = jnp.where(angle < 1e-7, 0.5 + angle**2 / 12.0, angle / jnp.maximum(2.0 * sin_a, 1e-30))
    return scale[..., None] * w


def right_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """J_r(phi) = I - (1-cos)/a^2 [phi]x + (a - sin a)/a^3 [phi]x^2."""
    angle = jnp.linalg.norm(phi, axis=-1)
    small = angle < 1e-8
    a2 = jnp.maximum(angle**2, 1e-30)
    a3 = jnp.maximum(angle**3, 1e-30)
    c1 = jnp.where(small, 0.5 - angle**2 / 24.0, (1.0 - jnp.cos(angle)) / a2)
    c2 = jnp.where(small, 1.0 / 6.0 - angle**2 / 120.0, (angle - jnp.sin(angle)) / a3)
    k = skew(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye - c1[..., None, None] * k + c2[..., None, None] * (k @ k)


def right_jacobian_inverse(phi: jnp.ndarray) -> jnp.ndarray:
    """J_r(phi)^-1 = I + 1/2 [phi]x + (1/a^2 - (1+cos)/(2 a sin)) [phi]x^2."""
    angle = jnp.linalg.norm(phi, axis=-1)
    small = angle < 1e-8
    a2 = jnp.maximum(angle**2, 1e-30)
    coef = jnp.where(
        small,
        1.0 / 12.0 + angle**2 / 720.0,
        1.0 / a2 - (1.0 + jnp.cos(angle)) / jnp.maximum(2.0 * angle * jnp.sin(angle), 1e-30),
    )
    k = skew(phi)
    eye = jnp.eye(3, dtype=phi.dtype)
    return eye + 0.5 * k + coef[..., None, None] * (k @ k)


def left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """J_l(phi) = J_r(-phi)."""
    return right_jacobian(-phi)
