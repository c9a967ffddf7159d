"""Rigid-body poses as JAX pytrees.

``Pose`` mirrors the reference's ``Twist<T>`` (include/utils/Twist.h:39-97):
a unit quaternion + translation acting on points as ``x' = R(q) x + t``.
Composition ``a @ b`` is ``Twist::operator*`` and ``inverse`` matches
``Twist::inverse``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import quaternion as quat


class Pose(NamedTuple):
    """Batched rigid transform: q is (...,4) [w,x,y,z], t is (...,3)."""

    q: jnp.ndarray
    t: jnp.ndarray

    # -- constructors ------------------------------------------------------
    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Pose":
        q = jnp.broadcast_to(quat.identity(dtype), batch_shape + (4,))
        t = jnp.zeros(batch_shape + (3,), dtype=dtype)
        return Pose(q, t)

    @staticmethod
    def from_matrix(m: jnp.ndarray) -> "Pose":
        return Pose(quat.from_matrix(m[..., :3, :3]), m[..., :3, 3])

    # -- algebra -----------------------------------------------------------
    def compose(self, other: "Pose") -> "Pose":
        """self * other (apply ``other`` first, then ``self``)."""
        return Pose(
            quat.qmul(self.q, other.q),
            quat.rotate(self.q, other.t) + self.t,
        )

    def __matmul__(self, other: "Pose") -> "Pose":
        return self.compose(other)

    def inverse(self) -> "Pose":
        qinv = quat.conjugate(quat.normalize(self.q))
        return Pose(qinv, -quat.rotate(qinv, self.t))

    def apply(self, points: jnp.ndarray) -> jnp.ndarray:
        """Transform (...,3) points: R(q) p + t (broadcasts over points)."""
        return quat.rotate(self.q[..., None, :], points) + self.t[..., None, :]

    def apply_one(self, point: jnp.ndarray) -> jnp.ndarray:
        """Transform a single (...,3) point without an extra points axis."""
        return quat.rotate(self.q, point) + self.t

    def rotation_matrix(self) -> jnp.ndarray:
        return quat.to_matrix(self.q)

    def matrix(self) -> jnp.ndarray:
        r = quat.to_matrix(self.q)
        top = jnp.concatenate([r, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype),
            self.t.shape[:-1] + (4,),
        )[..., None, :]
        return jnp.concatenate([top, bottom], axis=-2)

    def normalized(self) -> "Pose":
        return Pose(quat.normalize(self.q), self.t)

    def astype(self, dtype) -> "Pose":
        return Pose(self.q.astype(dtype), self.t.astype(dtype))


def pose_distance(a: Pose, b: Pose):
    """(rotation angle rad, translation norm) between two poses."""
    dr = quat.angular_distance(a.q, b.q)
    dt = jnp.linalg.norm(a.t - b.t, axis=-1)
    return dr, dt
