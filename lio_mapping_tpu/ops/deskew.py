"""Motion de-skew by per-point pose interpolation.

Parity targets:
* ``TransformToStart`` (PointOdometry.cc:237-259): project each point to the
  sweep start using slerp(identity, q_es, s) with s = rel_time/scan_period,
  inverting the per-point share of the end-to-start transform.
* ``TransformToEnd``  (PointOdometry.cc:261-292): to start, then apply the
  full end transform.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import quaternion as quat
from .cloud import Cloud


def transform_to_start(xyz, rel_time, q_es, t_es, scan_period: float, enabled: bool = True):
    """Per-point deskew to sweep start.

    q_es/t_es: transform accumulated from sweep start to end, in the start
    frame (the odometry increment estimate). For a point with time fraction
    s: p_start = slerp(I, q_es, s)^-1 (p - s * t_es).
    """
    if not enabled:
        return xyz
    s = jnp.clip(rel_time / scan_period, 0.0, 1.001)[..., None]
    p = xyz - s * t_es
    q_s = quat.slerp(
        jnp.broadcast_to(quat.identity(q_es.dtype), xyz.shape[:-1] + (4,)),
        jnp.broadcast_to(q_es, xyz.shape[:-1] + (4,)),
        s[..., 0],
    )
    return quat.rotate(quat.conjugate(q_s), p)


def transform_to_end(xyz, rel_time, q_es, t_es, scan_period: float, enabled: bool = True):
    """Per-point re-projection to sweep end (TransformToEnd)."""
    p_start = transform_to_start(xyz, rel_time, q_es, t_es, scan_period, enabled)
    return quat.rotate(q_es, p_start) + t_es


def cloud_to_end(c: Cloud, q_es, t_es, scan_period: float, enabled: bool = True) -> Cloud:
    new_xyz = transform_to_end(c.xyz, c.rel_time, q_es, t_es, scan_period, enabled)
    return c._replace(xyz=new_xyz, rel_time=jnp.zeros_like(c.rel_time))
