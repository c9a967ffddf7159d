"""Global "4D" map builder: yaw-constrained scan-to-map refinement.

Parity target: src/map_builder/MapBuilder.cc (SURVEY §2 #19).

Consumes the estimator's local outputs (pivot clouds + local odometry) and
maintains the global cube map, refining only yaw + translation: roll/pitch
are already observable in the tightly-coupled estimator through gravity, so
the builder keeps them fixed —

* ``Transform4DAssociateToMap`` (MapBuilder.cc:55-75): predict with the full
  incremental transform but keep only its YAW offset over the incoming
  odometry rotation.
* ``OptimizeMap`` (:624-1014): the PointMapping GN with the rotation
  Jacobian right-damped by diag(5e-3, 5e-3, 1) in the body frame and a
  left-multiplied DeltaQ update — shared here via
  ``mapping.optimize_to_map(..., yaw_constrained=True)``.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import LioConfig
from ..ops import voxel as VX
from ..ops.cloud import Cloud
from ..utils import quaternion as quat
from ..utils.se3 import Pose
from .mapping import (MappingState, init_state, insert_into_map,
                      optimize_to_map)

__all__ = ["init_state", "map_builder_step"]


def transform_4d_associate(state: MappingState, odom_pose: Pose) -> Pose:
    """Yaw-only pre-alignment (MapBuilder.cc:55-75)."""
    incre = state.pose_bef.inverse() @ odom_pose
    full = (state.pose @ incre).normalized()

    ypr_full = quat.rot_to_ypr(quat.to_matrix(full.q))
    ypr_odom = quat.rot_to_ypr(quat.to_matrix(odom_pose.q))
    y_diff = ypr_full[0] - ypr_odom[0]
    dtype = odom_pose.t.dtype
    rot_diff = quat.ypr_to_rot(
        jnp.stack([y_diff, jnp.zeros((), dtype), jnp.zeros((), dtype)]))
    q_new = quat.normalize(
        quat.qmul(quat.from_matrix(rot_diff), quat.normalize(odom_pose.q)))
    return Pose(q_new, full.t)


@partial(jax.jit, static_argnames=("cfg",))
def map_builder_step(
    state: MappingState,
    corner_cloud: Cloud,
    surf_cloud: Cloud,
    odom_pose: Pose,
    cfg: LioConfig,
) -> Tuple[MappingState, dict]:
    """One MapBuilder::ProcessMap call (MapBuilder.cc:220-540)."""
    m = cfg.mapping

    pose_tobe = transform_4d_associate(state, odom_pose)
    corner_db, corner_db_mask = state.corner_map.xyz, state.corner_map.mask
    surf_db, surf_db_mask = state.surf_map.xyz, state.surf_map.mask

    c_xyz, c_mask, _ = VX.voxel_downsample(
        corner_cloud.xyz, corner_cloud.mask, m.corner_filter_size,
        cfg.estimator.corner_stack_cap)
    s_xyz, s_mask, _ = VX.voxel_downsample(
        surf_cloud.xyz, surf_cloud.mask, m.surf_filter_size,
        cfg.estimator.surf_stack_cap)

    pose_opt = optimize_to_map(
        corner_db, corner_db_mask, surf_db, surf_db_mask,
        c_xyz, c_mask, s_xyz, s_mask, pose_tobe, cfg,
        yaw_constrained=True)

    pose_opt = jax.tree.map(
        lambda new, old: jnp.where(state.initialized, new, old), pose_opt, pose_tobe)

    corner_map = insert_into_map(
        state.corner_map, c_xyz, c_mask, pose_opt, m.corner_filter_size, cfg)
    surf_map = insert_into_map(
        state.surf_map, s_xyz, s_mask, pose_opt, m.surf_filter_size, cfg)

    new_state = MappingState(
        corner_map=corner_map, surf_map=surf_map,
        pose=pose_opt, pose_bef=odom_pose,
        initialized=jnp.asarray(True))
    return new_state, {"pose": pose_opt}
