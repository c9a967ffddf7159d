"""Scan-to-map refinement + cube voxel map (LiDAR-only back end).

Parity target: src/point_processor/PointMapping.cc (SURVEY §2 #3).

Reference behavior reproduced with fixed shapes:
* the reference's 21x21x11 cube grid of 50 m cells with pointer-swap
  recentering (PointMapping.cc:77-118, :819-921) becomes a flat
  fixed-capacity voxel store with a moving origin (see VoxelMapStore) —
  the same sliding active region without pointer chasing; the +-60 deg
  FOV cone test (:933-988) gates associations.
* corner -> 5-NN covariance line fit (accept if l_max > 3 l_mid, :381-510);
  surf -> 5-NN plane fit with 0.2 m planarity validation (:514-606).
* 6-DoF GN, eigenvalue-100 degeneracy projection, right-multiplied DeltaQ
  update, 0.05 deg / 0.05 cm abort (:614-714).
* map insertion with per-cube voxel re-downsampling (:1112-1208), done for
  the active 5x5x5 neighborhood only.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import LioConfig
from ..ops import gn as GN
from ..ops import knn as KNN
from ..ops import voxel as VX
from ..ops.cloud import Cloud
from ..ops.fits import line_fit, plane_fit, point_to_line_residual
from ..utils import quaternion as quat
from ..utils.se3 import Pose


class VoxelMapStore(NamedTuple):
    """Flat fixed-capacity voxel-centroid map with a moving origin.

    TPU-first replacement for the reference's 21x21x11 cube-pointer grid
    (PointMapping.cc:77-118): one padded point array IS the match database
    (exact tiled KNN needs no spatial bucketing on an MXU), voxel dedup is
    the sort-based reduction of ops/voxel, and "recentering" is just moving
    the origin — points outside ``radius`` of it are dropped at the next
    insert, mirroring the reference's sliding cube window. The unbounded
    full-map archive lives host-side in native.GlobalVoxelMap.

    xyz: (CAP, 3) world coords; mask: (CAP,); origin: (3,) recenter point.
    """

    xyz: jnp.ndarray
    mask: jnp.ndarray
    origin: jnp.ndarray

    @staticmethod
    def empty(cap: int, dtype=jnp.float32) -> "VoxelMapStore":
        return VoxelMapStore(
            xyz=jnp.zeros((cap, 3), dtype),
            mask=jnp.zeros((cap,), bool),
            origin=jnp.zeros((3,), dtype),
        )


class MappingState(NamedTuple):
    corner_map: VoxelMapStore
    surf_map: VoxelMapStore
    pose: Pose                  # transform_aft_mapped_ (tobe after update)
    pose_bef: Pose              # transform_bef_mapped_ (last odometry input)
    initialized: jnp.ndarray


def init_state(cfg: LioConfig, dtype=jnp.float32) -> MappingState:
    m = cfg.mapping
    return MappingState(
        corner_map=VoxelMapStore.empty(m.map_cloud_cap, dtype),
        surf_map=VoxelMapStore.empty(m.map_cloud_cap, dtype),
        pose=Pose.identity(dtype=dtype),
        pose_bef=Pose.identity(dtype=dtype),
        initialized=jnp.asarray(False),
    )


def insert_into_map(vm: VoxelMapStore, points, mask, pose: Pose, leaf: float,
                    cfg: LioConfig) -> VoxelMapStore:
    """UpdateMapDatabase equivalent: union + voxel re-downsample + recenter.

    The reference inserts into cubes and re-downsamples each touched cube
    (PointMapping.cc:1112-1208); here the union of (map, new world points)
    is voxel-reduced in one sort. The origin follows the pose; points
    beyond the active extent are dropped (the cube window slide).

    Extent parity (r3): the active region matches the reference's
    21x21x11 cube grid of 50 m cells = +-525 m (xy) / +-275 m (z) around
    the recentering pose (PointMapping.cc:77-83,819-921), held in the
    13-bit wide voxel packing (ops/voxel ``wide=True``; +-4096 cells >=
    +-819 m even at the 0.2 m corner leaf) — revisits within the
    reference's kilometre-scale active map keep their constraints
    (tests/test_mapping.py revisit test).
    """
    m = cfg.mapping
    # reference active extent: half the cube grid per axis
    ext_xy = 0.5 * m.cube_length * m.cube_size_m
    ext_z = 0.5 * m.cube_height * m.cube_size_m
    key_limit = 0.95 * leaf * VX.HALF_CELLS_WIDE
    extent = jnp.asarray([min(ext_xy, key_limit), min(ext_xy, key_limit),
                          min(ext_z, key_limit)], vm.xyz.dtype)
    world = pose.apply(points)
    # snap the origin to a coarse leaf multiple so the voxel grid stays
    # aligned as the origin tracks the pose (no re-quantization smear)
    snap = leaf * 64.0
    new_origin = jnp.round(pose.t / snap) * snap

    all_xyz = jnp.concatenate([vm.xyz - new_origin[None, :],
                               world - new_origin[None, :]], axis=0)
    in_range = jnp.all(jnp.abs(all_xyz) < extent[None, :], axis=-1)
    all_mask = jnp.concatenate([vm.mask, mask], axis=0) & in_range

    cap = vm.xyz.shape[0]
    out_xyz, out_mask, _ = VX.voxel_downsample(
        all_xyz, all_mask, leaf, cap, wide=True)
    return VoxelMapStore(
        xyz=out_xyz + new_origin[None, :], mask=out_mask, origin=new_origin)


def optimize_to_map(
    corner_db, corner_db_mask, surf_db, surf_db_mask,
    corner_stack, corner_stack_mask, surf_stack, surf_stack_mask,
    pose0: Pose, cfg: LioConfig,
    *,
    yaw_constrained: bool = False,
):
    """The scan-to-map GN (OptimizeTransformTobeMapped, PointMapping.cc:325-753).

    ``yaw_constrained`` selects the MapBuilder variant (MapBuilder.cc:624-1014):
    rotation Jacobian damped by diag(5e-3, 5e-3, 1) in the body frame and a
    LEFT-multiplied DeltaQ update — only the (gravity-observable-free) yaw
    plus translation are refined.
    """
    mcfg = cfg.mapping
    dtype = pose0.t.dtype
    enough = (jnp.sum(corner_db_mask) > 10) & (jnp.sum(surf_db_mask) > 100)

    def body(carry):
        it, done, q, t, proj, degen = carry
        pose = Pose(q, t)

        # ---- corner associations: 5-NN line fit ----
        # force_tiled: the Pallas search fused into the full mapping
        # program degrades the corner path on real TPU exactly as in the
        # estimator (LOAM 90-sweep A/B: 0.060 m pallas vs 0.021 m tiled;
        # see make_knn5's note) — the corner DB is small, tiled is cheap
        c_sel = pose.apply(corner_stack)
        c_d, c_idx = KNN.knn(c_sel, corner_stack_mask, corner_db, corner_db_mask, k=5, prune_beyond=mcfg.min_match_sq_dis, force_tiled=True)
        c_ok = c_d[:, 4] < mcfg.min_match_sq_dis
        centroid, direction, line_ok = line_fit(corner_db[c_idx], c_ok)
        ld2, c_n = point_to_line_residual(c_sel, centroid, direction)
        s_c = 1.0 - 0.9 * jnp.abs(ld2)
        w_c = corner_stack_mask & c_ok & line_ok & (s_c > 0.1)
        coeff_c = s_c[:, None] * c_n
        d_c = s_c * ld2

        # ---- surf associations: 5-NN plane fit ----
        s_sel = pose.apply(surf_stack)
        s_d, s_idx = KNN.knn(s_sel, surf_stack_mask, surf_db, surf_db_mask, k=5, prune_beyond=mcfg.min_match_sq_dis)
        s_ok = s_d[:, 4] < mcfg.min_match_sq_dis
        pw, pd, plane_ok = plane_fit(surf_db[s_idx], s_ok, mcfg.min_plane_dis)
        pd2 = jnp.sum(pw * s_sel, axis=-1) + pd
        rng = jnp.sqrt(jnp.maximum(jnp.linalg.norm(s_sel, axis=-1), 1e-12))
        s_s = 1.0 - 0.9 * jnp.abs(pd2) / rng
        # reference flips the plane sign so pd2 > 0 (PointMapping.cc:557-577);
        # for the GN row d and w flip together, which is equivalent
        w_s = surf_stack_mask & s_ok & plane_ok & (s_s > 0.1)
        coeff_s = s_s[:, None] * pw
        d_s = s_s * pd2

        # ---- FOV cone gate (PointMapping.cc:487-503) ----
        def fov_ok(sel):
            z_axis = pose.apply_one(jnp.asarray([0.0, 0.0, 10.0], dtype))
            sq1 = jnp.sum((sel - t[None, :]) ** 2, axis=-1)
            sq2 = jnp.sum((sel - z_axis[None, :]) ** 2, axis=-1)
            chk1 = 100.0 + sq1 - sq2 - 10.0 * jnp.sqrt(3.0) * jnp.sqrt(sq1)
            chk2 = 100.0 + sq1 - sq2 + 10.0 * jnp.sqrt(3.0) * jnp.sqrt(sq1)
            return (chk1 < 0) & (chk2 > 0)

        w_c2 = w_c & fov_ok(c_sel)
        w_s2 = w_s & fov_ok(s_sel)

        # ---- assemble GN rows on ORIGINAL stack points ----
        p_all = jnp.concatenate([corner_stack, surf_stack], axis=0)
        w_all = jnp.concatenate([coeff_c, coeff_s], axis=0)
        d_all = jnp.concatenate([d_c, d_s], axis=0)
        row_ok = jnp.concatenate([w_c2, w_s2], axis=0)

        rot = quat.to_matrix(q)
        if yaw_constrained:
            # J_r damped to ~yaw-only in the body frame (MapBuilder.cc:894-905)
            right_info = jnp.diag(jnp.asarray([5e-3, 5e-3, 1.0], dtype))
            j_r = -jnp.einsum(
                "ni,nij->nj", w_all, (rot @ quat.skew(p_all)) @ rot.T @ right_info)
        else:
            j_r = -jnp.einsum("ni,nij->nj", w_all, rot @ quat.skew(p_all))
        j_t = w_all
        jac = jnp.concatenate([j_r, j_t], axis=1)
        rhs = -d_all
        wrow = row_ok.astype(dtype)

        n_rows = jnp.sum(wrow)
        jw = jac * wrow[:, None]
        ata = jw.T @ jac
        atb = jw.T @ rhs
        x = jnp.linalg.solve(ata + 1e-9 * jnp.eye(6, dtype=dtype), atb)

        first = it == 0
        # 6x6 eigh is an expensive custom call on TPU: run only at iter 0
        proj, degen = jax.lax.cond(
            first,
            lambda a: (lambda g: (g.proj, g.is_degenerate))(
                GN.degeneracy_projection(a, mcfg.degeneracy_eigen_th)),
            lambda a: (proj, degen),
            ata)
        x = jnp.where(degen, proj @ x, x)
        x = jnp.where(jnp.isfinite(x), x, 0.0)
        x = jnp.where(n_rows < 50, 0.0, x)  # reference `continue` (:610)

        t_new = t + x[3:6]
        if yaw_constrained:
            # left-multiplied DeltaQ (MapBuilder.cc:984-986)
            q_new = quat.normalize(quat.qmul(quat.delta_q(x[0:3]), q))
        else:
            q_new = quat.normalize(quat.qmul(q, quat.delta_q(x[0:3])))
        t_new = jnp.where(jnp.isfinite(t_new), t_new, 0.0)

        delta_r = jnp.rad2deg(quat.angular_distance(q, q_new))
        delta_t = jnp.linalg.norm(x[3:6]) * 100.0
        done = (n_rows >= 50) & (delta_r < mcfg.delta_r_abort_deg) & (delta_t < mcfg.delta_t_abort_cm)
        return (it + 1, done, q_new, t_new, proj, degen)

    def cond(carry):
        it, done, *_ = carry
        return (it < mcfg.max_iterations) & (~done)

    carry = (jnp.asarray(0), jnp.asarray(False), pose0.q, pose0.t,
             jnp.eye(6, dtype=dtype), jnp.asarray(False))
    _, _, q_fin, t_fin, _, _ = jax.lax.while_loop(cond, body, carry)

    q_out = jnp.where(enough, q_fin, pose0.q)
    t_out = jnp.where(enough, t_fin, pose0.t)
    return Pose(q_out, t_out)


@partial(jax.jit, static_argnames=("cfg",))
def mapping_step(
    state: MappingState,
    corner_cloud: Cloud,   # odometry's less-sharp output @ sweep end
    surf_cloud: Cloud,     # odometry's less-flat output @ sweep end
    odom_pose: Pose,       # transform_sum_ from scan-to-scan odometry
    cfg: LioConfig,
) -> Tuple[MappingState, dict]:
    """One PointMapping::Process call (PointMapping.cc:765-1110)."""
    m = cfg.mapping
    dtype = state.pose.t.dtype

    # TransformAssociateToMap: chain the odometry increment (:755-758)
    incre = state.pose_bef.inverse() @ odom_pose
    pose_tobe = (state.pose @ incre).normalized()

    corner_db, corner_db_mask = state.corner_map.xyz, state.corner_map.mask
    surf_db, surf_db_mask = state.surf_map.xyz, state.surf_map.mask

    # downsample incoming stacks (corner 0.2, surf 0.4; :1014-1023)
    c_xyz, c_mask, _ = VX.voxel_downsample(
        corner_cloud.xyz, corner_cloud.mask, m.corner_filter_size, cfg.estimator.corner_stack_cap)
    s_xyz, s_mask, _ = VX.voxel_downsample(
        surf_cloud.xyz, surf_cloud.mask, m.surf_filter_size, cfg.estimator.surf_stack_cap)

    pose_opt = optimize_to_map(
        corner_db, corner_db_mask, surf_db, surf_db_mask,
        c_xyz, c_mask, s_xyz, s_mask, pose_tobe, cfg)

    pose_opt = jax.tree.map(
        lambda new, old: jnp.where(state.initialized, new, old), pose_opt, pose_tobe)

    # map insertion
    corner_map = insert_into_map(
        state.corner_map, c_xyz, c_mask, pose_opt, m.corner_filter_size, cfg)
    surf_map = insert_into_map(
        state.surf_map, s_xyz, s_mask, pose_opt, m.surf_filter_size, cfg)

    new_state = MappingState(
        corner_map=corner_map,
        surf_map=surf_map,
        pose=pose_opt,
        pose_bef=odom_pose,
        initialized=jnp.asarray(True),
    )
    outputs = {"pose": pose_opt, "n_map_corner": jnp.sum(corner_db_mask),
               "n_map_surf": jnp.sum(surf_db_mask)}
    return new_state, outputs
