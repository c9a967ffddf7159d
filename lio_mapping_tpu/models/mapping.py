"""Scan-to-map refinement + cube voxel map (LiDAR-only back end).

Parity target: src/point_processor/PointMapping.cc (SURVEY §2 #3).

Reference behavior reproduced with fixed shapes:
* world map = 21 x 21 x 11 cubes of 50 m (PointMapping.cc:77-83); instead
  of pointer swaps the map keeps an integer cube-origin that shifts when
  the pose nears the grid edge, rolling the cube arrays (:819-921).
* 5x5x5 neighborhood cube selection with the +-60 deg FOV cone test
  (:933-988) feeding the match database.
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

NEIGH = 5  # 5x5x5 neighborhood (PointMapping.cc:933)


class CubeMap(NamedTuple):
    """Fixed-capacity cube-grid map for one feature class.

    xyz:   (L*W*H, C, 3); mask: (L*W*H, C)
    origin: (3,) int32 — world cube coords of grid cell (0,0,0)
    """

    xyz: jnp.ndarray
    mask: jnp.ndarray
    origin: jnp.ndarray

    @staticmethod
    def empty(cfg: LioConfig, cap: int, dtype=jnp.float32) -> "CubeMap":
        m = cfg.mapping
        n = m.cube_length * m.cube_width * m.cube_height
        return CubeMap(
            xyz=jnp.zeros((n, cap, 3), dtype),
            mask=jnp.zeros((n, cap), bool),
            # reference centers the grid: cen = 10, 10, 5 (PointMapping.cc:107)
            origin=jnp.asarray(
                [-(m.cube_length // 2), -(m.cube_width // 2), -(m.cube_height // 2)],
                jnp.int32),
        )


class MappingState(NamedTuple):
    corner_map: CubeMap
    surf_map: CubeMap
    pose: Pose                  # transform_aft_mapped_ (tobe after update)
    pose_bef: Pose              # transform_bef_mapped_ (last odometry input)
    initialized: jnp.ndarray


def init_state(cfg: LioConfig, dtype=jnp.float32) -> MappingState:
    m = cfg.mapping
    return MappingState(
        corner_map=CubeMap.empty(cfg, m.cube_point_cap, dtype),
        surf_map=CubeMap.empty(cfg, m.cube_point_cap, dtype),
        pose=Pose.identity(dtype=dtype),
        pose_bef=Pose.identity(dtype=dtype),
        initialized=jnp.asarray(False),
    )


def _grid_dims(cfg: LioConfig):
    m = cfg.mapping
    return m.cube_length, m.cube_width, m.cube_height


def _cube_index_of(points: jnp.ndarray, origin: jnp.ndarray, cfg: LioConfig):
    """World points -> flat grid cube index (or -1 if outside)."""
    m = cfg.mapping
    half = m.cube_size_m / 2.0
    # reference: int((x + 25) / 50) with floor-like shift for negatives
    # (PointMapping.cc:1118-1132) == round-to-nearest cube center
    ijk = jnp.floor((points + half) / m.cube_size_m).astype(jnp.int32)
    rel = ijk - origin
    l, w, h = _grid_dims(cfg)
    inside = (
        (rel[..., 0] >= 0) & (rel[..., 0] < l)
        & (rel[..., 1] >= 0) & (rel[..., 1] < w)
        & (rel[..., 2] >= 0) & (rel[..., 2] < h))
    flat = (rel[..., 0] * w + rel[..., 1]) * h + rel[..., 2]
    return jnp.where(inside, flat, -1)


def recenter(state: MappingState, pose_t: jnp.ndarray, cfg: LioConfig) -> MappingState:
    """Shift the cube origin so the pose stays >= 3 cubes from each edge
    (PointMapping.cc:819-921). Rolls the cube arrays, clearing wrapped cells."""
    m = cfg.mapping
    l, w, h = _grid_dims(cfg)
    dims = jnp.asarray([l, w, h], jnp.int32)
    half = m.cube_size_m / 2.0
    ijk = jnp.floor((pose_t + half) / m.cube_size_m).astype(jnp.int32)

    rel = ijk - state.corner_map.origin
    # number of cells to shift so that 3 <= rel < dims-3
    shift = jnp.maximum(3 - rel, 0) - jnp.maximum(rel - (dims - 4), 0)
    new_origin = state.corner_map.origin - shift

    def roll_map(cm: CubeMap) -> CubeMap:
        x = cm.xyz.reshape(l, w, h, -1, 3)
        msk = cm.mask.reshape(l, w, h, -1)
        # origin decreases by s => data at rel r moves to rel r + s
        x = jnp.roll(x, (shift[0], shift[1], shift[2]), axis=(0, 1, 2))
        msk = jnp.roll(msk, (shift[0], shift[1], shift[2]), axis=(0, 1, 2))
        # invalidate wrapped layers
        for ax, s in [(0, shift[0]), (1, shift[1]), (2, shift[2])]:
            n_ax = msk.shape[ax]
            idx = jnp.arange(n_ax)
            keep = jnp.where(
                s >= 0,
                idx >= s,                 # first s layers are stale
                idx < n_ax + s,           # last |s| layers are stale
            )
            shape = [1, 1, 1, 1]
            shape[ax] = n_ax
            msk = msk & keep.reshape(shape)
        return cm._replace(
            xyz=x.reshape(cm.xyz.shape), mask=msk.reshape(cm.mask.shape),
            origin=new_origin)

    return state._replace(
        corner_map=roll_map(state.corner_map),
        surf_map=roll_map(state.surf_map))


def _neighborhood_cubes(origin: jnp.ndarray, pose_t: jnp.ndarray, cfg: LioConfig):
    """Flat indices of the 5x5x5 cube neighborhood around the pose."""
    m = cfg.mapping
    l, w, h = _grid_dims(cfg)
    half = m.cube_size_m / 2.0
    ijk = jnp.floor((pose_t + half) / m.cube_size_m).astype(jnp.int32)
    center = ijk - origin
    offs = jnp.stack(jnp.meshgrid(
        jnp.arange(-2, 3), jnp.arange(-2, 3), jnp.arange(-2, 3),
        indexing="ij"), axis=-1).reshape(-1, 3)
    rel = center[None, :] + offs
    inside = (
        (rel[:, 0] >= 0) & (rel[:, 0] < l)
        & (rel[:, 1] >= 0) & (rel[:, 1] < w)
        & (rel[:, 2] >= 0) & (rel[:, 2] < h))
    flat = (rel[:, 0] * w + rel[:, 1]) * h + rel[:, 2]
    return jnp.where(inside, flat, 0), inside  # (125,), (125,)


def gather_map_cloud(cm: CubeMap, cube_idx, cube_ok):
    """Valid-neighborhood cubes -> flat (125*C, 3) match database."""
    pts = cm.xyz[cube_idx]          # (125, C, 3)
    msk = cm.mask[cube_idx] & cube_ok[:, None]
    return pts.reshape(-1, 3), msk.reshape(-1)


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
        c_sel = pose.apply(corner_stack)
        c_d, c_idx = KNN.knn(c_sel, corner_stack_mask, corner_db, corner_db_mask, k=5)
        c_ok = c_d[:, 4] < mcfg.min_match_sq_dis
        centroid, direction, line_ok = line_fit(corner_db[c_idx], c_ok)
        ld2, c_n = point_to_line_residual(c_sel, centroid, direction)
        s_c = 1.0 - 0.9 * jnp.abs(ld2)
        w_c = corner_stack_mask & c_ok & line_ok & (s_c > 0.1)
        coeff_c = s_c[:, None] * c_n
        d_c = s_c * ld2

        # ---- surf associations: 5-NN plane fit ----
        s_sel = pose.apply(surf_stack)
        s_d, s_idx = KNN.knn(s_sel, surf_stack_mask, surf_db, surf_db_mask, k=5)
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
        new_gn = GN.degeneracy_projection(ata, mcfg.degeneracy_eigen_th)
        proj = jnp.where(first, new_gn.proj, proj)
        degen = jnp.where(first, new_gn.is_degenerate, degen)
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


def insert_into_map(cm: CubeMap, points, mask, pose: Pose, leaf: float, cfg: LioConfig) -> CubeMap:
    """UpdateMapDatabase (PointMapping.cc:1112-1208): insert world-frame
    points, then re-downsample each affected (neighborhood) cube."""
    m = cfg.mapping
    world = pose.apply(points)
    cube_idx, cube_ok = _neighborhood_cubes(cm.origin, pose.t, cfg)

    flat_idx = _cube_index_of(world, cm.origin, cfg)

    cap = cm.xyz.shape[1]

    def update_cube(ci, ok):
        old_xyz = cm.xyz[ci]
        old_mask = cm.mask[ci] & ok
        belongs = (flat_idx == ci) & mask & ok
        merged = jnp.concatenate([old_xyz, world], axis=0)
        merged_mask = jnp.concatenate([old_mask, belongs], axis=0)
        new_xyz, new_mask, _ = VX.voxel_downsample(merged, merged_mask, leaf, cap)
        return new_xyz, new_mask

    new_xyz, new_mask = jax.vmap(update_cube)(cube_idx, cube_ok)
    out_xyz = cm.xyz.at[cube_idx].set(
        jnp.where(cube_ok[:, None, None], new_xyz, cm.xyz[cube_idx]))
    out_mask = cm.mask.at[cube_idx].set(
        jnp.where(cube_ok[:, None], new_mask, cm.mask[cube_idx]))
    return cm._replace(xyz=out_xyz, mask=out_mask)


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

    st = recenter(state, pose_tobe.t, cfg)

    cube_idx, cube_ok = _neighborhood_cubes(st.corner_map.origin, pose_tobe.t, cfg)
    corner_db, corner_db_mask = gather_map_cloud(st.corner_map, cube_idx, cube_ok)
    surf_db, surf_db_mask = gather_map_cloud(st.surf_map, cube_idx, cube_ok)

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
        st.corner_map, c_xyz, c_mask, pose_opt, m.corner_filter_size, cfg)
    surf_map = insert_into_map(
        st.surf_map, s_xyz, s_mask, pose_opt, m.surf_filter_size, cfg)

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
