"""Scan-to-scan LOAM odometry as a single jitted device program.

Parity target: src/point_processor/PointOdometry.cc:237-683 (``Process``).

Reference behavior reproduced:
* constant-velocity prior: the previous sweep increment seeds the next.
* per-GN-iteration deskew of query features to sweep start (:343, 441).
* correspondences re-searched every 5th iteration (:344, 443):
  - corner -> (closest point, closest point in a different ring within
    +-2.5 rings), both < 25 m^2 (:344-385);
  - surf -> (closest, closest same-ring other point, closest other-ring
    point) (:443-494).
* point-to-line / point-to-plane residuals with distance-damped weights
  ``s = 1 - 1.8 |d| (, / sqrt(range))`` from iteration 5, row kept when
  s > 0.1 (:421-435, :517-531).
* Jacobians ``J_r = w^T [R^-1 (p - t)]_x``, ``J_t = -w^T R^T``, rhs
  ``-0.1 d`` (:548-571); 6x6 normal equations; eigenvalue-10 degeneracy
  projection at iteration 0 (:584-615); right-multiplied DeltaQ update
  (:636); abort when dr < 0.1 deg and dt < 0.1 cm (:642-650).
* pose integration ``T_sum <- T_sum * T_es^-1`` (:654-656) and re-projection
  of the less-sharp/less-flat clouds to sweep end as the next target
  (:660-676). GN only runs with >10 corner / >100 surf targets (:324).

The iteration loop is a ``lax.while_loop``; correspondence indices are
carried between iterations exactly like the reference's idx buffers.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import LioConfig
from ..ops import deskew as DS
from ..ops import gn as GN
from ..ops import knn as KNN
from ..ops.cloud import Cloud
from ..ops.features import SweepFeatures
from ..utils import quaternion as quat
from ..utils.se3 import Pose


class OdometryState(NamedTuple):
    pose: Pose          # transform_sum_: sweep-end pose in world (laser frame)
    q_es: jnp.ndarray   # per-sweep increment estimate (transform_es_)
    t_es: jnp.ndarray
    last_corner: Cloud  # previous less-sharp cloud @ sweep end
    last_surf: Cloud    # previous less-flat cloud @ sweep end
    initialized: jnp.ndarray  # bool


def init_state(cfg: LioConfig, dtype=jnp.float32) -> OdometryState:
    f = cfg.feature
    return OdometryState(
        pose=Pose.identity(dtype=dtype),
        q_es=quat.identity(dtype),
        t_es=jnp.zeros(3, dtype),
        last_corner=Cloud.empty(f.corner_less_sharp_cap, dtype),
        last_surf=Cloud.empty(f.surf_less_flat_cap, dtype),
        initialized=jnp.asarray(False),
    )


def _edge_residual(p0: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray):
    """Point-to-line distance + direction (PointOdometry.cc:401-419).

    Returns (ld2, n) with n the unit gradient of the distance w.r.t. p0.
    """
    a_vec = jnp.cross(p0 - p1, p0 - p2)
    a012 = jnp.linalg.norm(a_vec, axis=-1)
    l12 = jnp.linalg.norm(p1 - p2, axis=-1)
    ld2 = a012 / jnp.maximum(l12, 1e-12)
    n = jnp.cross(p1 - p2, a_vec)
    n = n / jnp.maximum(
        jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return ld2, n


def _plane_residual(p0: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray, p3: jnp.ndarray):
    """Signed point-to-plane distance + normal (PointOdometry.cc:501-515)."""
    n = jnp.cross(p2 - p1, p3 - p1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    d = -jnp.sum(n * p1, axis=-1)
    pd2 = jnp.sum(n * p0, axis=-1) + d
    return pd2, n


def odometry_step(
    state: OdometryState,
    feats: SweepFeatures,
    cfg: LioConfig,
    enable: jnp.ndarray = None,
) -> Tuple[OdometryState, dict]:
    """Process one sweep of features; returns (new_state, outputs).

    ``enable`` mirrors the reference's /enable_odom service
    (PointOdometry.cc:322, Estimator.cc:551-559): once the estimator is
    initialized with IMU deskew, the scan-to-scan GN is switched off and the
    feature clouds pass through RAW (rel_time intact) for the estimator's
    own IMU-predicted deskew.
    """
    oc = cfg.odometry
    scan_period = cfg.sensor.scan_period
    dtype = state.t_es.dtype
    if enable is None:
        enable = jnp.asarray(True)

    corner_q = feats.corner_sharp
    surf_q = feats.surf_flat
    n_corner_q = corner_q.capacity
    n_surf_q = surf_q.capacity

    last_c = state.last_corner
    last_s = state.last_surf

    enough = (last_c.count() > oc.min_corner_points) & (last_s.count() > oc.min_surf_points)

    def deskew_queries(q_es, t_es):
        cq = DS.transform_to_start(corner_q.xyz, corner_q.rel_time, q_es, t_es, scan_period)
        sq = DS.transform_to_start(surf_q.xyz, surf_q.rel_time, q_es, t_es, scan_period)
        return cq, sq

    def associate(cq_xyz, sq_xyz):
        """Find correspondence indices (every-5th-iteration path)."""
        # corner: 1-NN then other-ring NN
        cd1, ci1 = KNN.nearest(cq_xyz, corner_q.mask, last_c.xyz, last_c.mask)
        c_ok1 = cd1 < oc.nearest_sq_dist_th
        c_ring1 = last_c.ring[ci1]
        cd2, ci2 = KNN.ring_constrained_nearest(
            cq_xyz, c_ring1, corner_q.mask & c_ok1, ci1,
            last_c.xyz, last_c.ring, last_c.mask, mode="other",
            ring_window=oc.ring_search_range)
        c_ok2 = c_ok1 & (cd2 < oc.nearest_sq_dist_th)

        # surf: 1-NN, same-ring 2nd, other-ring 3rd
        sd1, si1 = KNN.nearest(sq_xyz, surf_q.mask, last_s.xyz, last_s.mask)
        s_ok1 = sd1 < oc.nearest_sq_dist_th
        s_ring1 = last_s.ring[si1]
        sd2, si2 = KNN.ring_constrained_nearest(
            sq_xyz, s_ring1, surf_q.mask & s_ok1, si1,
            last_s.xyz, last_s.ring, last_s.mask, mode="same",
            ring_window=oc.ring_search_range)
        sd3, si3 = KNN.ring_constrained_nearest(
            sq_xyz, s_ring1, surf_q.mask & s_ok1, si1,
            last_s.xyz, last_s.ring, last_s.mask, mode="other",
            ring_window=oc.ring_search_range)
        s_ok = s_ok1 & (sd2 < oc.nearest_sq_dist_th) & (sd3 < oc.nearest_sq_dist_th)

        return (ci1, ci2, c_ok2, si1, si2, si3, s_ok)

    def build_system(q_es, t_es, corr, iter_count):
        ci1, ci2, c_ok, si1, si2, si3, s_ok = corr
        cq_xyz, sq_xyz = deskew_queries(q_es, t_es)

        # ---- corner rows ----
        ld2, cn = _edge_residual(cq_xyz, last_c.xyz[ci1], last_c.xyz[ci2])
        s_c = jnp.where(iter_count >= oc.weight_start_iter, 1.0 - 1.8 * jnp.abs(ld2), 1.0)
        w_c = (s_c > 0.1) & (ld2 != 0.0) & c_ok & corner_q.mask
        coeff_c = s_c[:, None] * cn
        d_c = s_c * ld2

        # ---- surf rows ----
        pd2, sn = _plane_residual(sq_xyz, last_s.xyz[si1], last_s.xyz[si2], last_s.xyz[si3])
        # NOTE: reference divides by sqrt(range) where range = |point_sel|
        rng = jnp.sqrt(jnp.maximum(jnp.linalg.norm(sq_xyz, axis=-1), 1e-12))
        s_s = jnp.where(
            iter_count >= oc.weight_start_iter,
            1.0 - 1.8 * jnp.abs(pd2) / rng, 1.0)
        w_s = (s_s > 0.1) & (pd2 != 0.0) & s_ok & surf_q.mask
        coeff_s = s_s[:, None] * sn
        d_s = s_s * pd2

        # ---- assemble (original skewed points, like the reference) ----
        p_all = jnp.concatenate([corner_q.xyz, surf_q.xyz], axis=0)
        w_all = jnp.concatenate([coeff_c, coeff_s], axis=0)
        d_all = jnp.concatenate([d_c, d_s], axis=0)
        row_ok = jnp.concatenate([w_c, w_s], axis=0)

        r_inv = quat.conjugate(q_es)
        p_local = quat.rotate(r_inv[None, :], p_all - t_es[None, :])
        j_r = jnp.einsum("ni,nij->nj", w_all, quat.skew(p_local))
        rt = quat.to_matrix(q_es).T
        j_t = -(w_all @ rt.T)  # -w^T R^T
        jac = jnp.concatenate([j_r, j_t], axis=1)
        rhs = -0.1 * d_all
        n_rows = jnp.sum(row_ok.astype(jnp.int32))
        return jac, rhs, row_ok.astype(dtype), n_rows

    # ---------------- GN loop ----------------
    def cond(carry):
        it, done, *_ = carry
        return (it < oc.max_iterations) & (~done)

    def body(carry):
        it, done, q_es, t_es, corr, proj, degen = carry

        cq_xyz, sq_xyz = deskew_queries(q_es, t_es)
        corr = jax.lax.cond(
            it % oc.reassociate_every == 0,
            lambda: associate(cq_xyz, sq_xyz),
            lambda: corr,
        )

        jac, rhs, w, n_rows = build_system(q_es, t_es, corr, it)

        first = it == 0
        jw = jac * w[:, None]
        ata = jw.T @ jac
        atb = jw.T @ rhs
        x = jnp.linalg.solve(ata + 1e-12 * jnp.eye(6, dtype=dtype), atb)

        # 6x6 eigh is an expensive custom call on TPU: run only at iter 0
        proj, degen = jax.lax.cond(
            first,
            lambda a: (lambda g: (g.proj, g.is_degenerate))(
                GN.degeneracy_projection(a, oc.degeneracy_eigen_th)),
            lambda a: (proj, degen),
            ata)
        x = jnp.where(degen, proj @ x, x)
        x = jnp.where(jnp.isfinite(x), x, 0.0)

        skip = n_rows < 10  # reference `continue` (PointOdometry.cc:535)
        x = jnp.where(skip, 0.0, x)

        t_new = t_es + x[3:6]
        q_new = quat.normalize(quat.qmul(q_es, quat.delta_q(x[0:3])))
        t_new = jnp.where(jnp.isfinite(t_new), t_new, 0.0)

        delta_r = jnp.rad2deg(quat.angular_distance(q_es, q_new))
        delta_t = jnp.linalg.norm(x[3:6]) * 100.0
        done = (~skip) & (delta_r < oc.delta_r_abort_deg) & (delta_t < oc.delta_t_abort_cm)

        return (it + 1, done, q_new, t_new, corr, proj, degen)

    corr0 = (
        jnp.zeros(n_corner_q, jnp.int32), jnp.zeros(n_corner_q, jnp.int32),
        jnp.zeros(n_corner_q, bool),
        jnp.zeros(n_surf_q, jnp.int32), jnp.zeros(n_surf_q, jnp.int32),
        jnp.zeros(n_surf_q, jnp.int32), jnp.zeros(n_surf_q, bool),
    )
    carry0 = (
        jnp.asarray(0), jnp.asarray(False), state.q_es, state.t_es, corr0,
        jnp.eye(6, dtype=dtype), jnp.asarray(False),
    )
    _, _, q_es_new, t_es_new, _, _, _ = jax.lax.while_loop(cond, body, carry0)

    run_gn = state.initialized & enough & enable
    q_es_out = jnp.where(run_gn, q_es_new, state.q_es)
    t_es_out = jnp.where(run_gn, t_es_new, state.t_es)

    # pose update: transform_sum_ = transform_sum_ * transform_es_^-1
    t_se = Pose(q_es_out, t_es_out).inverse()
    new_pose = jax.tree.map(
        lambda new, old: jnp.where(run_gn, new, old),
        (state.pose @ t_se).normalized(), state.pose)

    # project current less-sharp / less-flat clouds to sweep end; when the
    # odometry is disabled (post-init LIO mode) clouds pass through raw
    def to_end(c: Cloud) -> Cloud:
        xyz = DS.transform_to_end(c.xyz, c.rel_time, q_es_out, t_es_out, scan_period)
        xyz = jnp.where(run_gn, xyz, c.xyz)
        rel_time = jnp.where(run_gn, jnp.zeros_like(c.rel_time), c.rel_time)
        return c._replace(xyz=xyz, rel_time=rel_time)

    new_state = OdometryState(
        pose=new_pose,
        q_es=q_es_out,
        t_es=t_es_out,
        last_corner=to_end(feats.corner_less_sharp),
        last_surf=to_end(feats.surf_less_flat),
        initialized=jnp.asarray(True),
    )

    outputs = {
        "pose": new_pose,
        "q_es": q_es_out,
        "t_es": t_es_out,
        "corner_cloud": new_state.last_corner,
        "surf_cloud": new_state.last_surf,
    }
    return new_state, outputs
