"""Factor library: residuals + analytic local-frame Jacobians.

The TPU replacement for the reference's Ceres cost functions
(src/factor/, include/factor/). Each factor returns its residual and
Jacobians w.r.t. *local* (minimal) coordinates — 6 per pose [dp, dtheta],
9 per speed-bias — matching the reference's 7->6 PoseLocalParameterization
(PoseLocalParameterization.cc:35-59: p += dp, q = q * DeltaQ(dtheta)).

Parity targets:
* ``imu_factor``              -> include/factor/ImuFactor.h:44-175
* ``pivot_point_plane_factor``-> src/factor/PivotPointPlaneFactor.cc:43-137
* ``prior_factor``            -> src/factor/PriorFactor.cc:35-67
* ``cauchy_scaling``          -> Ceres CauchyLoss(1.0) with the Triggs
                                 correction (MarginalizationFactor.cc:69-95)

Every analytic Jacobian is cross-checked against ``jax.jacfwd`` in
tests/test_factors.py — the reference's ``Check()`` pattern, but exact.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat
from . import preintegration as PI
from .preintegration import O_BA, O_BG, O_P, O_R, O_V, Preintegration


def chol_unrolled(a: jnp.ndarray) -> jnp.ndarray:
    """Unrolled Cholesky-Crout of one small SPD matrix (static n).

    ``jnp.linalg.cholesky`` + ``inv`` on TPU lower to blocked custom-call
    loops that cost ~1 ms for a batch of 7 15x15 matrices — pure latency.
    The unrolled column recurrence is ~n fused vector ops instead.
    """
    n = a.shape[-1]
    dtype = a.dtype
    l = jnp.zeros_like(a)
    rows = jnp.arange(n)
    for j in range(n):
        # v = a[:, j] - sum_{k<j} l[:, k] l[j, k]  (cols >= j of l are 0)
        v = a[:, j] - l @ l[j]
        d = jnp.sqrt(jnp.maximum(v[j], 1e-30))
        col = jnp.where(rows >= j, v / d, jnp.zeros((), dtype))
        l = l.at[:, j].set(col)
    return l


def tri_lower_inverse(l: jnp.ndarray) -> jnp.ndarray:
    """Unrolled forward substitution: inverse of a lower-triangular matrix."""
    n = l.shape[-1]
    w = jnp.zeros_like(l)
    eye = jnp.eye(n, dtype=l.dtype)
    for i in range(n):
        row = (eye[i] - l[i] @ w) / l[i, i]
        w = w.at[i].set(row)
    return w


def sqrt_info_from_covariance(cov: jnp.ndarray) -> jnp.ndarray:
    """Whitening matrix W with W^T W = cov^-1 (ImuFactor.h:74-75).

    The reference uses LLT(cov^-1).matrixL().T; here W = L^-1 with
    L = chol(cov) — whitening is defined up to a left-orthogonal factor,
    so normal equations, residual norms, and all costs are identical,
    while skipping the explicit 15x15 inverse. Both factors come from the
    unrolled kernels above (no TPU custom calls)."""
    l = chol_unrolled(0.5 * (cov + cov.T))
    return tri_lower_inverse(l)


def imu_factor(
    pre: Preintegration,
    g_vec: jnp.ndarray,
    p_i, q_i, v_i, ba_i, bg_i,
    p_j, q_j, v_j, ba_j, bg_j,
    sqrt_info: jnp.ndarray | None = None,
):
    """Whitened IMU residual (15,) + Jacobians.

    Returns (residual (15,), (J_pose_i (15,6), J_sb_i (15,9),
    J_pose_j (15,6), J_sb_j (15,9))).

    ``sqrt_info`` may be precomputed (it depends only on the
    preintegration covariance) — on TPU the 15x15 inverse+Cholesky is an
    expensive custom call, so solvers hoist it out of their iteration loops.
    """
    dtype = p_i.dtype
    res = PI.evaluate(pre, g_vec, p_i, q_i, v_i, ba_i, bg_i, p_j, q_j, v_j, ba_j, bg_j)
    if sqrt_info is None:
        sqrt_info = sqrt_info_from_covariance(pre.covariance)

    sum_dt = pre.sum_dt
    dp_dba = pre.jacobian[O_P:O_P + 3, O_BA:O_BA + 3]
    dp_dbg = pre.jacobian[O_P:O_P + 3, O_BG:O_BG + 3]
    dq_dbg = pre.jacobian[O_R:O_R + 3, O_BG:O_BG + 3]
    dv_dba = pre.jacobian[O_V:O_V + 3, O_BA:O_BA + 3]
    dv_dbg = pre.jacobian[O_V:O_V + 3, O_BG:O_BG + 3]

    qi = quat.normalize(q_i)
    qj = quat.normalize(q_j)
    ri_inv = quat.to_matrix(qi).T
    qi_inv = quat.conjugate(qi)
    qj_inv = quat.conjugate(qj)

    corrected_delta_q = quat.qmul(
        pre.delta_q, quat.delta_q(dq_dbg @ (bg_i - pre.linearized_bg)))

    jp_i = jnp.zeros((15, 6), dtype)
    jp_i = jp_i.at[O_P:O_P + 3, 0:3].set(-ri_inv)
    jp_i = jp_i.at[O_P:O_P + 3, 3:6].set(
        quat.skew(quat.rotate(qi_inv, -0.5 * g_vec * sum_dt * sum_dt + p_j - p_i - v_i * sum_dt)))
    jp_i = jp_i.at[O_R:O_R + 3, 3:6].set(
        -(quat.left_matrix(quat.qmul(qj_inv, qi)) @ quat.right_matrix(corrected_delta_q))[:3, :3])
    jp_i = jp_i.at[O_V:O_V + 3, 3:6].set(
        quat.skew(quat.rotate(qi_inv, -g_vec * sum_dt + v_j - v_i)))

    jsb_i = jnp.zeros((15, 9), dtype)
    jsb_i = jsb_i.at[O_P:O_P + 3, 0:3].set(-ri_inv * sum_dt)
    jsb_i = jsb_i.at[O_P:O_P + 3, 3:6].set(-dp_dba)
    jsb_i = jsb_i.at[O_P:O_P + 3, 6:9].set(-dp_dbg)
    jsb_i = jsb_i.at[O_R:O_R + 3, 6:9].set(
        -quat.left_matrix(quat.qmul(qj_inv, quat.qmul(qi, corrected_delta_q)))[:3, :3] @ dq_dbg)
    jsb_i = jsb_i.at[O_V:O_V + 3, 0:3].set(-ri_inv)
    jsb_i = jsb_i.at[O_V:O_V + 3, 3:6].set(-dv_dba)
    jsb_i = jsb_i.at[O_V:O_V + 3, 6:9].set(-dv_dbg)
    jsb_i = jsb_i.at[O_BA:O_BA + 3, 3:6].set(-jnp.eye(3, dtype=dtype))
    jsb_i = jsb_i.at[O_BG:O_BG + 3, 6:9].set(-jnp.eye(3, dtype=dtype))

    jp_j = jnp.zeros((15, 6), dtype)
    jp_j = jp_j.at[O_P:O_P + 3, 0:3].set(ri_inv)
    jp_j = jp_j.at[O_R:O_R + 3, 3:6].set(
        quat.left_matrix(
            quat.qmul(quat.conjugate(corrected_delta_q), quat.qmul(qi_inv, qj)))[:3, :3])

    jsb_j = jnp.zeros((15, 9), dtype)
    jsb_j = jsb_j.at[O_V:O_V + 3, 0:3].set(ri_inv)
    jsb_j = jsb_j.at[O_BA:O_BA + 3, 3:6].set(jnp.eye(3, dtype=dtype))
    jsb_j = jsb_j.at[O_BG:O_BG + 3, 6:9].set(jnp.eye(3, dtype=dtype))

    res_w = sqrt_info @ res
    return res_w, (sqrt_info @ jp_i, sqrt_info @ jsb_i, sqrt_info @ jp_j, sqrt_info @ jsb_j)


def pivot_point_plane_factor(
    point: jnp.ndarray,
    coeff: jnp.ndarray,
    p_pivot, q_pivot,
    p_i, q_i,
    t_lb, q_lb,
):
    """1-dim pivot-frame point-to-plane residual + Jacobians.

    point: (3,) in frame i's laser coords; coeff: (4,) plane [w, b] in the
    pivot laser frame. Poses are BODY poses; extrinsic (q_lb, t_lb) maps
    laser -> body. Returns (residual (), (J_pivot (6,), J_i (6,), J_ex (6,))).
    """
    q_pivot = quat.normalize(q_pivot)
    q_i = quat.normalize(q_i)
    q_lb = quat.normalize(q_lb)

    q_lp = quat.qmul(q_pivot, quat.conjugate(q_lb))
    p_lp = p_pivot - quat.rotate(q_lp, t_lb)
    q_li = quat.qmul(q_i, quat.conjugate(q_lb))
    p_li = p_i - quat.rotate(q_li, t_lb)

    q_lpi = quat.qmul(quat.conjugate(q_lp), q_li)
    p_lpi = quat.rotate(quat.conjugate(q_lp), p_li - p_lp)

    w = coeff[:3]
    b = coeff[3]
    residual = w @ (quat.rotate(q_lpi, point) + p_lpi) + b

    ri = quat.to_matrix(q_i)
    rp = quat.to_matrix(q_pivot)
    rlb = quat.to_matrix(q_lb)

    # jacobian w.r.t. pivot pose (PivotPointPlaneFactor.cc:81-93)
    j_pivot = jnp.concatenate([
        -w @ (rlb @ rp.T),
        w @ rlb @ (
            quat.skew(rp.T @ ri @ rlb.T @ (point - t_lb))
            + quat.skew(rp.T @ (p_i - p_pivot))),
    ])

    # jacobian w.r.t. frame-i pose (:95-107)
    j_i = jnp.concatenate([
        w @ (rlb @ rp.T),
        w @ rlb @ rp.T @ ri @ (
            -quat.skew(rlb.T @ point) + quat.skew(rlb.T @ t_lb)),
    ])

    # jacobian w.r.t. extrinsic (:109-133)
    eye3 = jnp.eye(3, dtype=point.dtype)
    j_ex = jnp.concatenate([
        w @ (eye3 - rlb @ rp.T @ ri @ rlb.T),
        w @ rlb @ (
            -quat.skew(rp.T @ ri @ rlb.T @ (point - t_lb))
            + rp.T @ ri @ quat.skew(rlb.T @ (point - t_lb))
            - quat.skew(rp.T @ (p_i - p_pivot))),
    ])
    return residual, (j_pivot, j_i, j_ex)


def prior_factor(p, q, pos_prior, rot_prior):
    """6-dim extrinsic prior (PriorFactor.cc:35-67).

    sqrt_info = diag(1000 I3, 0.1 I3); r = [P - pos, 2 vec(rot^-1 * Q)].
    Returns (residual (6,), J (6,6)).
    """
    dtype = p.dtype
    q = quat.normalize(q)
    dq = quat.qmul(quat.conjugate(rot_prior), q)
    res = jnp.concatenate([p - pos_prior, 2.0 * dq[1:4]])
    sqrt_info = jnp.diag(jnp.asarray([1000.0] * 3 + [0.1] * 3, dtype=dtype))

    # NOTE: exact derivative d[2 vec(rot^-1 q [1, dtheta/2])]/d dtheta
    # = L(rot^-1 q)[:3,:3]; the reference's L(Q^-1 rot) flips the skew part
    # (PriorFactor.cc:59) — harmless near convergence, exact here.
    jac = jnp.eye(6, dtype=dtype)
    jac = jac.at[3:6, 3:6].set(quat.left_matrix(dq)[:3, :3])
    return sqrt_info @ res, sqrt_info @ jac


def point_distance_factor(point, coeff, p_i, q_i, t_lb, q_lb, sqrt_info: float = 100.0):
    """1-dim world-frame point-to-plane residual + Jacobians.

    Parity: src/factor/PointDistanceFactor.cc:35-105. ``point`` (3,) in the
    frame-i laser coords; ``coeff`` (4,) world-frame plane [w, b]; fixed
    sqrt_info = 100. Returns (residual (), (J_pose (6,), J_ex (6,))).
    """
    q_i = quat.normalize(q_i)
    q_lb = quat.normalize(q_lb)
    q_li = quat.qmul(q_i, quat.conjugate(q_lb))
    p_li = p_i - quat.rotate(q_li, t_lb)

    w = coeff[:3]
    b = coeff[3]
    residual = w @ (quat.rotate(q_li, point) + p_li) + b

    ri = quat.to_matrix(q_i)
    rlb = quat.to_matrix(q_lb)
    skew_pt = quat.skew(rlb.T @ point) - quat.skew(rlb.T @ t_lb)
    j_pose = jnp.concatenate([w, -w @ ri @ skew_pt])
    j_ex = jnp.concatenate([-w @ (ri @ rlb.T), w @ ri @ skew_pt])
    return sqrt_info * residual, (sqrt_info * j_pose, sqrt_info * j_ex)


def plane_projection_factor(coeff_i, coeff_j, score, p_i, q_i, p_j, q_j, t_lb, q_lb):
    """4-dim plane-transport residual + Jacobians.

    Parity: src/factor/PlaneProjectionFactor.cc:35-148. A plane fitted in
    frame i's laser coords, transported into frame j via
    ``(T_li^-1 T_lj)^T coeff_i`` (sign-normalized to b >= 0), should match
    the plane fitted in frame j. Returns
    (residual (4,), (J_i (4,6), J_j (4,6), J_ex (4,6))).
    """
    q_i = quat.normalize(q_i)
    q_j = quat.normalize(q_j)
    q_lb = quat.normalize(q_lb)
    ri = quat.to_matrix(q_i)
    rj = quat.to_matrix(q_j)
    rlb = quat.to_matrix(q_lb)

    w_i = coeff_i[:3]
    b_i = coeff_i[3]
    # transported plane: w part R_lj^T R_li w_i, offset part
    # (P_j - P_i - (R_j - R_i) rlb^T t_lb)^T R_i rlb^T w_i + b_i
    v = p_j - p_i - (rj - ri) @ (rlb.T @ t_lb)
    pi_w = rlb @ rj.T @ ri @ rlb.T @ w_i
    pi_b = v @ (ri @ (rlb.T @ w_i)) + b_i

    sign = jnp.where(pi_b < 0, -1.0, 1.0)
    residual = score * (sign * jnp.concatenate([pi_w, pi_b[None]]) - coeff_j)

    a = rlb.T @ w_i
    vv = p_j - p_i - rj @ (rlb.T @ t_lb)  # the R_i-dependent part of pi_b only
    j_i = jnp.zeros((4, 6), p_i.dtype)
    j_i = j_i.at[3, 0:3].set(-w_i @ rlb @ ri.T)
    j_i = j_i.at[0:3, 3:6].set(-rlb @ rj.T @ ri @ quat.skew(a))
    j_i = j_i.at[3, 3:6].set(w_i @ rlb @ quat.skew(ri.T @ vv))

    # NOTE: the reference's jaco_j bottom-left uses Rj^T
    # (PlaneProjectionFactor.cc:117) where the exact derivative of
    # v.(R_i rlb^T w_i) w.r.t. P_j is w_i^T rlb R_i^T; this factor is off
    # in all shipped configs, so its Check() never surfaced it. Exact here.
    j_j = jnp.zeros((4, 6), p_i.dtype)
    j_j = j_j.at[3, 0:3].set(w_i @ rlb @ ri.T)
    j_j = j_j.at[0:3, 3:6].set(rlb @ quat.skew(rj.T @ ri @ a))
    j_j = j_j.at[3, 3:6].set(w_i @ rlb @ ri.T @ rj @ quat.skew(rlb.T @ t_lb))

    j_ex = jnp.zeros((4, 6), p_i.dtype)
    j_ex = j_ex.at[3, 0:3].set(-w_i @ rlb @ ri.T @ (rj - ri) @ rlb.T)
    j_ex = j_ex.at[0:3, 3:6].set(
        rlb @ rj.T @ ri @ quat.skew(a) - rlb @ quat.skew(rj.T @ ri @ a))
    j_ex = j_ex.at[3, 3:6].set(
        -w_i @ rlb @ ri.T @ (rj - ri) @ quat.skew(rlb.T @ t_lb)
        - w_i @ rlb @ quat.skew(ri.T @ v))
    s = score * sign
    return residual, (s * j_i, s * j_j, s * j_ex)


def point_normal_covariance(normal, gicp_epsilon: float = 0.001):
    """GICP covariance diag(eps, 1, 1) rotated so x aligns with the normal.

    Parity: FeatureManager.h:49-82 + FeatureManager.cc:35-43
    (``PointNormalFeature::UpdateCovariance`` via FromTwoVectors(e1, n)).
    """
    dtype = normal.dtype
    n = normal / jnp.linalg.norm(normal)
    e1 = jnp.asarray([1.0, 0.0, 0.0], dtype)
    # rotation taking e1 to n (any roll about n is fine: C is symmetric
    # about the normal axis, diag(eps, 1, 1) with equal tangent entries)
    v = jnp.cross(e1, n)
    c = e1 @ n
    vx = quat.skew(v)
    # Rodrigues with the degenerate antiparallel case regularized
    r = jnp.eye(3, dtype=dtype) + vx + vx @ vx / jnp.maximum(1.0 + c, 1e-8)
    diag = jnp.diag(jnp.asarray([gicp_epsilon, 1.0, 1.0], dtype))
    return r @ diag @ r.T


def plane_to_plane_factor(
    p_b_local, cov_b, p_a_local, cov_a,
    p_i, q_i, p_j, q_j, t_lb, q_lb,
):
    """3-dim GICP plane-to-plane residual with Mahalanobis whitening.

    Parity: src/factor/PlaneToPlaneFactor.cc:43-105. Matched points with
    per-point normal covariances (``point_normal_covariance``): point b in
    frame i's laser coords, point a in frame j's; residual is the frame-i
    registration error whitened by chol((R C_a R^T + C_b)^-1)^T. The
    whitening is treated as locally constant (Gauss-Newton), as in the
    reference. Returns (residual (3,), (J_i (3,6), J_j (3,6), J_ex (3,6))).
    """
    q_i = quat.normalize(q_i)
    q_j = quat.normalize(q_j)
    q_lb = quat.normalize(q_lb)
    ri = quat.to_matrix(q_i)
    rj = quat.to_matrix(q_j)
    rlb = quat.to_matrix(q_lb)

    r_li = ri @ rlb.T
    p_li = p_i - r_li @ t_lb
    r_lj = rj @ rlb.T
    p_lj = p_j - r_lj @ t_lb

    r_ba = r_li.T @ r_lj
    t_ba = r_li.T @ (p_lj - p_li)
    err = r_ba @ p_a_local + t_ba - p_b_local

    m = jnp.linalg.inv(r_ba @ cov_a @ r_ba.T + cov_b)
    m = 0.5 * (m + m.T)
    sqrt_info = jax.lax.stop_gradient(jnp.linalg.cholesky(m).T)

    y = r_lj @ p_a_local + p_lj            # the matched point in world
    u = ri.T @ (y - p_i)
    j_i = jnp.concatenate([
        -rlb @ ri.T,
        rlb @ quat.skew(u),
    ], axis=1)
    j_j = jnp.concatenate([
        rlb @ ri.T,
        -rlb @ ri.T @ rj @ quat.skew(rlb.T @ (p_a_local - t_lb)),
    ], axis=1)
    j_ex = jnp.concatenate([
        jnp.eye(3, dtype=p_i.dtype) - rlb @ ri.T @ rj @ rlb.T,
        -rlb @ quat.skew(u) + rlb @ ri.T @ rj @ quat.skew(rlb.T @ (p_a_local - t_lb)),
    ], axis=1)
    return sqrt_info @ err, (sqrt_info @ j_i, sqrt_info @ j_j, sqrt_info @ j_ex)


def imu_gravity_factor(
    pre: Preintegration,
    q_g: jnp.ndarray,
    g_norm: float,
    p_i, q_i, v_i, ba_i, bg_i,
    p_j, q_j, v_j, ba_j, bg_j,
    sqrt_info: jnp.ndarray | None = None,
):
    """ImuFactor variant with gravity as an S^2 quaternion parameter.

    Parity: include/factor/ImuGravityFactor.h:44-232 (the reference keeps
    it as an unwired alternative) — world gravity ``g = R(q_g) @ GI`` with
    ``GI = (0, 0, -g_norm)``; the residual is the standard 15-dim IMU
    residual, and the extra Jacobian is w.r.t. the 2-dim tangent of
    :func:`gravity_boxplus` (right-multiplied ``DeltaQ([dx, dy, 0])``).

    Returns (residual (15,), (J_pose_i, J_sb_i, J_pose_j, J_sb_j,
    J_gravity (15, 2))).
    """
    dtype = p_i.dtype
    g_i = jnp.asarray([0.0, 0.0, -g_norm], dtype)
    q_g = quat.normalize(q_g)
    g_vec = quat.rotate(q_g, g_i)
    if sqrt_info is None:
        sqrt_info = sqrt_info_from_covariance(pre.covariance)
    res_w, (jp_i, jsb_i, jp_j, jsb_j) = imu_factor(
        pre, g_vec, p_i, q_i, v_i, ba_i, bg_i, p_j, q_j, v_j, ba_j, bg_j,
        sqrt_info)

    # d g(u) / du for q_g <- q_g * DeltaQ([u; 0]):
    #   g(u) = Rwi (I + [u]x) GI  =>  dg/du = -Rwi [GI]x (first two cols)
    sum_dt = pre.sum_dt
    ri_inv = quat.to_matrix(quat.normalize(q_i)).T
    rwi = quat.to_matrix(q_g)
    dg_du = -(rwi @ quat.skew(g_i))[:, :2]
    j_g = jnp.zeros((15, 2), dtype)
    # our evaluate uses residual_p = Ri^T (-0.5 g dt^2 + ...) and
    # residual_v = Ri^T (-g dt + ...) (see imu_factor's jp_i blocks), hence
    # the leading minus vs ImuGravityFactor.h:220-229
    j_g = j_g.at[O_P:O_P + 3, :].set(-0.5 * sum_dt * sum_dt * ri_inv @ dg_du)
    j_g = j_g.at[O_V:O_V + 3, :].set(-sum_dt * ri_inv @ dg_du)
    return res_w, (jp_i, jsb_i, jp_j, jsb_j, sqrt_info @ j_g)


def gravity_boxplus(q_g, delta_xy):
    """S^2 retraction for a gravity-direction quaternion.

    Parity: src/factor/GravityLocalParameterization.cc:35-50 — 4 global /
    2 local: q <- q * DeltaQ([dx, dy, 0]).
    """
    d = jnp.concatenate([delta_xy, jnp.zeros(1, delta_xy.dtype)])
    return quat.normalize(quat.qmul(q_g, quat.delta_q(d)))


def cauchy_scaling(sq_norm: jnp.ndarray, scale: float = 1.0):
    """Ceres CauchyLoss + Triggs correction factors.

    rho(s) = c^2 log(1 + s/c^2). Returns (residual_scale, jac_scale_1d)
    where for 1-dim residuals the corrected Jacobian is simply
    ``sqrt_rho1 * (1 - alpha) * J`` (MarginalizationFactor.cc:69-95
    specialized to scalar residuals).
    """
    c2 = scale * scale
    rho1 = 1.0 / (1.0 + sq_norm / c2)
    sqrt_rho1 = jnp.sqrt(rho1)
    # Ceres' Corrector only applies the alpha correction when rho'' > 0;
    # Cauchy is concave (rho'' < 0 everywhere), so the correction never
    # fires and both scalings reduce to sqrt(rho') — exactly the
    # (sq_norm == 0 || rho[2] <= 0) branch of MarginalizationFactor.cc:80-82.
    return sqrt_rho1, sqrt_rho1
