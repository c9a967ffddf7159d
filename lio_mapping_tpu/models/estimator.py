"""Tightly-coupled sliding-window LIO estimator.

Parity target: src/imu_processor/Estimator.cc (the heart of the reference,
SURVEY §2 #7). One call to ``lio_step`` performs, inside a single jitted XLA
program, what the reference spreads over threads + Ceres:

1.  IMU-rate world-state propagation (ProcessImu, Estimator.cc:338-427) as a
    ``lax.scan`` over the frame's IMU samples.
2.  Preintegration of the frame interval (IntegrationBase) — same scan.
3.  IMU-predicted de-skew of the new sweep's features to sweep end
    (Estimator.cc:628-698) + voxel re-downsampling into the frame stack.
4.  Window push (CircularBuffers -> rolled fixed arrays).
5.  BuildLocalMap (Estimator.cc:1361-1646): all window stacks except the
    newest transformed into the pivot laser frame, voxel-filtered; batched
    5-NN plane fits produce PointPlaneFeatures per post-pivot frame
    (CalculateFeatures, :970-1097); the newest frame is aligned by a mini GN
    against the local map (CalculateLaserOdom, :1242-1359).
6.  Convergence gating (:1923-1984) and the batched LM solve
    (ops/solver.solve_window) over [pivot..window] poses + speed-biases +
    extrinsic with marginalization prior, IMU and plane factors.
7.  Yaw-gauge fixing (DoubleToVector, :2479-2568).
8.  Schur marginalization of the pivot (:2040-2275).
9.  Slide (implicit: the next push drops the oldest frame).

Documented deviations from the reference:
* Degeneracy projection removes true eigen-directions (see ops/gn.py).
* The newest-frame mini-GN budget (``newest_refine_iters``) defaults below
  the reference's 10 iterations; early abort matches (0.05deg/0.05cm).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..config import LioConfig
from ..ops import deskew as DS
from ..ops import factors as FA
from ..ops import gn as GN
from ..ops import knn as KNN
from ..ops import marginalization as MG
from ..ops import preintegration as PI
from ..ops import solver as SV
from ..ops import voxel as VX
from ..ops.cloud import Cloud, compact_cloud
from ..ops.fits import line_fit, plane_fit, point_to_line_residual
from ..utils import quaternion as quat
from ..utils.se3 import Pose


class EstimatorState(NamedTuple):
    """Sliding-window state; leading dim W1 = window_size + 1."""

    qs: jnp.ndarray      # (W1, 4) body orientation in world
    ps: jnp.ndarray      # (W1, 3)
    vs: jnp.ndarray      # (W1, 3)
    bas: jnp.ndarray     # (W1, 3)
    bgs: jnp.ndarray     # (W1, 3)
    pres: PI.Preintegration  # batched (W1,), pres[i] spans (i-1, i]
    imu: PI.ImuSamples       # batched (W1, M) raw buffers (for repropagation)
    surf_xyz: jnp.ndarray    # (W1, C, 3) deskewed stacks, own laser frame
    surf_mask: jnp.ndarray   # (W1, C)
    corner_xyz: jnp.ndarray  # (W1, Cc, 3) corner stacks (Cc=1 unless use_corner)
    corner_mask: jnp.ndarray # (W1, Cc)
    # frozen linearization poses for the FIX_MAP variant (Estimator.h:205;
    # mirrors Ps_linearized_/Rs_linearized_). Kept in sync with qs/ps when
    # fix_map is off.
    qs_lin: jnp.ndarray      # (W1, 4)
    ps_lin: jnp.ndarray      # (W1, 3)
    prior: MG.PriorState
    g_vec: jnp.ndarray   # (3,)
    q_lb: jnp.ndarray    # (4,) laser->body extrinsic
    t_lb: jnp.ndarray    # (3,)
    convergence_flag: jnp.ndarray  # bool
    extrinsic_enabled: jnp.ndarray  # bool (extrinsic_stage != 0 && opt_extrinsic)


def init_state(cfg: LioConfig, dtype=jnp.float32) -> EstimatorState:
    e = cfg.estimator
    w1 = e.window_size + 1
    m = e.imu.max_imu_per_frame
    c = e.surf_stack_cap
    q_lb, t_lb = cfg.extrinsic_lb()
    eye_q = jnp.tile(quat.identity(dtype), (w1, 1))
    return EstimatorState(
        qs=eye_q,
        ps=jnp.zeros((w1, 3), dtype),
        vs=jnp.zeros((w1, 3), dtype),
        bas=jnp.zeros((w1, 3), dtype),
        bgs=jnp.zeros((w1, 3), dtype),
        pres=jax.tree.map(
            lambda a: jnp.broadcast_to(a, (w1,) + a.shape).astype(dtype),
            PI.Preintegration.identity(dtype)),
        imu=jax.tree.map(
            lambda a: jnp.broadcast_to(a, (w1,) + a.shape).astype(dtype),
            PI.ImuSamples.empty(m, dtype)),
        surf_xyz=jnp.zeros((w1, c, 3), dtype),
        surf_mask=jnp.zeros((w1, c), bool),
        corner_xyz=jnp.zeros((w1, e.corner_state_cap, 3), dtype),
        corner_mask=jnp.zeros((w1, e.corner_state_cap), bool),
        qs_lin=eye_q,
        ps_lin=jnp.zeros((w1, 3), dtype),
        prior=MG.PriorState.empty(e.opt_window_size, dtype),
        g_vec=jnp.asarray([0.0, 0.0, -e.imu.g_norm], dtype),
        q_lb=q_lb.astype(dtype),
        t_lb=t_lb.astype(dtype),
        convergence_flag=jnp.asarray(False),
        extrinsic_enabled=jnp.asarray(e.opt_extrinsic and e.estimate_extrinsic != 0),
    )


# ---------------------------------------------------------------------------
# IMU-rate propagation (ProcessImu)
# ---------------------------------------------------------------------------


def propagate_world(q0, p0, v0, ba, bg, g_vec, samples: PI.ImuSamples):
    """Midpoint world-state propagation over one frame's samples
    (Estimator.cc:387-394)."""

    def step(carry, inp):
        q, p, v, acc_prev, gyr_prev = carry
        dt, acc, gyr = inp
        un_acc_0 = quat.rotate(q, acc_prev - ba) + g_vec
        un_gyr = 0.5 * (gyr_prev + gyr) - bg
        q_new = quat.normalize(quat.qmul(q, quat.delta_q(un_gyr * dt)))
        un_acc_1 = quat.rotate(q_new, acc - ba) + g_vec
        un_acc = 0.5 * (un_acc_0 + un_acc_1)
        p_new = p + dt * v + 0.5 * dt * dt * un_acc
        v_new = v + dt * un_acc
        is_pad = dt == 0
        acc_next = jnp.where(is_pad, acc_prev, acc)
        gyr_next = jnp.where(is_pad, gyr_prev, gyr)
        return (q_new, p_new, v_new, acc_next, gyr_next), None

    (q, p, v, _, _), _ = jax.lax.scan(
        step, (q0, p0, v0, samples.acc0, samples.gyr0),
        (samples.dt, samples.acc, samples.gyr))
    return q, p, v


# ---------------------------------------------------------------------------
# Local map + feature association (BuildLocalMap / CalculateFeatures)
# ---------------------------------------------------------------------------


def laser_pose(q_b, p_b, q_lb, t_lb) -> Pose:
    """Body pose -> laser pose: R_li = R_bi R_lb^-1, p_li = p_bi - R_li t_lb
    (Estimator.cc:1391-1394)."""
    q_l = quat.qmul(q_b, quat.conjugate(q_lb))
    p_l = p_b - quat.rotate(q_l, t_lb)
    return Pose(q_l, p_l)


def _fov_ok(point_sel, local_q, local_t):
    """±60° FOV cone check in the pivot frame (Estimator.cc:1063-1086)."""
    z_axis = quat.rotate(local_q, jnp.asarray([0.0, 0.0, 10.0], point_sel.dtype)) + local_t
    sq1 = jnp.sum((point_sel - local_t[None, :]) ** 2, axis=-1)
    sq2 = jnp.sum((point_sel - z_axis[None, :]) ** 2, axis=-1)
    check1 = 100.0 + sq1 - sq2 - 10.0 * jnp.sqrt(3.0) * jnp.sqrt(sq1)
    check2 = 100.0 + sq1 - sq2 + 10.0 * jnp.sqrt(3.0) * jnp.sqrt(sq1)
    return (check1 < 0) & (check2 > 0)


def make_knn5(map_xyz, map_mask, cfg: LioConfig, axis=None,
              force_tiled: bool = False):
    """5-NN closure over a local map: (point_sel, sel_mask) ->
    (sq_d (N,5), neighbors (N,5,3)).

    ``axis``: when set, ``map_xyz`` is this device's BLOCK of a map sharded
    over the mesh axis and the search runs the ppermute ring
    (parallel/map_sharded.ring_knn) — neighbors carry coordinates so the
    downstream fits stay device-local. Otherwise a plain replicated-map
    tiled search.

    ``force_tiled``: bypass the Pallas kernel for this map (the CORNER
    association uses it: fused into the full estimator program, the
    Pallas search's f32 rounding differs slightly from the tiled path and
    the corner closed loop lands in a 8x-worse trajectory basin on real
    TPU — measured 1.57 vs 0.19 m ATE; the corner map is small (<=4096
    rows), so the tiled path costs ~nothing there. The big surf search
    stays on the Pallas kernel).
    """
    e = cfg.estimator

    if axis is None:
        def knn5(point_sel, sel_mask):
            sq_d, idx = KNN.knn(point_sel, sel_mask, map_xyz, map_mask, k=5,
                                prune_beyond=e.min_match_sq_dis,
                                force_tiled=force_tiled)
            return sq_d, map_xyz[idx]
    else:
        from ..parallel.map_sharded import ring_knn

        def knn5(point_sel, sel_mask):
            sq_d, _, neighbors = ring_knn(
                point_sel, sel_mask, map_xyz, map_mask, k=5, axis=axis,
                prune_beyond=e.min_match_sq_dis)
            return sq_d, neighbors
    return knn5


def _surf_rows(knn5, point_sel, sel_mask, in_fov, cfg: LioConfig):
    """Row-wise 5-NN plane association core (Estimator.cc:1014-1097) over
    pre-transformed pivot-frame queries of any leading length."""
    e = cfg.estimator
    sq_d, neighbors = knn5(point_sel, sel_mask)
    nn_ok = sq_d[:, 4] < e.min_match_sq_dis

    w, d, plane_ok = plane_fit(neighbors, nn_ok, e.min_plane_dis)

    pd2 = jnp.sum(w * point_sel, axis=-1) + d
    rng = jnp.sqrt(jnp.maximum(jnp.linalg.norm(point_sel, axis=-1), 1e-12))
    s = 1.0 - 0.9 * jnp.abs(pd2) / rng

    ok = sel_mask & nn_ok & plane_ok & (s > 0.1) & in_fov
    coeff = jnp.concatenate([s[:, None] * w, (s * d)[:, None]], axis=-1)
    return coeff, s, ok


def _calculate_features(
    knn5,                       # local-map 5-NN closure (make_knn5)
    stack_xyz, stack_mask,      # frame stack (own laser frame)
    local_q, local_t,           # T_pivot_i (frame -> pivot)
    cfg: LioConfig,
):
    """Batched 5-NN plane association (Estimator.cc:1014-1097).

    Returns (coeff (C,4), score (C,), ok (C,)): plane [s*w, s*d] in the
    pivot frame per stack point, reference scoring s = 1 - 0.9|pd2|/sqrt(r).
    """
    point_sel = quat.rotate(local_q[None, :], stack_xyz) + local_t[None, :]
    in_fov = _fov_ok(point_sel, local_q, local_t)
    return _surf_rows(knn5, point_sel, stack_mask, in_fov, cfg)


def _corner_rows(knn5, point_sel, sel_mask, in_fov, cfg: LioConfig):
    """Row-wise corner association core (Estimator.cc:1099-1232): 5-NN line
    fit (accept when l_max > 3 l_mid), then the point-to-line constraint is
    decomposed into TWO half-weighted plane-style features: one along the
    normal to the line through the point (carries the distance residual),
    one along ``(X1-X2) x normal`` (un-normalized, |.| = 0.2 — kept exactly
    as the reference) which pins the point's projection onto the line's
    second perpendicular direction.

    Returns (coeff1 (N,4), coeff2 (N,4), s (N,), ok (N,)).
    """
    e = cfg.estimator
    sq_d, neighbors = knn5(point_sel, sel_mask)
    nn_ok = sq_d[:, 4] < e.min_match_sq_dis

    centroid, direction, line_ok = line_fit(neighbors, nn_ok)
    ld2, n = point_to_line_residual(point_sel, centroid, direction)
    # (X1 - X2) x normal_to_point with X1/2 = c ± 0.1 u (Estimator.cc:1160)
    ncp = jnp.cross(0.2 * direction, n)

    point_proj = point_sel - n * ld2[:, None]
    ld_p1 = -jnp.sum(n * point_proj, axis=-1)
    ld_p2 = -jnp.sum(ncp * point_proj, axis=-1)

    s = 1.0 - 0.9 * jnp.abs(ld2)
    ok = sel_mask & nn_ok & line_ok & (s > 0.1) & in_fov

    # score and coeffs carry an extra 0.5 (Estimator.cc:1216-1228)
    coeff1 = 0.5 * jnp.concatenate([s[:, None] * n, (s * ld_p1)[:, None]], axis=-1)
    coeff2 = 0.5 * jnp.concatenate([s[:, None] * ncp, (s * ld_p2)[:, None]], axis=-1)
    return coeff1, coeff2, s, ok


def _calculate_corner_features(
    knn5, stack_xyz, stack_mask, local_q, local_t, cfg: LioConfig,
):
    """Corner association for one frame (see _corner_rows)."""
    point_sel = quat.rotate(local_q[None, :], stack_xyz) + local_t[None, :]
    in_fov = _fov_ok(point_sel, local_q, local_t)
    return _corner_rows(knn5, point_sel, stack_mask, in_fov, cfg)


def _associate_frame(assoc, stacks, local_q, local_t, cfg: LioConfig):
    """All feature rows for one frame against the local map(s).

    ``assoc`` = (surf_knn5[, corner_knn5]) closures from :func:`make_knn5`;
    ``stacks`` = (surf_xyz, surf_mask[, corner_xyz, corner_mask]) for the
    frame's own stacks. Returns (points (F,3), coeff (F,4), ok (F,)) with
    F = C_surf (+ 2*C_corner): corner points contribute two rows each
    (Estimator.cc:1216-1228), and the factor form downstream is identical
    for all rows.
    """
    coeff_s, _, ok_s = _calculate_features(
        assoc[0], stacks[0], stacks[1], local_q, local_t, cfg)
    if not cfg.estimator.use_corner:
        return stacks[0], coeff_s, ok_s
    c1, c2, _, ok_c = _calculate_corner_features(
        assoc[1], stacks[2], stacks[3], local_q, local_t, cfg)
    pts = jnp.concatenate([stacks[0], stacks[2], stacks[2]], axis=0)
    coeff = jnp.concatenate([coeff_s, c1, c2], axis=0)
    ok = jnp.concatenate([ok_s, ok_c, ok_c], axis=0)
    return pts, coeff, ok




def _calculate_laser_odom(assoc, stacks, local_q, local_t, cfg: LioConfig,
                          n_iters: int = 10, axis: str = None):
    """Mini scan-to-local-map GN for the newest frame
    (CalculateLaserOdom, Estimator.cc:1242-1359). Runs when the IMU factor
    is ON (Estimator.cc:1561: ``idx != window_size || !imu_factor`` routes
    the newest frame here in that case); with it off the newest frame gets
    a plain CalculateFeatures association like the others.

    ``n_iters``: GN budget (the reference's PointMapping
    ``num_max_iterations_`` = 10; ``newest_refine_iters`` exposes it).

    ``keep_features`` (Estimator.cc:978, indoor profile): each iteration's
    CalculateFeatures rows ACCUMULATE — iteration k's GN solves over the
    union of rounds 0..k, and the union feeds the window solver. With it
    off, only the last executed round's rows survive (features.clear()).

    Returns (lq, lt, pts, coeff_acc (n_iters, F, 4), ok_acc (n_iters, F),
    n_exec): per-round association rows (rounds never executed due to the
    early abort stay masked) and the executed-round count. The caller
    selects row set n_exec-1 as the newest frame's features and, when
    keep_features, the earlier rounds as extra factor rows.

    ``axis``: set when running under shard_map with the stack rows sharded
    over the mesh — the 6x6 normal equations psum-reduce so every device
    walks the identical GN path.
    """
    e = cfg.estimator
    dtype = local_t.dtype
    n_rows = stacks[0].shape[0] + (2 * stacks[2].shape[0] if e.use_corner else 0)

    def body(carry):
        it, done, lq, lt, proj, degen, coeff_acc, ok_acc = carry
        pts, coeff, ok = _associate_frame(assoc, stacks, lq, lt, cfg)
        coeff_acc = jax.lax.dynamic_update_index_in_dim(coeff_acc, coeff, it, 0)
        ok_acc = jax.lax.dynamic_update_index_in_dim(ok_acc, ok, it, 0)

        if e.keep_features:
            # GN over the union of all accumulated rounds (rows of rounds
            # > it are still all-masked)
            w = coeff_acc[..., :3].reshape(-1, 3)
            b = coeff_acc[..., 3].reshape(-1)
            wrow = ok_acc.reshape(-1).astype(dtype)
            pts_gn = jnp.tile(pts, (n_iters, 1))
        else:
            w = coeff[:, :3]
            b = coeff[:, 3]
            wrow = ok.astype(dtype)
            pts_gn = pts

        rot = quat.to_matrix(lq)
        # J_r = -w^T (R [p]_x), J_t = w^T (Estimator.cc:1289-1290)
        j_r = -jnp.einsum("ni,nij->nj", w, rot @ quat.skew(pts_gn))
        j_t = w
        jac = jnp.concatenate([j_r, j_t], axis=1)
        d2 = jnp.sum(w * (quat.rotate(lq[None, :], pts_gn) + lt[None, :]), axis=-1) + b
        rhs = -d2

        jw = jac * wrow[:, None]
        ata = jw.T @ jac
        atb = jw.T @ rhs
        if axis is not None:
            ata = jax.lax.psum(ata, axis)
            atb = jax.lax.psum(atb, axis)
        x = jnp.linalg.solve(ata + 1e-9 * jnp.eye(6, dtype=dtype), atb)

        first = it == 0
        # the 6x6 eigh is an expensive custom call on TPU: only run it on
        # the first iteration (reference computes the projector once too)
        proj, degen = jax.lax.cond(
            first,
            lambda a: (lambda g: (g.proj, g.is_degenerate))(
                GN.degeneracy_projection(a, 100.0)),
            lambda a: (proj, degen),
            ata)
        x = jnp.where(degen, proj @ x, x)
        x = jnp.where(jnp.isfinite(x), x, 0.0)

        lt_new = lt + x[3:6]
        lq_new = quat.normalize(quat.qmul(lq, quat.delta_q(x[0:3])))
        delta_r = jnp.rad2deg(quat.angular_distance(lq, lq_new))
        delta_t = jnp.linalg.norm(x[3:6]) * 100.0
        done = (delta_r < 0.05) & (delta_t < 0.05)
        return (it + 1, done, lq_new, lt_new, proj, degen, coeff_acc, ok_acc)

    def cond(carry):
        it, done, *_ = carry
        return (it < n_iters) & (~done)

    carry = (jnp.asarray(0), jnp.asarray(False), local_q, local_t,
             jnp.eye(6, dtype=dtype), jnp.asarray(False),
             jnp.zeros((n_iters, n_rows, 4), dtype),
             jnp.zeros((n_iters, n_rows), bool))
    n_exec, _, lq, lt, _, _, coeff_acc, ok_acc = jax.lax.while_loop(
        cond, body, carry)
    return lq, lt, _stack_points(stacks, cfg), coeff_acc, ok_acc, n_exec


def _stack_points(stacks, cfg: LioConfig):
    """The point rows matching one _associate_frame round's layout."""
    if not cfg.estimator.use_corner:
        return stacks[0]
    return jnp.concatenate([stacks[0], stacks[2], stacks[2]], axis=0)


# ---------------------------------------------------------------------------
# The per-sweep LIO step
# ---------------------------------------------------------------------------

# Profiling hook (tools/profile_step.py): set to one of
# {"window", "map", "assoc", "gates", "solve"} and re-jit
# ``lio_step.__wrapped__`` to time a DCE-truncated prefix of the step —
# XLA dead-code-eliminates everything after the early return, giving an
# exact cumulative stage waterfall on real inputs. None in production.
_TRUNCATE_STAGE = None


def lio_step_impl(
    state: EstimatorState,
    surf_cloud: Cloud,          # new sweep's less-flat features (laser frame, skewed)
    samples: PI.ImuSamples,     # IMU over (t_{k-1}, t_k]
    cfg: LioConfig,
    corner_cloud: Cloud = None,  # less-sharp corners (required iff use_corner)
    axis: str = None,            # mesh axis name when running under shard_map
    map_shard: bool = False,     # shard the local map too (ring-KNN association)
) -> Tuple[EstimatorState, dict]:
    """The full per-sweep estimator step (see module docstring).

    ``axis``: when set, this body is the device-local program of the
    DISTRIBUTED step (parallel/lio_dist.py): inputs arrive replicated,
    feature association splits each frame's stack rows across the mesh
    (rank-sliced), the window LM and pivot marginalization psum-reduce
    their normal equations, and all state updates come out replicated —
    the trajectory equals the single-device step up to f32 summation
    order. With ``map_shard`` the local map is ALSO rank-sliced and
    association runs the ppermute ring (parallel/map_sharded.ring_knn).
    """
    e = cfg.estimator
    s_opt = e.opt_window_size
    w = e.window_size
    pivot = e.pivot_idx
    dtype = state.ps.dtype
    scan_period = cfg.sensor.scan_period

    # ---- 1-2. propagation + preintegration of the new interval ----
    q_prev, p_prev, v_prev = state.qs[w], state.ps[w], state.vs[w]
    ba, bg = state.bas[w], state.bgs[w]

    imu_cfg = e.imu
    noise18 = PI.noise_matrix(imu_cfg.acc_n, imu_cfg.gyr_n, imu_cfg.acc_w, imu_cfg.gyr_w, dtype)
    pre_k, prefixes = PI.integrate(samples, ba, bg, noise18, with_prefixes=True)
    # world propagation follows exactly from the preintegrated deltas
    # (Estimator.cc:387-394); avoids a second sequential IMU scan
    q_pred, p_pred, v_pred = PI.apply_deltas(
        pre_k, q_prev, p_prev, v_prev, state.g_vec)

    # ---- 3. IMU-predicted deskew + stack downsample ----
    # body motion over the SWEEP (last scan_period of the interval): the
    # interval spans io_ratio sweeps when the estimator consumes every
    # io_ratio-th frame (PointOdometry.cc:725-729), but the cloud covers
    # only the last one. The sweep-start state is read off the IMU prefix
    # states at t_end - scan_period (the reference's stamped-transform
    # lookup, Estimator.cc:628-698).
    dt_total = pre_k.sum_dt
    q_s, p_s, _ = PI.state_at_offset(
        prefixes, dt_total - scan_period, q_prev, p_prev, v_prev, state.g_vec)
    body_es = Pose(q_pred, p_pred).inverse() @ Pose(q_s, p_s)
    t_lb_pose = Pose(state.q_lb, state.t_lb)
    es_laser = t_lb_pose @ body_es @ t_lb_pose.inverse()

    deskew_on = e.enable_deskew and not e.cutoff_deskew
    deskewed = DS.transform_to_end(
        surf_cloud.xyz, surf_cloud.rel_time, es_laser.q, es_laser.t,
        scan_period, enabled=deskew_on)
    ds_xyz, ds_mask, _ = VX.voxel_downsample(
        deskewed, surf_cloud.mask, e.surf_filter_size, e.surf_stack_cap)

    if e.use_corner:
        c_deskewed = DS.transform_to_end(
            corner_cloud.xyz, corner_cloud.rel_time, es_laser.q, es_laser.t,
            scan_period, enabled=deskew_on)
        dc_xyz, dc_mask, _ = VX.voxel_downsample(
            c_deskewed, corner_cloud.mask, e.corner_filter_size,
            e.corner_stack_cap)
    else:
        dc_xyz = jnp.zeros((e.corner_state_cap, 3), dtype)
        dc_mask = jnp.zeros((e.corner_state_cap,), bool)

    # ---- 4. push window ----
    def push(arr, new):
        return jnp.concatenate([arr[1:], new[None]], axis=0)

    st = state._replace(
        qs=push(state.qs, q_pred),
        ps=push(state.ps, p_pred),
        vs=push(state.vs, v_pred),
        bas=push(state.bas, ba),
        bgs=push(state.bgs, bg),
        pres=jax.tree.map(push, state.pres, jax.tree.map(lambda a: a, pre_k)),
        imu=jax.tree.map(push, state.imu, samples),
        surf_xyz=push(state.surf_xyz, ds_xyz),
        surf_mask=push(state.surf_mask, ds_mask),
        corner_xyz=push(state.corner_xyz, dc_xyz),
        corner_mask=push(state.corner_mask, dc_mask),
        # FIX_MAP: the new frame's linearization point is its predicted pose
        qs_lin=push(state.qs_lin, q_pred),
        ps_lin=push(state.ps_lin, p_pred),
    )

    if _TRUNCATE_STAGE == "window":
        return st, {}

    # ---- 5. local map in pivot laser frame ----
    lposes = jax.vmap(lambda q, p: laser_pose(q, p, st.q_lb, st.t_lb))(st.qs, st.ps)
    pivot_pose = jax.tree.map(lambda a: a[pivot], lposes)
    rel = jax.vmap(lambda q, p: (pivot_pose.inverse() @ Pose(q, p)))(lposes.q, lposes.t)

    if e.fix_map:
        # FIX_MAP: the map clouds are accumulated at the FROZEN linearization
        # poses (Estimator.cc:1398-1412,1492-1497); association transforms
        # (rel) stay current.
        lposes_lin = jax.vmap(
            lambda q, p: laser_pose(q, p, st.q_lb, st.t_lb))(st.qs_lin, st.ps_lin)
        pivot_lin = jax.tree.map(lambda a: a[pivot], lposes_lin)
        rel_map = jax.vmap(
            lambda q, p: (pivot_lin.inverse() @ Pose(q, p)))(lposes_lin.q, lposes_lin.t)
    else:
        rel_map = rel

    # all frames except the newest build the map
    def to_pivot(i_xyz, i_mask, rq, rt):
        return quat.rotate(rq[None, :], i_xyz) + rt[None, :], i_mask

    map_pts, map_msk = jax.vmap(to_pivot)(st.surf_xyz, st.surf_mask, rel_map.q, rel_map.t)
    map_pts = map_pts[:w].reshape(-1, 3)
    map_msk = map_msk[:w].reshape(-1)
    map_xyz, map_mask, _ = VX.voxel_downsample(
        map_pts, map_msk, e.surf_filter_size, e.local_map_filtered_cap)
    maps = (map_xyz, map_mask)

    if e.use_corner:
        cmap_pts, cmap_msk = jax.vmap(to_pivot)(
            st.corner_xyz, st.corner_mask, rel_map.q, rel_map.t)
        cmap_xyz, cmap_mask, _ = VX.voxel_downsample(
            cmap_pts[:w].reshape(-1, 3), cmap_msk[:w].reshape(-1),
            e.corner_filter_size, e.local_map_corner_cap)
        maps = maps + (cmap_xyz, cmap_mask)

    if _TRUNCATE_STAGE == "map":
        # debug dump: ALL local-map planes + the association-frame stacks
        # (tools/profile_waterfall.py uses "m"; kernel A/B tooling reads
        # "maps"/"stacks" to replay the exact association inputs)
        return st, {"m": maps[0], "maps": maps,
                    "stacks": (st.surf_xyz, st.surf_mask,
                               st.corner_xyz, st.corner_mask),
                    "rel_q": rel.q, "rel_t": rel.t}

    # ---- association sharding (distributed step only) ----
    if axis is not None:
        n_dev = jax.lax.axis_size(axis)
        rank = jax.lax.axis_index(axis)

        def shard_rows(arr, mask):
            per = arr.shape[0] // n_dev
            start = rank * per
            return (jax.lax.dynamic_slice_in_dim(arr, start, per, 0),
                    jax.lax.dynamic_slice_in_dim(mask, start, per, 0))
    else:
        def shard_rows(arr, mask):
            return arr, mask

    if axis is not None and map_shard:
        assoc = (make_knn5(*shard_rows(maps[0], maps[1]), cfg, axis=axis),)
        if e.use_corner:
            assoc += (make_knn5(*shard_rows(maps[2], maps[3]), cfg, axis=axis),)
    else:
        assoc = (make_knn5(maps[0], maps[1], cfg),)
        if e.use_corner:
            assoc += (make_knn5(maps[2], maps[3], cfg, force_tiled=True),)

    def frame_stacks(i):
        sx, sm = shard_rows(st.surf_xyz[i], st.surf_mask[i])
        if e.use_corner:
            cx, cm = shard_rows(st.corner_xyz[i], st.corner_mask[i])
            return (sx, sm, cx, cm)
        return (sx, sm)

    # ---- features for frames pivot+1 .. window-1 ----
    # NOTE: kept as per-frame association calls. Fusing all frames into one
    # KNN/fit pass was tried and measured SLOWER end-to-end on TPU v5e
    # (44.4 vs 53.2 frames/s): XLA fuses the per-frame chains better than
    # one wide pass with large materialized intermediates.
    feat_pts = []
    feat_coeff = []
    feat_ok = []
    for i in range(pivot + 1, w):
        pts_i, coeff_i, ok_i = _associate_frame(
            assoc, frame_stacks(i), rel.q[i], rel.t[i], cfg)
        feat_pts.append(pts_i)
        feat_coeff.append(coeff_i)
        feat_ok.append(ok_i)

    # ---- newest frame ----
    # With the IMU factor ON the reference routes the newest frame through
    # CalculateLaserOdom — a <=10-iteration mini-GN against the local map
    # whose per-iteration association rounds each cost one KNN+fit pass
    # (Estimator.cc:1561: `idx != window_size || !imu_factor` selects
    # CalculateFeatures for every other case). `newest_refine_iters`
    # exposes the budget (reference: num_max_iterations_ = 10; the shipped
    # profiles trade a few iterations for throughput — early abort at
    # 0.05deg/0.05cm usually converges the refinement in 2-4 rounds).
    n_ref = e.newest_refine_iters if e.imu_factor else 0
    planes_extra = None
    newest_rounds = jnp.zeros((), jnp.int32)
    if n_ref > 0:
        _, _, pts_n, coeff_acc, ok_acc, n_exec = _calculate_laser_odom(
            assoc, frame_stacks(w), rel.q[w], rel.t[w], cfg, n_ref, axis=axis)
        newest_rounds = n_exec
        last = jnp.maximum(n_exec - 1, 0)
        coeff_n = jax.lax.dynamic_index_in_dim(coeff_acc, last, 0, keepdims=False)
        ok_n = jax.lax.dynamic_index_in_dim(ok_acc, last, 0, keepdims=False)
        if e.keep_features and n_ref > 1:
            # keep_features (Estimator.cc:978): earlier association rounds
            # of the mini-GN stay in the factor set — extra point-plane
            # rows all anchored at the newest pose
            extra_ok = ok_acc & (jnp.arange(n_ref) != last)[:, None]
            planes_extra = SV.PlaneFactors(
                point=jnp.broadcast_to(pts_n, (n_ref,) + pts_n.shape),
                coeff=coeff_acc, mask=extra_ok)
    else:
        pts_n, coeff_n, ok_n = _associate_frame(
            assoc, frame_stacks(w), rel.q[w], rel.t[w], cfg)
    feat_pts.append(pts_n)
    feat_coeff.append(coeff_n)
    feat_ok.append(ok_n)

    planes = SV.PlaneFactors(
        point=jnp.stack(feat_pts),
        coeff=jnp.stack(feat_coeff),
        mask=jnp.stack(feat_ok),
    )

    if _TRUNCATE_STAGE == "assoc":
        return st, {"c": planes.coeff}

    # ---- 6. gates + window solve ----
    x0 = SV.OptStates(
        q=st.qs[pivot:], p=st.ps[pivot:],
        sb=jnp.concatenate([st.vs[pivot:], st.bas[pivot:], st.bgs[pivot:]], axis=-1),
        ex_q=st.q_lb, ex_p=st.t_lb)
    pres_opt = jax.tree.map(lambda a: a[pivot + 1:], st.pres)

    ex_prior = None
    if e.prior_factor:
        q_lb0, t_lb0 = cfg.extrinsic_lb()
        ex_prior = (q_lb0.astype(dtype), t_lb0.astype(dtype))

    # one full residual/Jacobian evaluation at x0 serves BOTH the
    # convergence gates and the LM solver's first iteration (validity
    # enters _evaluate as weights, so the gate decision only rescales the
    # marg rows) — saves a full assembly pass per sweep
    imu_sqrt_infos = jax.vmap(FA.sqrt_info_from_covariance)(pres_opt.covariance)
    groups0 = SV._evaluate(
        x0, pres_opt, state.g_vec, planes, st.prior, ex_prior,
        {"cauchy_scale": e.cauchy_loss_scale,
         "imu_sqrt_infos": imu_sqrt_infos}, s_opt, planes_extra)
    costs0 = SV.group_costs(groups0)
    cost_plane0 = costs0["plane"] + costs0.get(
        "plane_extra", jnp.zeros((), dtype))
    if axis is not None:
        # plane rows are sharded; the gates must see the global cost
        cost_plane0 = jax.lax.psum(cost_plane0, axis)
    costs0["plane"] = cost_plane0
    costs0.pop("plane_extra", None)
    turn_off = costs0["imu"] > e.convergence_cost_pim_th
    ratio = costs0["marg"] / jnp.maximum(cost_plane0 + costs0["imu"], 1e-12)
    convergence_flag = st.convergence_flag | (
        (~turn_off) & (ratio <= e.convergence_marg_ratio_th) & (ratio != 0.0))

    # not converged: fix extrinsic + drop the prior (Estimator.cc:1957-1981)
    prior_in = st.prior._replace(valid=st.prior.valid & convergence_flag)
    opt_ex = st.extrinsic_enabled & convergence_flag

    if _TRUNCATE_STAGE == "gates":
        return st, {"f": convergence_flag}

    # reuse the gate evaluation as the solver's first iteration, with the
    # marg rows rescaled by the gate decision
    j_m, r_m, w_m = groups0["marg"]
    eval0 = dict(groups0)
    eval0["marg"] = (j_m, r_m, w_m * convergence_flag.astype(w_m.dtype))

    x_opt, diag = SV.solve_window(
        x0, pres_opt, state.g_vec, planes, prior_in, ex_prior,
        s=s_opt, max_iterations=e.max_solver_iterations,
        cauchy_scale=e.cauchy_loss_scale,
        opt_extrinsic=opt_ex,
        use_marg=jnp.asarray(True),
        eval0=eval0, imu_sqrt_infos=imu_sqrt_infos,
        planes_extra=planes_extra, psum_axis=axis,
        ftol=e.solver_ftol)

    if _TRUNCATE_STAGE == "solve":
        return st, {"q": x_opt.q}

    # ---- 7. yaw-gauge fix (DoubleToVector, Estimator.cc:2479-2568) ----
    r_pivot_old = quat.to_matrix(st.qs[pivot])
    origin_r0 = quat.rot_to_ypr(r_pivot_old)
    origin_p0 = st.ps[pivot]
    r00 = quat.rot_to_ypr(quat.to_matrix(x_opt.q[0]))
    y_diff = origin_r0[0] - r00[0]
    rot_diff = quat.ypr_to_rot(jnp.stack([y_diff, jnp.zeros((), dtype), jnp.zeros((), dtype)]))
    singular = (jnp.abs(jnp.abs(origin_r0[1]) - 90.0) < 1.0) | (jnp.abs(jnp.abs(r00[1]) - 90.0) < 1.0)
    rot_diff = jnp.where(
        singular, r_pivot_old @ quat.to_matrix(x_opt.q[0]).T, rot_diff)
    q_diff = quat.from_matrix(rot_diff)

    new_q_opt = quat.normalize(quat.qmul(q_diff[None, :], x_opt.q))
    new_p_opt = quat.rotate(q_diff[None, :], x_opt.p - x_opt.p[0][None, :]) + origin_p0[None, :]
    new_v_opt = quat.rotate(q_diff[None, :], x_opt.sb[:, 0:3])

    # pre-pivot frames follow the pivot correction (Estimator.cc:2508-2532)
    opt_pivot_pose = Pose(new_q_opt[0], new_p_opt[0])
    old_pivot_pose = Pose(st.qs[pivot], st.ps[pivot])
    corr = opt_pivot_pose @ old_pivot_pose.inverse()
    pre_q = quat.normalize(quat.qmul(corr.q[None, :], st.qs[:pivot]))
    pre_p = quat.rotate(corr.q[None, :], st.ps[:pivot]) + corr.t[None, :]

    qs_new = jnp.concatenate([pre_q, new_q_opt], axis=0)
    ps_new = jnp.concatenate([pre_p, new_p_opt], axis=0)
    vs_new = jnp.concatenate([st.vs[:pivot], new_v_opt], axis=0)
    bas_new = jnp.concatenate([st.bas[:pivot], x_opt.sb[:, 3:6]], axis=0)
    bgs_new = jnp.concatenate([st.bgs[:pivot], x_opt.sb[:, 6:9]], axis=0)

    x_fixed = SV.OptStates(
        q=new_q_opt, p=new_p_opt,
        sb=jnp.concatenate([new_v_opt, x_opt.sb[:, 3:6], x_opt.sb[:, 6:9]], axis=-1),
        ex_q=x_opt.ex_q, ex_p=x_opt.ex_p)

    # ---- 8. marginalize the pivot at the post-solve states ----
    do_marg = jnp.asarray(e.marginalization_factor) & (~turn_off)
    new_prior = SV.marginalize_pivot(
        x_fixed, jax.tree.map(lambda a: a[0], pres_opt), state.g_vec,
        planes, prior_in, s=s_opt, cauchy_scale=e.cauchy_loss_scale,
        planes_extra=planes_extra, psum_axis=axis)
    prior_out = jax.tree.map(
        lambda new, old: jnp.where(do_marg, new, old),
        new_prior, st.prior._replace(valid=prior_in.valid))

    if e.fix_map:
        # SlideWindow refreshes only the NEWEST frame's linearization point
        # to its post-solve pose (Estimator.cc:2637-2643); older ones stay
        # frozen at the pose they had when they were newest.
        qs_lin_new = st.qs_lin.at[w].set(qs_new[w])
        ps_lin_new = st.ps_lin.at[w].set(ps_new[w])
    else:
        qs_lin_new, ps_lin_new = qs_new, ps_new

    st = st._replace(
        qs=qs_new, ps=ps_new, vs=vs_new, bas=bas_new, bgs=bgs_new,
        qs_lin=qs_lin_new, ps_lin=ps_lin_new,
        prior=prior_out,
        q_lb=x_opt.ex_q, t_lb=x_opt.ex_p,
        convergence_flag=convergence_flag,
    )

    # outputs: newest laser pose + pivot pose (the reference's /laser_odom +
    # /local_laser_odom publications, Estimator.cc:725-758)
    lpose_new = laser_pose(st.qs[w], st.ps[w], st.q_lb, st.t_lb)
    lpose_pivot = laser_pose(st.qs[pivot], st.ps[pivot], st.q_lb, st.t_lb)
    outputs = {
        "laser_pose": lpose_new,
        "pivot_pose": lpose_pivot,
        "body_pose": Pose(st.qs[w], st.ps[w]),
        "velocity": st.vs[w],
        "ba": st.bas[w],
        "bg": st.bgs[w],
        "ex_q": st.q_lb,
        "ex_p": st.t_lb,
        "costs": costs0,
        "convergence": convergence_flag,
        "n_features": diag.n_plane,
        "solver_iterations": diag.iterations,
        "newest_rounds": newest_rounds,
    }
    return st, outputs


@partial(jax.jit, static_argnames=("cfg",))
def lio_step(
    state: EstimatorState,
    surf_cloud: Cloud,
    samples: PI.ImuSamples,
    cfg: LioConfig,
    corner_cloud: Cloud = None,
) -> Tuple[EstimatorState, dict]:
    """Single-device jitted per-sweep step (see :func:`lio_step_impl`)."""
    return lio_step_impl(state, surf_cloud, samples, cfg, corner_cloud)
