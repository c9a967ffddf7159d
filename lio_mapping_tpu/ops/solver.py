"""Batched sliding-window Gauss-Newton/LM solver — the Ceres replacement.

Parity target: Estimator::SolveOptimization's Ceres problem
(src/imu_processor/Estimator.cc:1648-2040): pose + speed-bias blocks for the
opt window, an extrinsic block, and four residual groups — marginalization
prior, IMU preintegration factors, pivot point-plane factors (CauchyLoss
1.0), and the extrinsic prior. DENSE_SCHUR+DOGLEG (<=10 iterations) becomes
dense LM on the full (15(S+1)+6)-dim system: at this size a Schur split
buys nothing on TPU — one fused J^T J matmul rides the MXU and the solve is
a ~126x126 Cholesky.

State vector layout (S = opt_window_size):
    [pose_0..pose_S (6 each) | sb_0..sb_S (9 each) | ex (6)]
pose_0 is the pivot. Kept-prior columns map contiguously into this layout
(poses 0..S-1, sbs 0..S-1, ex) — the addr-shift of Estimator.cc:2230-2238
becomes a no-op by construction.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat
from . import factors as FA
from . import marginalization as MG
from .preintegration import Preintegration


class OptStates(NamedTuple):
    """Optimization window states (body frame), leading dim S+1."""

    q: jnp.ndarray   # (S+1, 4)
    p: jnp.ndarray   # (S+1, 3)
    sb: jnp.ndarray  # (S+1, 9) [v, ba, bg]
    ex_q: jnp.ndarray  # (4,) laser->body rotation
    ex_p: jnp.ndarray  # (3,)


class PlaneFactors(NamedTuple):
    """Pivot point-plane features for opt frames 1..S (leading dim S)."""

    point: jnp.ndarray  # (S, F, 3) laser-frame points of frame i
    coeff: jnp.ndarray  # (S, F, 4) plane coeffs in pivot laser frame
    mask: jnp.ndarray   # (S, F)


class SolveDiagnostics(NamedTuple):
    cost_marg: jnp.ndarray
    cost_imu: jnp.ndarray
    cost_plane: jnp.ndarray
    n_plane: jnp.ndarray
    iterations: jnp.ndarray


class PlaneGroup(NamedTuple):
    """Compact (block-sparse) plane-factor evaluation.

    Each of the S*F scalar residual rows touches exactly three 6-wide
    column blocks of the state: pivot pose, pose i+1, extrinsic. Keeping
    the three 6-vectors instead of scattering into a dense (S*F, D)
    Jacobian cuts the LM loop's HBM traffic ~D/18-fold; the normal
    equations are assembled blockwise in ``assemble_normal_equations``.
    Loss (Cauchy) scaling is already applied to jp/ji/jex/r; ``w`` is the
    0/1 validity weight.
    """

    jp: jnp.ndarray   # (S, F, 6) d r / d pose_pivot
    ji: jnp.ndarray   # (S, F, 6) d r / d pose_{i+1}
    jex: jnp.ndarray  # (S, F, 6) d r / d extrinsic
    r: jnp.ndarray    # (S, F)
    w: jnp.ndarray    # (S, F)


def _layout(s: int):
    pose_off = 0
    sb_off = 6 * (s + 1)
    ex_off = sb_off + 9 * (s + 1)
    dim = ex_off + 6
    return pose_off, sb_off, ex_off, dim


def _evaluate(
    x: OptStates,
    pres: Preintegration,       # batched (S,) pre_integrations[pivot+1..window]
    g_vec: jnp.ndarray,
    planes: PlaneFactors,
    prior: MG.PriorState,
    ex_prior: tuple,            # (q_lb0, t_lb0) or None
    cfg_flags: dict,
    s: int,
    planes_extra: PlaneFactors = None,
):
    """Residuals + dense Jacobians for all factor groups.

    Returns dict of (J (N, D), r (N,), w (N,)) per group.

    ``planes_extra``: optional (K, F) extra point-plane rows ALL anchored
    at the newest frame's pose (index S) — the keep_features accumulation
    of the newest-frame mini-GN's association rounds (Estimator.cc:978).
    """
    dtype = x.p.dtype
    pose_off, sb_off, ex_off, dim = _layout(s)
    out = {}

    # ---- marginalization prior ----
    n = 15 * s + 6
    r_marg = MG.prior_residual(prior, x.q[:s], x.p[:s], x.sb[:s], x.ex_q, x.ex_p)
    j_marg = jnp.zeros((n, dim), dtype)
    j_marg = j_marg.at[:, pose_off:pose_off + 6 * s].set(prior.lin_jac[:, : 6 * s])
    j_marg = j_marg.at[:, sb_off:sb_off + 9 * s].set(prior.lin_jac[:, 6 * s:15 * s])
    j_marg = j_marg.at[:, ex_off:ex_off + 6].set(prior.lin_jac[:, 15 * s:])
    w_marg = jnp.where(prior.valid, jnp.ones((n,), dtype), jnp.zeros((n,), dtype))
    out["marg"] = (j_marg, r_marg, w_marg)

    # ---- IMU factors between consecutive opt frames ----
    sqrt_infos = cfg_flags.get("imu_sqrt_infos")
    if sqrt_infos is None:
        sqrt_infos = jax.vmap(FA.sqrt_info_from_covariance)(pres.covariance)

    def one_imu(pre_i, i, si):
        res, (jp_i, jsb_i, jp_j, jsb_j) = FA.imu_factor(
            pre_i, g_vec,
            x.p[i], x.q[i], x.sb[i, 0:3], x.sb[i, 3:6], x.sb[i, 6:9],
            x.p[i + 1], x.q[i + 1], x.sb[i + 1, 0:3], x.sb[i + 1, 3:6], x.sb[i + 1, 6:9],
            sqrt_info=si)
        return res, jp_i, jsb_i, jp_j, jsb_j

    res_imu, jp_i, jsb_i, jp_j, jsb_j = jax.vmap(one_imu)(pres, jnp.arange(s), sqrt_infos)
    j_imu = jnp.zeros((s, 15, dim), dtype)
    for i in range(s):
        j_imu = j_imu.at[i, :, pose_off + 6 * i:pose_off + 6 * i + 6].set(jp_i[i])
        j_imu = j_imu.at[i, :, sb_off + 9 * i:sb_off + 9 * i + 9].set(jsb_i[i])
        j_imu = j_imu.at[i, :, pose_off + 6 * (i + 1):pose_off + 6 * (i + 1) + 6].set(jp_j[i])
        j_imu = j_imu.at[i, :, sb_off + 9 * (i + 1):sb_off + 9 * (i + 1) + 9].set(jsb_j[i])
    # skip pre-integrations spanning > 10 s (Estimator.cc:1799)
    w_imu = jnp.where(pres.sum_dt < 10.0, 1.0, 0.0).astype(dtype)
    w_imu = jnp.broadcast_to(w_imu[:, None], (s, 15)).reshape(-1)
    out["imu"] = (j_imu.reshape(s * 15, dim), res_imu.reshape(-1), w_imu)

    # ---- pivot point-plane factors (frames 1..S) with Cauchy ----
    def one_frame(i):
        def one_feat(pt, co):
            return FA.pivot_point_plane_factor(
                pt, co, x.p[0], x.q[0], x.p[i + 1], x.q[i + 1], x.ex_p, x.ex_q)
        res, (j_piv, j_i, j_ex) = jax.vmap(one_feat)(planes.point[i], planes.coeff[i])
        return res, j_piv, j_i, j_ex

    res_p, jpiv, ji, jex = [], [], [], []
    for i in range(s):
        r_i, j_piv_i, j_i_i, j_ex_i = one_frame(i)
        res_p.append(r_i)
        jpiv.append(j_piv_i)
        ji.append(j_i_i)
        jex.append(j_ex_i)

    res_plane = jnp.stack(res_p)  # (S, F)
    r_scale, j_scale = FA.cauchy_scaling(res_plane * res_plane, cfg_flags["cauchy_scale"])
    out["plane"] = PlaneGroup(
        jp=jnp.stack(jpiv) * j_scale[..., None],
        ji=jnp.stack(ji) * j_scale[..., None],
        jex=jnp.stack(jex) * j_scale[..., None],
        r=res_plane * r_scale,
        w=planes.mask.astype(dtype),
    )

    # ---- keep_features extra rows: all bound to (pivot, newest, ex) ----
    if planes_extra is not None:
        def extra_feat(pt, co):
            return FA.pivot_point_plane_factor(
                pt, co, x.p[0], x.q[0], x.p[s], x.q[s], x.ex_p, x.ex_q)

        res_e, (jp_e, ji_e, jex_e) = jax.vmap(jax.vmap(extra_feat))(
            planes_extra.point, planes_extra.coeff)
        r_se, j_se = FA.cauchy_scaling(res_e * res_e, cfg_flags["cauchy_scale"])
        out["plane_extra"] = PlaneGroup(
            jp=jp_e * j_se[..., None],
            ji=ji_e * j_se[..., None],
            jex=jex_e * j_se[..., None],
            r=res_e * r_se,
            w=planes_extra.mask.astype(dtype),
        )

    # ---- extrinsic prior (outdoor_64 profile) ----
    if ex_prior is not None:
        q_lb0, t_lb0 = ex_prior
        r_ex, j_ex6 = FA.prior_factor(x.ex_p, x.ex_q, t_lb0, q_lb0)
        j_exf = jnp.zeros((6, dim), dtype).at[:, ex_off:ex_off + 6].set(j_ex6)
        out["ex_prior"] = (j_exf, r_ex, jnp.ones((6,), dtype))

    return out


def group_costs(groups):
    """Ceres-style 0.5 * sum r^2 per group (for the convergence gates)."""
    out = {}
    for k, g in groups.items():
        if isinstance(g, PlaneGroup):
            out[k] = 0.5 * jnp.sum(g.w * g.r * g.r)
        else:
            j, r, w = g
            out[k] = 0.5 * jnp.sum(w * r * r)
    return out


def assemble_normal_equations(groups, s: int, psum_axis: str = None):
    """(H, g, cost, group_costs[marg,imu,plane]) from evaluated groups.

    Dense groups (marg/imu/ex_prior — a few hundred rows) contract as one
    stacked matmul; the plane group contracts blockwise: one batched
    (S, F, 18) einsum producing (S, 18, 18) frame blocks scattered into H.
    Identical math to densifying the plane Jacobian (up to f32 summation
    order), ~7x less HBM traffic per LM iteration at D = 126.

    ``psum_axis``: when evaluated inside shard_map with the plane-feature
    axis sharded, the plane contributions (H/g/cost) psum-reduce over the
    mesh while the replicated dense groups are added once — the sharded
    system equals the single-device one up to summation order.
    """
    pose_off, sb_off, ex_off, dim = _layout(s)
    pg = groups["plane"]
    dtype = pg.r.dtype

    dense = [g for k, g in groups.items() if not isinstance(g, PlaneGroup)]
    js = jnp.concatenate([g[0] for g in dense], axis=0)
    rs = jnp.concatenate([g[1] for g in dense], axis=0)
    ws = jnp.concatenate([g[2] for g in dense], axis=0)
    jw = js * ws[:, None]
    h_dense = jw.T @ js
    g_dense = jw.T @ rs
    cost_dense = 0.5 * jnp.sum(ws * rs * rs)

    h = jnp.zeros((dim, dim), dtype)
    g_vec = jnp.zeros((dim,), dtype)

    # plane block contraction
    jcat = jnp.concatenate([pg.jp, pg.ji, pg.jex], axis=-1)  # (S, F, 18)
    jcw = jcat * pg.w[..., None]
    hblk = jnp.einsum("sfi,sfj->sij", jcw, jcat)             # (S, 18, 18)
    gblk = jnp.einsum("sfi,sf->si", jcw, pg.r)               # (S, 18)
    cost_plane = 0.5 * jnp.sum(pg.w * pg.r * pg.r)

    # scatter the (S, 18, 18) frame blocks with a handful of strip /
    # block-diagonal updates (frame poses 1..S are contiguous columns
    # [6, 6+6S) of the state layout), instead of 9S tiny slice-adds
    n_f = pg.r.shape[0]
    po, fo = pose_off, pose_off + 6
    h = h.at[po:po + 6, po:po + 6].add(jnp.sum(hblk[:, 0:6, 0:6], axis=0))
    strip_pf = jnp.transpose(hblk[:, 0:6, 6:12], (1, 0, 2)).reshape(6, 6 * n_f)
    h = h.at[po:po + 6, fo:fo + 6 * n_f].add(strip_pf)
    h = h.at[fo:fo + 6 * n_f, po:po + 6].add(hblk[:, 6:12, 0:6].reshape(6 * n_f, 6))
    bd = jnp.zeros((n_f, 6, n_f, 6), dtype).at[
        jnp.arange(n_f), :, jnp.arange(n_f), :].set(hblk[:, 6:12, 6:12])
    h = h.at[fo:fo + 6 * n_f, fo:fo + 6 * n_f].add(bd.reshape(6 * n_f, 6 * n_f))
    h = h.at[po:po + 6, ex_off:ex_off + 6].add(jnp.sum(hblk[:, 0:6, 12:18], axis=0))
    h = h.at[ex_off:ex_off + 6, po:po + 6].add(jnp.sum(hblk[:, 12:18, 0:6], axis=0))
    h = h.at[fo:fo + 6 * n_f, ex_off:ex_off + 6].add(
        hblk[:, 6:12, 12:18].reshape(6 * n_f, 6))
    strip_ef = jnp.transpose(hblk[:, 12:18, 6:12], (1, 0, 2)).reshape(6, 6 * n_f)
    h = h.at[ex_off:ex_off + 6, fo:fo + 6 * n_f].add(strip_ef)
    h = h.at[ex_off:ex_off + 6, ex_off:ex_off + 6].add(
        jnp.sum(hblk[:, 12:18, 12:18], axis=0))
    g_vec = g_vec.at[po:po + 6].add(jnp.sum(gblk[:, 0:6], axis=0))
    g_vec = g_vec.at[fo:fo + 6 * n_f].add(gblk[:, 6:12].reshape(6 * n_f))
    g_vec = g_vec.at[ex_off:ex_off + 6].add(jnp.sum(gblk[:, 12:18], axis=0))

    # keep_features extra rows: every block maps to the SAME three column
    # blocks (pivot, newest pose S, extrinsic), so the whole (K, F) group
    # collapses into ONE 18x18 block before scattering
    pe = groups.get("plane_extra")
    if pe is not None:
        jcat_e = jnp.concatenate([pe.jp, pe.ji, pe.jex], axis=-1)  # (K,F,18)
        jcw_e = jcat_e * pe.w[..., None]
        h18 = jnp.einsum("kfi,kfj->ij", jcw_e, jcat_e)
        g18 = jnp.einsum("kfi,kf->i", jcw_e, pe.r)
        no = pose_off + 6 * n_f  # newest pose columns
        offs = (po, no, ex_off)
        for a, o1 in enumerate(offs):
            for b, o2 in enumerate(offs):
                h = h.at[o1:o1 + 6, o2:o2 + 6].add(
                    h18[6 * a:6 * a + 6, 6 * b:6 * b + 6])
            g_vec = g_vec.at[o1:o1 + 6].add(g18[6 * a:6 * a + 6])
        cost_plane = cost_plane + 0.5 * jnp.sum(pe.w * pe.r * pe.r)

    if psum_axis is not None:
        h = jax.lax.psum(h, psum_axis)
        g_vec = jax.lax.psum(g_vec, psum_axis)
        cost_plane = jax.lax.psum(cost_plane, psum_axis)

    h = h + h_dense
    g_vec = g_vec + g_dense
    cost = cost_dense + cost_plane

    costs = group_costs({k: g for k, g in groups.items()
                         if not isinstance(g, PlaneGroup)})
    gc = jnp.stack([costs.get("marg", jnp.zeros((), dtype)),
                    costs["imu"], cost_plane])
    return h, g_vec, cost, gc


def _retract(x: OptStates, dx: jnp.ndarray, s: int) -> OptStates:
    """Apply a local step (PoseLocalParameterization: q * DeltaQ(dtheta))."""
    pose_off, sb_off, ex_off, _ = _layout(s)
    dpose = dx[pose_off:pose_off + 6 * (s + 1)].reshape(s + 1, 6)
    dsb = dx[sb_off:sb_off + 9 * (s + 1)].reshape(s + 1, 9)
    dex = dx[ex_off:ex_off + 6]
    return OptStates(
        q=quat.normalize(quat.qmul(x.q, quat.delta_q(dpose[:, 3:6]))),
        p=x.p + dpose[:, 0:3],
        sb=x.sb + dsb,
        ex_q=quat.normalize(quat.qmul(x.ex_q, quat.delta_q(dex[3:6]))),
        ex_p=x.ex_p + dex[0:3],
    )


def solve_window(
    x0: OptStates,
    pres: Preintegration,
    g_vec: jnp.ndarray,
    planes: PlaneFactors,
    prior: MG.PriorState,
    ex_prior,
    *,
    s: int,
    max_iterations: int = 10,
    cauchy_scale: float = 1.0,
    opt_extrinsic,
    use_marg,
    eval0=None,
    imu_sqrt_infos=None,
    planes_extra=None,
    psum_axis=None,
    step_abort_deg: float = 0.05,
    step_abort_cm: float = 0.05,
    ftol: float = 1e-6,
):
    """LM over the window. Returns (x_opt, diagnostics).

    ``eval0``: optional groups dict from a prior ``_evaluate`` at ``x0``
    with weights ALREADY reflecting the effective prior validity — reused
    as the first LM evaluation (the estimator's convergence gates evaluate
    at x0 anyway; reusing it saves one full residual/Jacobian assembly per
    sweep). ``imu_sqrt_infos`` may carry the hoisted covariance whitening
    alongside it.
    """
    dtype = x0.p.dtype
    pose_off, sb_off, ex_off, dim = _layout(s)
    # hoist the 15x15 covariance whitening out of the LM loop (expensive
    # inverse+Cholesky custom calls on TPU, invariant w.r.t. the states)
    if imu_sqrt_infos is None:
        imu_sqrt_infos = jax.vmap(FA.sqrt_info_from_covariance)(pres.covariance)
    flags = {
        "cauchy_scale": cauchy_scale,
        "imu_sqrt_infos": imu_sqrt_infos,
    }

    free = jnp.ones((dim,), dtype)
    free = free.at[ex_off:ex_off + 6].set(
        jnp.where(opt_extrinsic, 1.0, 0.0) * jnp.ones(6, dtype))

    prior_used = prior._replace(valid=prior.valid & use_marg)

    def eval_all(x):
        return assemble_normal_equations(
            _evaluate(x, pres, g_vec, planes, prior_used, ex_prior, flags, s,
                      planes_extra), s, psum_axis)

    # One full residual/Jacobian evaluation per LM iteration: the accepted
    # point's assembled (H, g) ride the carry, and the candidate's
    # evaluation is promoted into the carry on accept — N+1 evaluations
    # total instead of 2N. Early exit via while_loop once the relative cost
    # drop falls below function_tolerance (Ceres's default gate; the
    # reference runs Ceres with defaults + max 10 iters,
    # Estimator.cc:1909-1921) OR the pose step shrinks below the
    # reference's own GN abort thresholds (0.05 deg / 0.05 cm,
    # Estimator.cc:1480-1488 / PointMapping.cc:700-714). The ftol gate
    # alone never fires in f32 — a 1e-6 relative drop is below the
    # summation noise of ~1e4 Cauchy rows, so without the step gate the LM
    # silently burns its full budget every sweep (measured: 8/8 iterations
    # on every steady-state outdoor_64 sweep, ~2x the whole step's device
    # time). ``ftol`` therefore defaults to a value that CAN fire in f32
    # (config.solver_ftol).

    def lm_cond(carry):
        x, lam, cost, h, gv, gc, it, done = carry
        return (it < max_iterations) & ~done

    def lm_step(carry):
        x, lam, cost, h, gv, gc, it, _ = carry
        # mask fixed blocks: solve with identity rows there
        m = free
        h_m = (h * m[None, :]) * m[:, None] + jnp.diag(1.0 - m)
        g_m = gv * m
        damped = h_m + lam * jnp.diag(jnp.maximum(jnp.diag(h_m), 1e-6))
        dx = -jnp.linalg.solve(damped, g_m)
        x_new = _retract(x, dx * m, s)
        h2, g2, new_cost, gc2 = eval_all(x_new)
        accept = new_cost < cost
        x = jax.tree.map(lambda a, b: jnp.where(accept, a, b), x_new, x)
        h = jnp.where(accept, h2, h)
        gv = jnp.where(accept, g2, gv)
        gc = jnp.where(accept, gc2, gc)
        # step-size abort on the pose blocks (tiny step at a local minimum
        # whether accepted or not — the trust region only shrinks from here)
        dpose = (dx * m)[pose_off:pose_off + 6 * (s + 1)].reshape(s + 1, 6)
        dt_cm = jnp.max(jnp.linalg.norm(dpose[:, 0:3], axis=-1)) * 100.0
        dr_deg = jnp.rad2deg(jnp.max(jnp.linalg.norm(dpose[:, 3:6], axis=-1)))
        small = (dr_deg < step_abort_deg) & (dt_cm < step_abort_cm)
        done = (accept & (cost - new_cost <= ftol * cost)) | small
        import os as _os
        if _os.environ.get("LIO_DEBUG_LM"):  # trace-time switch
            jax.debug.print(
                "LM it={it} cost={c:.6e} new={n:.6e} acc={a} lam={l:.1e} "
                "dr={r:.4f}deg dt={t:.4f}cm", it=it, c=cost, n=new_cost,
                a=accept, l=lam, r=dr_deg, t=dt_cm)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), lam * 4.0)
        cost = jnp.where(accept, new_cost, cost)
        return (x, lam, cost, h, gv, gc, it + 1, done)

    if eval0 is not None:
        # the caller's gate evaluation at x0; marg weights must already
        # encode prior_used.valid (the groups carry validity as weights)
        h0, g0, cost0, gc0 = assemble_normal_equations(eval0, s, psum_axis)
    else:
        h0, g0, cost0, gc0 = eval_all(x0)
    x_fin, _, cost_fin, _, _, gc_fin, iters, _ = jax.lax.while_loop(
        lm_cond, lm_step,
        (x0, jnp.asarray(1e-4, dtype), cost0, h0, g0, gc0,
         jnp.asarray(0, jnp.int32), jnp.asarray(False)))

    # diagnostics at the solution (group costs carried from the last
    # accepted evaluation — no extra full evaluation needed)
    n_plane = jnp.sum(planes.mask)
    if planes_extra is not None:
        n_plane = n_plane + jnp.sum(planes_extra.mask)
    if psum_axis is not None:
        n_plane = jax.lax.psum(n_plane, psum_axis)
    diag = SolveDiagnostics(
        cost_marg=gc_fin[0],
        cost_imu=gc_fin[1],
        cost_plane=gc_fin[2],
        n_plane=n_plane,
        iterations=iters,
    )
    return x_fin, diag


def marginalize_pivot(
    x: OptStates,
    pre_01: Preintegration,
    g_vec: jnp.ndarray,
    planes: PlaneFactors,
    prior: MG.PriorState,
    *,
    s: int,
    cauchy_scale: float = 1.0,
    psum_axis: str | None = None,
    planes_extra: PlaneFactors = None,
) -> MG.PriorState:
    """Build the new prior by Schur-eliminating pose_0 + sb_0.

    ``psum_axis``: when called under shard_map with the plane-feature axis
    sharded, the plane-factor contribution is psum-reduced over this mesh
    axis (prior/IMU parts are replicated).

    Mirrors Estimator.cc:2152-2244: residual set = {old prior (drop cols of
    pose_0/sb_0), ImuFactor(0,1), all plane factors}, assembled at the
    post-solve linearization point, marginalized with the
    eigenvalue-thresholded pseudo-inverse, then refactorized.

    Full vector layout here: [pose_0 (6) | sb_0 (9) | keep (15S+6)] where
    keep = [pose_1..S | sb_1..S | ex].
    """
    dtype = x.p.dtype
    n = 15 * s + 6
    m = 15
    full = m + n

    # column offsets in the full [drop | keep] layout
    def pose_col(i):  # i in 0..S
        return 0 if i == 0 else m + 6 * (i - 1)

    def sb_col(i):
        return 6 if i == 0 else m + 6 * s + 9 * (i - 1)

    ex_col = m + 15 * s

    # ---- old prior with drop set {pose_0, sb_0} ----
    # At marginalization time the prior's kept blocks are the CURRENT slots
    # 0..S-1 — pose_0/sb_0 fall into the drop set. The prior's columns are
    # permuted into the [drop | keep] layout with ONE static-scatter, then
    # its Hessian contribution is one matmul (the reference's 4-pthread
    # ThreadsConstructA collapsed to an MXU contraction).
    r_marg = MG.prior_residual(prior, x.q[:s], x.p[:s], x.sb[:s], x.ex_q, x.ex_p)
    jm = prior.lin_jac  # (n, n) cols [pose_0..S-1 | sb_0..S-1 | ex]
    perm = []
    for i in range(s):
        perm.extend(range(pose_col(i), pose_col(i) + 6))
    for i in range(s):
        perm.extend(range(sb_col(i), sb_col(i) + 9))
    perm.extend(range(ex_col, ex_col + 6))
    jm_full = jnp.zeros((n, full), dtype).at[:, jnp.asarray(perm)].set(jm)
    w_pr = prior.valid.astype(dtype)
    a = w_pr * (jm_full.T @ jm_full)
    b = w_pr * (jm_full.T @ r_marg)

    # ---- IMU factor (0, 1) ----
    res01, (jp0, jsb0, jp1, jsb1) = FA.imu_factor(
        pre_01, g_vec,
        x.p[0], x.q[0], x.sb[0, 0:3], x.sb[0, 3:6], x.sb[0, 6:9],
        x.p[1], x.q[1], x.sb[1, 0:3], x.sb[1, 3:6], x.sb[1, 6:9])
    w01 = jnp.where(pre_01.sum_dt < 10.0, 1.0, 0.0).astype(dtype)
    j01 = jnp.zeros((15, full), dtype)
    j01 = j01.at[:, pose_col(0):pose_col(0) + 6].set(jp0)
    j01 = j01.at[:, sb_col(0):sb_col(0) + 9].set(jsb0)
    j01 = j01.at[:, pose_col(1):pose_col(1) + 6].set(jp1)
    j01 = j01.at[:, sb_col(1):sb_col(1) + 9].set(jsb1)
    a = a + w01 * (j01.T @ j01)
    b = b + w01 * (j01.T @ res01)

    # ---- plane factors of all frames (drop col = pose_0) ----
    # same blockwise einsum + strip scatter as assemble_normal_equations;
    # keep columns of the S frame poses are contiguous at [m, m + 6S)
    def one_frame(i):
        def one_feat(pt, co):
            return FA.pivot_point_plane_factor(
                pt, co, x.p[0], x.q[0], x.p[i + 1], x.q[i + 1], x.ex_p, x.ex_q)
        return jax.vmap(one_feat)(planes.point[i], planes.coeff[i])

    res_l, jp_l, ji_l, jex_l = [], [], [], []
    for i in range(s):
        res_i, (j_piv, j_i, j_ex) = one_frame(i)
        res_l.append(res_i)
        jp_l.append(j_piv)
        ji_l.append(j_i)
        jex_l.append(j_ex)
    res_pl = jnp.stack(res_l)                                 # (S, F)
    r_scale, j_scale = FA.cauchy_scaling(res_pl * res_pl, cauchy_scale)
    wm = planes.mask.astype(dtype) * j_scale                  # (S, F)
    jcat = jnp.concatenate(
        [jnp.stack(jp_l), jnp.stack(ji_l), jnp.stack(jex_l)], axis=-1)  # (S,F,18)
    jcw = jcat * wm[..., None]
    hblk = jnp.einsum("sfi,sfj->sij", jcw, jcw)
    gblk = jnp.einsum("sfi,sf->si", jcw,
                      planes.mask.astype(dtype) * r_scale * res_pl)

    a_pl = jnp.zeros((full, full), dtype)
    b_pl = jnp.zeros((full,), dtype)
    po, fo = pose_col(0), m
    a_pl = a_pl.at[po:po + 6, po:po + 6].add(jnp.sum(hblk[:, 0:6, 0:6], axis=0))
    strip_pf = jnp.transpose(hblk[:, 0:6, 6:12], (1, 0, 2)).reshape(6, 6 * s)
    a_pl = a_pl.at[po:po + 6, fo:fo + 6 * s].add(strip_pf)
    a_pl = a_pl.at[fo:fo + 6 * s, po:po + 6].add(hblk[:, 6:12, 0:6].reshape(6 * s, 6))
    bd = jnp.zeros((s, 6, s, 6), dtype).at[
        jnp.arange(s), :, jnp.arange(s), :].set(hblk[:, 6:12, 6:12])
    a_pl = a_pl.at[fo:fo + 6 * s, fo:fo + 6 * s].add(bd.reshape(6 * s, 6 * s))
    a_pl = a_pl.at[po:po + 6, ex_col:ex_col + 6].add(jnp.sum(hblk[:, 0:6, 12:18], axis=0))
    a_pl = a_pl.at[ex_col:ex_col + 6, po:po + 6].add(jnp.sum(hblk[:, 12:18, 0:6], axis=0))
    a_pl = a_pl.at[fo:fo + 6 * s, ex_col:ex_col + 6].add(
        hblk[:, 6:12, 12:18].reshape(6 * s, 6))
    strip_ef = jnp.transpose(hblk[:, 12:18, 6:12], (1, 0, 2)).reshape(6, 6 * s)
    a_pl = a_pl.at[ex_col:ex_col + 6, fo:fo + 6 * s].add(strip_ef)
    a_pl = a_pl.at[ex_col:ex_col + 6, ex_col:ex_col + 6].add(
        jnp.sum(hblk[:, 12:18, 12:18], axis=0))
    b_pl = b_pl.at[po:po + 6].add(jnp.sum(gblk[:, 0:6], axis=0))
    b_pl = b_pl.at[fo:fo + 6 * s].add(gblk[:, 6:12].reshape(6 * s))
    b_pl = b_pl.at[ex_col:ex_col + 6].add(jnp.sum(gblk[:, 12:18], axis=0))

    # keep_features extra rows: pivot is in every point-plane factor, so
    # the accumulated newest-frame rounds enter the Schur system too —
    # collapsed to one 18x18 block over (pivot[drop], pose_S, ex) columns
    if planes_extra is not None:
        def extra_feat(pt, co):
            return FA.pivot_point_plane_factor(
                pt, co, x.p[0], x.q[0], x.p[s], x.q[s], x.ex_p, x.ex_q)

        res_e, (jp_e, ji_e, jex_e) = jax.vmap(jax.vmap(extra_feat))(
            planes_extra.point, planes_extra.coeff)
        r_se, j_se = FA.cauchy_scaling(res_e * res_e, cauchy_scale)
        wm_e = planes_extra.mask.astype(dtype) * j_se
        jcat_e = jnp.concatenate([jp_e, ji_e, jex_e], axis=-1)  # (K,F,18)
        jcw_e = jcat_e * wm_e[..., None]
        h18 = jnp.einsum("kfi,kfj->ij", jcw_e, jcw_e)
        g18 = jnp.einsum("kfi,kf->i", jcw_e,
                         planes_extra.mask.astype(dtype) * r_se * res_e)
        no = m + 6 * (s - 1)  # newest pose keep-columns
        offs = (pose_col(0), no, ex_col)
        for ai, o1 in enumerate(offs):
            for bi, o2 in enumerate(offs):
                a_pl = a_pl.at[o1:o1 + 6, o2:o2 + 6].add(
                    h18[6 * ai:6 * ai + 6, 6 * bi:6 * bi + 6])
            b_pl = b_pl.at[o1:o1 + 6].add(g18[6 * ai:6 * ai + 6])

    if psum_axis is not None:
        a_pl = jax.lax.psum(a_pl, psum_axis)
        b_pl = jax.lax.psum(b_pl, psum_axis)
    a = a + a_pl
    b = b + b_pl

    a_new, b_new = MG.schur_marginalize(a, b, m)
    lin_jac, lin_res = MG.factorize_prior(a_new, b_new)

    return MG.PriorState(
        lin_jac=lin_jac,
        lin_res=lin_res,
        x0_q=x.q[1:],
        x0_p=x.p[1:],
        x0_sb=x.sb[1:],
        x0_ex_q=x.ex_q,
        x0_ex_p=x.ex_p,
        valid=jnp.asarray(True),
    )
