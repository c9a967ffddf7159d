"""Sliding-window solver + marginalization tests.

* linear-algebra identities of the Schur marginalization (exact for linear
  factors — validates the factorized-prior machinery),
* a synthetic window BA: perturbed window states recovered from
  plane factors + IMU preintegration (relative-pose recovery, gauge-aware).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from lio_mapping_tpu.io import synthetic
from lio_mapping_tpu.ops import marginalization as MG
from lio_mapping_tpu.ops import preintegration as PI
from lio_mapping_tpu.ops import solver as SV
from lio_mapping_tpu.utils import quaternion as quat
from lio_mapping_tpu.utils.se3 import Pose

from tests.test_preintegration import make_samples, gt_state

G = 9.805


class TestSchurAlgebra:
    def test_factorized_prior_reproduces_schur_system(self, rng):
        m, n, r_rows = 9, 21, 120
        j = jnp.asarray(rng.normal(size=(r_rows, m + n)))
        r = jnp.asarray(rng.normal(size=(r_rows,)))
        a = j.T @ j
        b = j.T @ r
        a_s, b_s = MG.schur_marginalize(a, b, m)
        lj, lr = MG.factorize_prior(a_s, b_s)
        np.testing.assert_allclose(np.asarray(lj.T @ lj), np.asarray(a_s), atol=1e-8)
        np.testing.assert_allclose(np.asarray(lj.T @ lr), np.asarray(b_s), atol=1e-8)

    def test_marginalized_solution_matches_full(self, rng):
        """Minimizer of the marginalized quadratic == keep-part of the full
        minimizer (the defining property of the Schur complement)."""
        m, n, r_rows = 6, 15, 200
        j = jnp.asarray(rng.normal(size=(r_rows, m + n)))
        r = jnp.asarray(rng.normal(size=(r_rows,)))
        a = np.asarray(j.T @ j)
        b = np.asarray(j.T @ r)
        x_full = np.linalg.solve(a, -b)
        a_s, b_s = MG.schur_marginalize(jnp.asarray(a), jnp.asarray(b), m)
        x_keep = np.linalg.solve(np.asarray(a_s), -np.asarray(b_s))
        np.testing.assert_allclose(x_keep, x_full[m:], atol=1e-8)

    def test_psd_pinv_thresholds_small_eigenvalues(self, rng):
        v = jnp.asarray(rng.normal(size=(5, 5)))
        a = v @ jnp.diag(jnp.asarray([2.0, 1.0, 0.5, 1e-12, 0.0])) @ v.T
        # use eigenbasis-diagonal test instead: pinv(a) a pinv(a) == pinv(a)
        p = MG.psd_pinv(0.5 * (a + a.T))
        np.testing.assert_allclose(np.asarray(p @ a @ p), np.asarray(p), atol=1e-6)


def _make_window_problem(s=3, f=96, noise=0.0, seed=0):
    """GT window states + synthetic plane factors + IMU preintegrations."""
    rng = np.random.default_rng(seed)
    traj = synthetic.Trajectory()
    dt = 0.1
    times = [0.5 + dt * i for i in range(s + 1)]

    qs, ps, vs = [], [], []
    for t in times:
        q, p, v = gt_state(traj, t)
        qs.append(q), ps.append(p), vs.append(v)
    qs = jnp.stack(qs)
    ps = jnp.stack(ps)
    sb = jnp.concatenate([jnp.stack(vs), jnp.zeros((s + 1, 6), jnp.float64)], axis=-1)

    # identity extrinsic: laser == body
    x_gt = SV.OptStates(q=qs, p=ps, sb=sb,
                        ex_q=quat.identity(jnp.float64), ex_p=jnp.zeros(3, jnp.float64))

    # preintegrations between frames
    noise18 = PI.noise_matrix(0.2, 0.02, 2e-4, 2e-5, dtype=jnp.float64)
    pres = []
    for i in range(s):
        samples = make_samples(traj, times[i], times[i + 1])
        pres.append(PI.integrate(samples, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64), noise18))
    pres = jax.tree.map(lambda *a: jnp.stack(a), *pres)

    # plane features: K random planes in the pivot (frame 0) laser frame
    k = 8
    normals = rng.normal(size=(k, 3))
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    offsets = rng.uniform(1.0, 4.0, size=(k,))

    pivot_pose = Pose(qs[0], ps[0])
    pts = np.zeros((s, f, 3))
    coeffs = np.zeros((s, f, 4))
    for i in range(s):
        rel = (pivot_pose.inverse() @ Pose(qs[i + 1], ps[i + 1]))  # frame i+1 in pivot
        for j in range(f):
            pl = j % k
            # random point on plane pl (in pivot frame)
            base = -offsets[pl] * normals[pl]
            t1 = np.cross(normals[pl], [1.0, 0.2, 0.3])
            t1 /= np.linalg.norm(t1)
            t2 = np.cross(normals[pl], t1)
            pt_pivot = base + rng.uniform(-3, 3) * t1 + rng.uniform(-3, 3) * t2
            # express in frame i+1
            pt_i = np.asarray(rel.inverse().apply_one(jnp.asarray(pt_pivot)))
            if noise > 0:
                pt_i = pt_i + rng.normal(0, noise, 3)
            pts[i, j] = pt_i
            coeffs[i, j] = np.concatenate([normals[pl], [offsets[pl]]])

    planes = SV.PlaneFactors(
        point=jnp.asarray(pts), coeff=jnp.asarray(coeffs), mask=jnp.ones((s, f), bool))
    return x_gt, pres, planes


class TestWindowSolver:
    def test_residuals_zero_at_ground_truth(self):
        x_gt, pres, planes = _make_window_problem()
        prior = MG.PriorState.empty(3, jnp.float64)
        groups = SV._evaluate(
            x_gt, pres, jnp.asarray([0.0, 0.0, -G]), planes, prior, None,
            {"cauchy_scale": 1.0}, 3)
        pg = groups["plane"]
        np.testing.assert_allclose(np.asarray(pg.r * pg.w), 0.0, atol=1e-6)
        j, r, w = groups["imu"]
        assert float(jnp.max(jnp.abs(r * w))) < 0.5  # whitened, small

    def test_recovery_from_perturbation(self):
        x_gt, pres, planes = _make_window_problem()
        rng = np.random.default_rng(3)
        s = 3

        # perturb frames 1..S (pivot gauge-anchors the problem via planes)
        dq = jnp.asarray(rng.normal(0, 0.01, (s + 1, 3))).at[0].set(0.0)
        dp = jnp.asarray(rng.normal(0, 0.05, (s + 1, 3))).at[0].set(0.0)
        x0 = x_gt._replace(
            q=quat.normalize(quat.qmul(x_gt.q, quat.exp(dq))),
            p=x_gt.p + dp,
            sb=x_gt.sb + jnp.asarray(rng.normal(0, 0.02, (s + 1, 9))))

        prior = MG.PriorState.empty(s, jnp.float64)
        x_fin, diag = SV.solve_window(
            x0, pres, jnp.asarray([0.0, 0.0, -G]), planes, prior, None,
            s=s, max_iterations=10,
            opt_extrinsic=jnp.asarray(False), use_marg=jnp.asarray(False))

        # compare relative poses (pivot^-1 . frame_i): gauge-free
        for i in range(1, s + 1):
            rel_gt = Pose(x_gt.q[0], x_gt.p[0]).inverse() @ Pose(x_gt.q[i], x_gt.p[i])
            rel_es = Pose(x_fin.q[0], x_fin.p[0]).inverse() @ Pose(x_fin.q[i], x_fin.p[i])
            dt_err = float(jnp.linalg.norm(rel_gt.t - rel_es.t))
            dr_err = float(quat.angular_distance(rel_gt.q, rel_es.q))
            # convergence floor: whitened IMU rows (~1e3) dominate plane
            # rows (~1); the few-mm/~0.3-deg stall is far below real sensor
            # noise (same regime as the reference's Ceres DOGLEG <=10 iters)
            assert dt_err < 1.5e-2, f"frame {i}: {dt_err}"
            assert np.rad2deg(dr_err) < 0.5, f"frame {i}: {np.rad2deg(dr_err)}"

    def test_marginalization_prior_anchors_window(self):
        """After marginalizing the pivot, the prior should pull the kept
        states back toward their linearization values."""
        x_gt, pres, planes = _make_window_problem()
        s = 3
        prior0 = MG.PriorState.empty(s, jnp.float64)
        new_prior = SV.marginalize_pivot(
            x_gt, jax.tree.map(lambda a: a[0], pres),
            jnp.asarray([0.0, 0.0, -G]), planes, prior0, s=s)

        assert bool(new_prior.valid)
        # residual at linearization point == lin_res (dx = 0)
        r0 = MG.prior_residual(
            new_prior, x_gt.q[1:], x_gt.p[1:], x_gt.sb[1:], x_gt.ex_q, x_gt.ex_p)
        np.testing.assert_allclose(np.asarray(r0), np.asarray(new_prior.lin_res), atol=1e-12)

        # perturbing a kept state increases the prior cost
        q_pert = quat.qmul(x_gt.q[1:], quat.exp(jnp.asarray([[0.02, 0, 0]] * s)))
        r1 = MG.prior_residual(
            new_prior, q_pert, x_gt.p[1:], x_gt.sb[1:], x_gt.ex_q, x_gt.ex_p)
        assert float(jnp.sum(r1 * r1)) > float(jnp.sum(r0 * r0))

    def test_prior_gradient_matches_full_system(self):
        """Gauss-Newton consistency: at the linearization point, the prior's
        gradient on kept states equals the full system's (Schur property)."""
        x_gt, pres, planes = _make_window_problem(noise=0.01, seed=5)
        s = 3
        g_vec = jnp.asarray([0.0, 0.0, -G])
        prior0 = MG.PriorState.empty(s, jnp.float64)

        new_prior = SV.marginalize_pivot(
            x_gt, jax.tree.map(lambda a: a[0], pres), g_vec, planes, prior0, s=s)

        # gradient of 0.5|r0 + J dx|^2 at dx=0 is J^T r0
        g_prior = np.asarray(new_prior.lin_jac.T @ new_prior.lin_res)

        # build the full (A,b) by hand and Schur-reduce
        from lio_mapping_tpu.ops import factors as FA
        m, n = 15, 15 * s + 6
        rows_j = []
        rows_r = []
        # imu (0,1)
        pre01 = jax.tree.map(lambda a: a[0], pres)
        res01, (jp0, jsb0, jp1, jsb1) = FA.imu_factor(
            pre01, g_vec,
            x_gt.p[0], x_gt.q[0], x_gt.sb[0, 0:3], x_gt.sb[0, 3:6], x_gt.sb[0, 6:9],
            x_gt.p[1], x_gt.q[1], x_gt.sb[1, 0:3], x_gt.sb[1, 3:6], x_gt.sb[1, 6:9])
        jrow = np.zeros((15, m + n))
        jrow[:, 0:6] = np.asarray(jp0)
        jrow[:, 6:15] = np.asarray(jsb0)
        jrow[:, 15:21] = np.asarray(jp1)
        jrow[:, 15 + 6 * s:15 + 6 * s + 9] = np.asarray(jsb1)
        rows_j.append(jrow)
        rows_r.append(np.asarray(res01))
        # planes
        for i in range(s):
            def one_feat(pt, co):
                return FA.pivot_point_plane_factor(
                    pt, co, x_gt.p[0], x_gt.q[0], x_gt.p[i + 1], x_gt.q[i + 1],
                    x_gt.ex_p, x_gt.ex_q)
            res_i, (j_piv, j_i, j_ex) = jax.vmap(one_feat)(planes.point[i], planes.coeff[i])
            rs, js = FA.cauchy_scaling(res_i * res_i, 1.0)
            f = planes.point.shape[1]
            jrow = np.zeros((f, m + n))
            jrow[:, 0:6] = np.asarray(j_piv * js[:, None])
            jrow[:, 15 + 6 * i:15 + 6 * i + 6] = np.asarray(j_i * js[:, None])
            jrow[:, 15 + 15 * s:] = np.asarray(j_ex * js[:, None])
            rows_j.append(jrow)
            rows_r.append(np.asarray(res_i * rs))

        j_all = np.concatenate(rows_j)
        r_all = np.concatenate(rows_r)
        a = j_all.T @ j_all
        b = j_all.T @ r_all
        a_s, b_s = MG.schur_marginalize(jnp.asarray(a), jnp.asarray(b), m)
        # the factored prior projects out <=1e-8 eigen-directions (gauge);
        # compare up to that truncation
        np.testing.assert_allclose(g_prior, np.asarray(b_s), atol=1e-5)


class TestPlanesExtra:
    """keep_features extra rows (Estimator.cc:978): (K, F) point-plane rows
    all anchored at the newest pose enter H/g/marginalization exactly as if
    they were ordinary dense rows."""

    def _extra(self, s, f=16, k=3, seed=5):
        rng = np.random.default_rng(seed)
        pts = jnp.asarray(rng.uniform(-3, 3, (k, f, 3)))
        w = rng.normal(size=(k, f, 3))
        w /= np.linalg.norm(w, axis=-1, keepdims=True)
        coeff = jnp.asarray(np.concatenate(
            [w, rng.uniform(-1, 1, (k, f, 1))], axis=-1))
        mask = jnp.asarray(rng.random((k, f)) < 0.7)
        return SV.PlaneFactors(point=pts, coeff=coeff, mask=mask)

    def test_assembly_matches_dense(self):
        s = 3
        x_gt, pres, planes = _make_window_problem(s=s, f=24, noise=0.02, seed=2)
        extra = self._extra(s)
        prior = MG.PriorState.empty(s, jnp.float64)
        g_vec = jnp.asarray([0.0, 0.0, -G])
        flags = {"cauchy_scale": 1.0}

        groups = SV._evaluate(x_gt, pres, g_vec, planes, prior, None, flags,
                              s, planes_extra=extra)
        h, g, cost, _ = SV.assemble_normal_equations(groups, s)

        # densify the extra group by hand and compare
        pe = groups.pop("plane_extra")
        h0, g0, cost0, _ = SV.assemble_normal_equations(groups, s)
        pose_off, sb_off, ex_off, dim = SV._layout(s)
        jf = np.zeros((np.prod(pe.r.shape), dim))
        jcat = np.asarray(jnp.concatenate([pe.jp, pe.ji, pe.jex], axis=-1)
                          ).reshape(-1, 18)
        jf[:, pose_off:pose_off + 6] = jcat[:, 0:6]
        jf[:, pose_off + 6 * s:pose_off + 6 * s + 6] = jcat[:, 6:12]
        jf[:, ex_off:ex_off + 6] = jcat[:, 12:18]
        wv = np.asarray(pe.w).reshape(-1)
        rv = np.asarray(pe.r).reshape(-1)
        h_e = (jf * wv[:, None]).T @ jf
        g_e = (jf * wv[:, None]).T @ rv
        np.testing.assert_allclose(np.asarray(h), np.asarray(h0) + h_e,
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g0) + g_e,
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(
            float(cost), float(cost0) + 0.5 * float(np.sum(wv * rv * rv)),
            rtol=1e-9)

    def test_extra_rows_equal_main_rows(self):
        """Moving the newest frame's plane rows into the extra group must
        not change the solution: extra rows are live factors identical to
        main rows anchored at pose S."""
        s = 3
        x_gt, pres, planes = _make_window_problem(s=s, f=64, noise=0.0, seed=3)
        # extra group = ONE copy of the newest frame's rows
        extra = SV.PlaneFactors(
            point=planes.point[s - 1][None],
            coeff=planes.coeff[s - 1][None],
            mask=planes.mask[s - 1][None])
        planes_wo = planes._replace(
            mask=planes.mask.at[s - 1].set(False))

        rng = np.random.default_rng(4)
        p0 = x_gt.p.at[s].add(jnp.asarray(rng.normal(0, 0.05, 3)))
        x0 = x_gt._replace(p=p0)
        prior = MG.PriorState.empty(s, jnp.float64)
        g_vec = jnp.asarray([0.0, 0.0, -G])

        x_extra, _ = SV.solve_window(
            x0, pres, g_vec, planes_wo, prior, None, s=s, max_iterations=8,
            opt_extrinsic=jnp.asarray(False), use_marg=jnp.asarray(False),
            planes_extra=extra)
        x_main, _ = SV.solve_window(
            x0, pres, g_vec, planes, prior, None, s=s, max_iterations=8,
            opt_extrinsic=jnp.asarray(False), use_marg=jnp.asarray(False))
        np.testing.assert_allclose(np.asarray(x_extra.p),
                                   np.asarray(x_main.p), atol=1e-9)
        np.testing.assert_allclose(np.asarray(x_extra.q),
                                   np.asarray(x_main.q), atol=1e-9)

    def test_marginalization_includes_extra(self):
        """Extra rows change the Schur prior (pivot is in every row)."""
        s = 3
        x_gt, pres, planes = _make_window_problem(s=s, f=24, noise=0.02, seed=6)
        extra = self._extra(s)
        prior = MG.PriorState.empty(s, jnp.float64)
        g_vec = jnp.asarray([0.0, 0.0, -G])
        pre01 = jax.tree.map(lambda a: a[0], pres)

        pr_with = SV.marginalize_pivot(
            x_gt, pre01, g_vec, planes, prior, s=s, planes_extra=extra)
        pr_without = SV.marginalize_pivot(
            x_gt, pre01, g_vec, planes, prior, s=s)
        assert not np.allclose(np.asarray(pr_with.lin_jac),
                               np.asarray(pr_without.lin_jac))
        # masked-out extra == no extra
        pr_masked = SV.marginalize_pivot(
            x_gt, pre01, g_vec, planes, prior, s=s,
            planes_extra=extra._replace(mask=jnp.zeros_like(extra.mask)))
        np.testing.assert_allclose(np.asarray(pr_masked.lin_jac),
                                   np.asarray(pr_without.lin_jac), atol=1e-12)
