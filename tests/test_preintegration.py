"""Preintegration + factor-Jacobian tests.

Tier (a)/(b) of the reference test strategy (SURVEY §4): analytic-vs-numeric
Jacobian checks for every factor (the ``Check()`` pattern, via jax.jacfwd)
and ground-truth closed-loop checks of the midpoint integrator against the
analytic synthetic trajectory.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from lio_mapping_tpu.io import synthetic
from lio_mapping_tpu.ops import factors as FA
from lio_mapping_tpu.ops import preintegration as PI
from lio_mapping_tpu.utils import quaternion as quat

G = 9.805


def make_samples(traj, t0, t1, rate=200.0, dtype=jnp.float64):
    ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t1, rate)
    a0, w0 = traj.imu(t0)
    n = len(ts)
    dts = np.diff(np.concatenate([[t0], ts]))
    cap = n
    return PI.ImuSamples(
        acc0=jnp.asarray(a0, dtype), gyr0=jnp.asarray(w0, dtype),
        dt=jnp.asarray(dts, dtype),
        acc=jnp.asarray(acc, dtype), gyr=jnp.asarray(gyr, dtype))


def gt_state(traj, t):
    rot, p, v, _, _ = traj.pose(t)
    return jnp.asarray(np.roll(rot.as_quat(), 1)), jnp.asarray(p), jnp.asarray(v)


@pytest.fixture(scope="module")
def pim():
    traj = synthetic.Trajectory()
    noise18 = PI.noise_matrix(0.2, 0.02, 2e-4, 2e-5, dtype=jnp.float64)
    samples = make_samples(traj, 0.3, 0.8)
    ba = jnp.zeros(3, jnp.float64)
    bg = jnp.zeros(3, jnp.float64)
    pre = PI.integrate(samples, ba, bg, noise18)
    return traj, samples, pre, noise18


class TestMidpointIntegration:
    def test_deltas_match_ground_truth(self, pim):
        traj, samples, pre, _ = pim
        t0, t1 = 0.3, 0.8
        q0, p0, v0 = gt_state(traj, t0)
        q1, p1, v1 = gt_state(traj, t1)
        dt = t1 - t0
        g = jnp.asarray([0.0, 0.0, -G])
        r0 = Rotation.from_quat(np.roll(np.array(q0), -1))

        want_dp = r0.inv().apply(np.array(p1 - p0 - v0 * dt - 0.5 * g * dt * dt))
        want_dv = r0.inv().apply(np.array(v1 - v0 - g * dt))
        want_dq = (r0.inv() * Rotation.from_quat(np.roll(np.array(q1), -1))).as_quat()

        np.testing.assert_allclose(np.asarray(pre.delta_p), want_dp, atol=2e-4)
        np.testing.assert_allclose(np.asarray(pre.delta_v), want_dv, atol=2e-4)
        got_dq = np.roll(np.asarray(pre.delta_q), -1)
        assert abs(np.dot(got_dq, want_dq)) > 1 - 1e-7

    def test_padding_is_noop(self, pim):
        traj, samples, pre, noise18 = pim
        padded = PI.ImuSamples(
            acc0=samples.acc0, gyr0=samples.gyr0,
            dt=jnp.concatenate([samples.dt, jnp.zeros(7, jnp.float64)]),
            acc=jnp.concatenate([samples.acc, jnp.ones((7, 3), jnp.float64)]),
            gyr=jnp.concatenate([samples.gyr, jnp.ones((7, 3), jnp.float64)]),
        )
        pre2 = PI.integrate(padded, jnp.zeros(3, jnp.float64), jnp.zeros(3, jnp.float64), noise18)
        np.testing.assert_allclose(np.asarray(pre2.delta_p), np.asarray(pre.delta_p), atol=1e-12)
        np.testing.assert_allclose(np.asarray(pre2.covariance), np.asarray(pre.covariance), atol=1e-15)

    def test_integrate_mean_matches_integrate(self, pim):
        """integrate_mean (the skipped-cadence predict path,
        pipeline.py::predict) must produce the SAME mean deltas as the
        full integrator — with and without padding, at nonzero biases —
        and an identity bias-Jacobian so a stray downstream evaluate()
        degrades gracefully instead of zeroing bias corrections
        (ADVICE r3)."""
        traj, samples, pre, noise18 = pim
        ba = jnp.asarray([0.01, -0.02, 0.03], jnp.float64)
        bg = jnp.asarray([0.002, 0.001, -0.003], jnp.float64)
        full = PI.integrate(samples, ba, bg, noise18)
        padded = PI.ImuSamples(
            acc0=samples.acc0, gyr0=samples.gyr0,
            dt=jnp.concatenate([samples.dt, jnp.zeros(7, jnp.float64)]),
            acc=jnp.concatenate([samples.acc, jnp.ones((7, 3), jnp.float64)]),
            gyr=jnp.concatenate([samples.gyr, jnp.ones((7, 3), jnp.float64)]),
        )
        for s in (samples, padded):
            mean = PI.integrate_mean(s, ba, bg)
            np.testing.assert_allclose(np.asarray(mean.delta_p),
                                       np.asarray(full.delta_p), atol=1e-12)
            np.testing.assert_allclose(np.asarray(mean.delta_v),
                                       np.asarray(full.delta_v), atol=1e-12)
            np.testing.assert_allclose(np.asarray(mean.delta_q),
                                       np.asarray(full.delta_q), atol=1e-12)
            np.testing.assert_allclose(float(mean.sum_dt), float(full.sum_dt),
                                       atol=1e-12)
            np.testing.assert_array_equal(np.asarray(mean.jacobian), np.eye(15))

    def test_bias_jacobian_vs_repropagation(self, pim):
        """jacobian_ predicts delta change under bias perturbation
        (the Repropagate cross-check)."""
        traj, samples, pre, noise18 = pim
        eps = 1e-6
        for k in range(3):
            dbg = np.zeros(3)
            dbg[k] = eps
            pre2 = PI.integrate(samples, jnp.zeros(3, jnp.float64), jnp.asarray(dbg), noise18)
            # dp/dbg
            want = (np.asarray(pre2.delta_p) - np.asarray(pre.delta_p)) / eps
            got = np.asarray(pre.jacobian[PI.O_P:PI.O_P + 3, PI.O_BG + k])
            np.testing.assert_allclose(got, want, atol=2e-3)
            # dv/dbg
            want = (np.asarray(pre2.delta_v) - np.asarray(pre.delta_v)) / eps
            got = np.asarray(pre.jacobian[PI.O_V:PI.O_V + 3, PI.O_BG + k])
            np.testing.assert_allclose(got, want, atol=2e-3)
            # dq/dbg: 2*vec(dq0^-1 dq_eps)/eps
            dq = quat.qmul(quat.conjugate(pre.delta_q), pre2.delta_q)
            want = 2.0 * np.asarray(dq[1:4]) / eps
            got = np.asarray(pre.jacobian[PI.O_R:PI.O_R + 3, PI.O_BG + k])
            np.testing.assert_allclose(got, want, atol=2e-3)

    def test_batched_matches_sequential(self, pim):
        """The log-depth associative-scan integrate must reproduce the
        reference-shaped sequential scan to float rounding — deltas,
        bias Jacobian, and covariance alike (including interior padding)."""
        traj, samples, _, noise18 = pim
        ba = jnp.asarray([0.02, -0.01, 0.03], jnp.float64)
        bg = jnp.asarray([-0.002, 0.001, 0.004], jnp.float64)
        # inject interior + trailing padding rows
        n = samples.dt.shape[0]
        dt = jnp.concatenate([samples.dt[:n // 2], jnp.zeros(3, jnp.float64),
                              samples.dt[n // 2:], jnp.zeros(4, jnp.float64)])
        acc = jnp.concatenate([samples.acc[:n // 2], jnp.full((3, 3), 7.0, jnp.float64),
                               samples.acc[n // 2:], jnp.full((4, 3), -3.0, jnp.float64)])
        gyr = jnp.concatenate([samples.gyr[:n // 2], jnp.full((3, 3), 5.0, jnp.float64),
                               samples.gyr[n // 2:], jnp.full((4, 3), 2.0, jnp.float64)])
        padded = PI.ImuSamples(acc0=samples.acc0, gyr0=samples.gyr0, dt=dt, acc=acc, gyr=gyr)

        a = PI.integrate(padded, ba, bg, noise18)
        b = PI.integrate_sequential(padded, ba, bg, noise18)
        np.testing.assert_allclose(np.asarray(a.delta_p), np.asarray(b.delta_p), atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.delta_q), np.asarray(b.delta_q), atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.delta_v), np.asarray(b.delta_v), atol=1e-12)
        np.testing.assert_allclose(np.asarray(a.jacobian), np.asarray(b.jacobian), atol=1e-11)
        np.testing.assert_allclose(np.asarray(a.covariance), np.asarray(b.covariance),
                                   rtol=1e-9, atol=1e-18)
        np.testing.assert_allclose(float(a.sum_dt), float(b.sum_dt), atol=1e-14)

    def test_apply_deltas_matches_world_propagation(self, pim):
        """apply_deltas == the sequential world-frame midpoint propagation
        (Estimator.cc:387-394)."""
        from lio_mapping_tpu.models.estimator import propagate_world

        traj, samples, pre, noise18 = pim
        q0, p0, v0 = gt_state(traj, 0.3)
        g = jnp.asarray([0.0, 0.0, -G])
        z = jnp.zeros(3, jnp.float64)
        q_a, p_a, v_a = PI.apply_deltas(pre, q0, p0, v0, g)
        q_b, p_b, v_b = propagate_world(q0, p0, v0, z, z, g, samples)
        assert abs(float(jnp.dot(q_a, q_b))) > 1 - 1e-12
        # 1e-7-level agreement: propagate_world rotates un_acc_1 by the
        # normalized quaternion while the preintegration (like the
        # reference, IntegrationBase.h:137-141) uses the pre-normalization
        # product — a per-step |dq|-1 ~ theta^2/8 difference, far below the
        # midpoint scheme's own truncation error.
        np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-6)
        np.testing.assert_allclose(np.asarray(v_a), np.asarray(v_b), atol=1e-6)

    def test_euler_scheme_agrees_with_midpoint(self, pim):
        """The alternative first-order Euler scheme (IntegrationBase.h:211-276)
        agrees with the midpoint scheme to first order on a smooth
        trajectory, with a PSD covariance of the same magnitude."""
        traj, samples, pre_mid, _ = pim
        ba = jnp.zeros(3, jnp.float64)
        bg = jnp.zeros(3, jnp.float64)
        noise12 = PI.noise_matrix_euler(0.2, 0.02, 2e-4, 2e-5, jnp.float64)
        pre_eu = PI.integrate_euler(samples, ba, bg, noise12)

        assert abs(float(jnp.dot(pre_eu.delta_q, pre_mid.delta_q))) > 1 - 1e-6
        np.testing.assert_allclose(
            np.asarray(pre_eu.delta_p), np.asarray(pre_mid.delta_p), atol=2e-2)
        np.testing.assert_allclose(
            np.asarray(pre_eu.delta_v), np.asarray(pre_mid.delta_v), atol=5e-2)
        np.testing.assert_allclose(
            float(pre_eu.sum_dt), float(pre_mid.sum_dt), atol=1e-14)
        cov = np.asarray(pre_eu.covariance)
        w = np.linalg.eigvalsh(0.5 * (cov + cov.T))
        assert w.min() > -1e-16
        # same order of magnitude as the midpoint covariance
        ratio = np.trace(cov) / np.trace(np.asarray(pre_mid.covariance))
        assert 0.1 < ratio < 10.0

    def test_covariance_psd_and_growing(self, pim):
        _, _, pre, _ = pim
        cov = np.asarray(pre.covariance)
        vals = np.linalg.eigvalsh(0.5 * (cov + cov.T))
        assert vals.min() > -1e-12
        assert np.trace(cov) > 0

    def test_evaluate_zero_at_ground_truth(self, pim):
        traj, _, pre, _ = pim
        q0, p0, v0 = gt_state(traj, 0.3)
        q1, p1, v1 = gt_state(traj, 0.8)
        g = jnp.asarray([0.0, 0.0, -G])
        z = jnp.zeros(3, jnp.float64)
        res = PI.evaluate(pre, g, p0, q0, v0, z, z, p1, q1, v1, z, z)
        np.testing.assert_allclose(np.asarray(res), 0.0, atol=5e-4)


class TestImuFactorJacobians:
    def _perturbed_residual(self, pre, g, states):
        """Residual as a function of 30-dim local perturbation."""
        p_i, q_i, v_i, ba_i, bg_i, p_j, q_j, v_j, ba_j, bg_j = states
        sqrt_info = FA.sqrt_info_from_covariance(pre.covariance)

        def f(dx):
            dpi, dti, dsbi = dx[0:3], dx[3:6], dx[6:15]
            dpj, dtj, dsbj = dx[15:18], dx[18:21], dx[21:30]
            res = PI.evaluate(
                pre, g,
                p_i + dpi, quat.qmul(q_i, quat.exp(dti)),
                v_i + dsbi[0:3], ba_i + dsbi[3:6], bg_i + dsbi[6:9],
                p_j + dpj, quat.qmul(q_j, quat.exp(dtj)),
                v_j + dsbj[0:3], ba_j + dsbj[3:6], bg_j + dsbj[6:9])
            return sqrt_info @ res

        return f

    def test_analytic_matches_autodiff(self, pim):
        traj, _, pre, _ = pim
        q0, p0, v0 = gt_state(traj, 0.3)
        q1, p1, v1 = gt_state(traj, 0.8)
        # perturb away from GT so residual is nonzero
        rng = np.random.default_rng(1)
        p1 = p1 + jnp.asarray(rng.normal(0, 0.05, 3))
        q1 = quat.qmul(q1, quat.exp(jnp.asarray(rng.normal(0, 0.02, 3))))
        ba = jnp.asarray(rng.normal(0, 0.05, 3))
        bg = jnp.asarray(rng.normal(0, 0.005, 3))
        g = jnp.asarray([0.0, 0.0, -G])

        states = (p0, q0, v0, ba, bg, p1, q1, v1, ba, bg)
        res, (jp_i, jsb_i, jp_j, jsb_j) = FA.imu_factor(pre, g, *states)

        f = self._perturbed_residual(pre, g, states)
        j_num = jax.jacfwd(f)(jnp.zeros(30, jnp.float64))

        np.testing.assert_allclose(np.asarray(res), np.asarray(f(jnp.zeros(30))), atol=1e-10)
        # VINS analytic Jacobians are first-order in the bias-correction
        # terms (reference uses them as-is); whitening scales rows to
        # O(100), so compare with mixed relative/absolute tolerance.
        # jsb_i carries the bias-correction approximation (few % at
        # |bg| ~ 5e-3); the pose blocks are near-exact.
        for ja, sl, tol in [(jp_i, slice(0, 6), 1e-4), (jsb_i, slice(6, 15), 5e-2),
                            (jp_j, slice(15, 21), 1e-4), (jsb_j, slice(21, 30), 1e-6)]:
            jn = np.asarray(j_num[:, sl])
            err = np.abs(np.asarray(ja) - jn) / (1.0 + np.abs(jn))
            assert err.max() < tol, f"block {sl}: max scaled err {err.max()}"


class TestPivotPointPlaneJacobians:
    def test_analytic_matches_autodiff(self, rng):
        point = jnp.asarray(rng.normal(size=3))
        w = rng.normal(size=3)
        w = w / np.linalg.norm(w)
        coeff = jnp.asarray(np.concatenate([w, [rng.normal()]]))

        q_pivot = quat.exp(jnp.asarray(rng.normal(0, 0.5, 3)))
        p_pivot = jnp.asarray(rng.normal(size=3))
        q_i = quat.exp(jnp.asarray(rng.normal(0, 0.5, 3)))
        p_i = jnp.asarray(rng.normal(size=3))
        q_lb = quat.exp(jnp.asarray(rng.normal(0, 0.2, 3)))
        t_lb = jnp.asarray(rng.normal(size=3) * 0.1)

        res, (j_pivot, j_i, j_ex) = FA.pivot_point_plane_factor(
            point, coeff, p_pivot, q_pivot, p_i, q_i, t_lb, q_lb)

        def f(dx):
            dpp, dtp = dx[0:3], dx[3:6]
            dpi, dti = dx[6:9], dx[9:12]
            dpe, dte = dx[12:15], dx[15:18]
            r, _ = FA.pivot_point_plane_factor(
                point, coeff,
                p_pivot + dpp, quat.qmul(q_pivot, quat.exp(dtp)),
                p_i + dpi, quat.qmul(q_i, quat.exp(dti)),
                t_lb + dpe, quat.qmul(q_lb, quat.exp(dte)))
            return r

        j_num = jax.jacfwd(f)(jnp.zeros(18, jnp.float64))
        np.testing.assert_allclose(np.asarray(j_pivot), np.asarray(j_num[0:6]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(j_i), np.asarray(j_num[6:12]), atol=1e-9)
        np.testing.assert_allclose(np.asarray(j_ex), np.asarray(j_num[12:18]), atol=1e-9)


class TestPriorFactor:
    def test_analytic_matches_autodiff(self, rng):
        q = quat.exp(jnp.asarray(rng.normal(0, 0.4, 3)))
        p = jnp.asarray(rng.normal(size=3))
        rot_prior = quat.exp(jnp.asarray(rng.normal(0, 0.4, 3)))
        pos_prior = jnp.asarray(rng.normal(size=3))

        res, jac = FA.prior_factor(p, q, pos_prior, rot_prior)

        def f(dx):
            r, _ = FA.prior_factor(
                p + dx[0:3], quat.qmul(q, quat.exp(dx[3:6])), pos_prior, rot_prior)
            return r

        j_num = jax.jacfwd(f)(jnp.zeros(6, jnp.float64))
        np.testing.assert_allclose(np.asarray(jac), np.asarray(j_num), atol=1e-9)


class TestCauchy:
    def test_matches_ceres_formulas(self):
        """Cauchy is concave (rho'' < 0), so Ceres' corrector reduces to the
        plain sqrt(rho') scaling for residual AND jacobian."""
        for s in [0.0, 0.3, 5.0]:
            rs, js = FA.cauchy_scaling(jnp.asarray(s), 1.0)
            rho1 = 1.0 / (1.0 + s)
            assert float(rs) == pytest.approx(np.sqrt(rho1))
            assert float(js) == pytest.approx(np.sqrt(rho1))


class TestImuGravityFactor:
    """ImuGravityFactor parity (include/factor/ImuGravityFactor.h:44-232)."""

    def test_residual_matches_imu_factor(self, pim):
        traj, _, pre, _ = pim
        q0, p0, v0 = gt_state(traj, 0.3)
        q1, p1, v1 = gt_state(traj, 0.8)
        z = jnp.zeros(3, jnp.float64)
        rng = np.random.default_rng(2)
        q_g = quat.exp(jnp.asarray(rng.normal(0, 0.05, 3)))
        states = (p0, q0, v0, z, z, p1, q1, v1, z, z)
        res, jacs = FA.imu_gravity_factor(pre, q_g, G, *states)
        g_vec = quat.rotate(q_g, jnp.asarray([0.0, 0.0, -G]))
        res_ref, jacs_ref = FA.imu_factor(pre, g_vec, *states)
        np.testing.assert_allclose(np.asarray(res), np.asarray(res_ref), atol=1e-12)
        for ja, jb in zip(jacs[:4], jacs_ref):
            np.testing.assert_array_equal(np.asarray(ja), np.asarray(jb))

    def test_gravity_jacobian_matches_autodiff(self, pim):
        traj, _, pre, _ = pim
        q0, p0, v0 = gt_state(traj, 0.3)
        q1, p1, v1 = gt_state(traj, 0.8)
        z = jnp.zeros(3, jnp.float64)
        rng = np.random.default_rng(2)
        q_g = quat.exp(jnp.asarray(rng.normal(0, 0.05, 3)))
        states = (p0, q0, v0, z, z, p1, q1, v1, z, z)
        _, jacs = FA.imu_gravity_factor(pre, q_g, G, *states)
        j_g = jacs[4]

        sqrt_info = FA.sqrt_info_from_covariance(pre.covariance)

        def f(dxy):
            qg2 = FA.gravity_boxplus(q_g, dxy)
            g = quat.rotate(qg2, jnp.asarray([0.0, 0.0, -G]))
            return sqrt_info @ PI.evaluate(pre, g, *states)

        j_num = jax.jacfwd(f)(jnp.zeros(2, jnp.float64))
        err = np.abs(np.asarray(j_g) - np.asarray(j_num)) / (1.0 + np.abs(np.asarray(j_num)))
        assert err.max() < 1e-6, err.max()
