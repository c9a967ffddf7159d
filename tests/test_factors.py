"""Jacobian checks for the config-gated factor variants.

The reference's per-factor numeric ``Check()`` pattern (SURVEY §4 tier a),
via jax.jacfwd: PointDistanceFactor, PlaneProjectionFactor,
PlaneToPlaneFactor (+ PointNormalFeature covariance), gravity S^2
retraction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lio_mapping_tpu.ops import factors as FA
from lio_mapping_tpu.utils import quaternion as quat


def _rand_pose(rng, rot_scale=0.5, pos_scale=1.0):
    q = quat.exp(jnp.asarray(rng.normal(0, rot_scale, 3)))
    p = jnp.asarray(rng.normal(size=3) * pos_scale)
    return p, q


class TestPointDistanceFactor:
    def test_analytic_matches_autodiff(self, rng):
        point = jnp.asarray(rng.normal(size=3))
        w = rng.normal(size=3)
        w /= np.linalg.norm(w)
        coeff = jnp.asarray(np.concatenate([w, [rng.normal()]]))
        p_i, q_i = _rand_pose(rng)
        t_lb = jnp.asarray(rng.normal(size=3) * 0.1)
        q_lb = quat.exp(jnp.asarray(rng.normal(0, 0.2, 3)))

        res, (j_pose, j_ex) = FA.point_distance_factor(point, coeff, p_i, q_i, t_lb, q_lb)

        def f(dx):
            r, _ = FA.point_distance_factor(
                point, coeff,
                p_i + dx[0:3], quat.qmul(q_i, quat.exp(dx[3:6])),
                t_lb + dx[6:9], quat.qmul(q_lb, quat.exp(dx[9:12])))
            return r

        j_num = jax.jacfwd(f)(jnp.zeros(12, jnp.float64))
        np.testing.assert_allclose(np.asarray(j_pose), np.asarray(j_num[0:6]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(j_ex), np.asarray(j_num[6:12]), atol=1e-8)


class TestPlaneProjectionFactor:
    def test_analytic_matches_autodiff(self, rng):
        w_i = rng.normal(size=3)
        w_i /= np.linalg.norm(w_i)
        coeff_i = jnp.asarray(np.concatenate([w_i, [abs(rng.normal()) + 0.5]]))
        w_j = rng.normal(size=3)
        w_j /= np.linalg.norm(w_j)
        coeff_j = jnp.asarray(np.concatenate([w_j, [abs(rng.normal()) + 0.5]]))
        p_i, q_i = _rand_pose(rng, rot_scale=0.3)
        p_j, q_j = _rand_pose(rng, rot_scale=0.3)
        t_lb = jnp.asarray(rng.normal(size=3) * 0.1)
        q_lb = quat.exp(jnp.asarray(rng.normal(0, 0.2, 3)))
        score = 2.5

        res, (j_i, j_j, j_ex) = FA.plane_projection_factor(
            coeff_i, coeff_j, score, p_i, q_i, p_j, q_j, t_lb, q_lb)

        def f(dx):
            r, _ = FA.plane_projection_factor(
                coeff_i, coeff_j, score,
                p_i + dx[0:3], quat.qmul(q_i, quat.exp(dx[3:6])),
                p_j + dx[6:9], quat.qmul(q_j, quat.exp(dx[9:12])),
                t_lb + dx[12:15], quat.qmul(q_lb, quat.exp(dx[15:18])))
            return r

        np.testing.assert_allclose(np.asarray(res), np.asarray(f(jnp.zeros(18))), atol=1e-12)
        j_num = jax.jacfwd(f)(jnp.zeros(18, jnp.float64))
        np.testing.assert_allclose(np.asarray(j_i), np.asarray(j_num[:, 0:6]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(j_j), np.asarray(j_num[:, 6:12]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(j_ex), np.asarray(j_num[:, 12:18]), atol=1e-8)

    def test_zero_at_consistent_planes(self, rng):
        """Transported plane == plane refit in frame j -> zero residual."""
        p_i, q_i = _rand_pose(rng, rot_scale=0.3)
        p_j, q_j = _rand_pose(rng, rot_scale=0.3)
        t_lb = jnp.asarray(rng.normal(size=3) * 0.1)
        q_lb = quat.exp(jnp.asarray(rng.normal(0, 0.2, 3)))

        # a world plane, expressed in each laser frame
        n_w = rng.normal(size=3)
        n_w /= np.linalg.norm(n_w)
        b_w = 1.7

        def local_coeff(p, q):
            q_l = quat.qmul(q, quat.conjugate(q_lb))
            p_l = p - quat.rotate(q_l, t_lb)
            r_l = np.asarray(quat.to_matrix(q_l))
            w_loc = r_l.T @ n_w
            b_loc = n_w @ np.asarray(p_l) + b_w
            c = np.concatenate([w_loc, [b_loc]])
            return jnp.asarray(c if b_loc >= 0 else -c)

        res, _ = FA.plane_projection_factor(
            local_coeff(p_i, q_i), local_coeff(p_j, q_j), 1.0,
            p_i, q_i, p_j, q_j, t_lb, q_lb)
        np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-10)


class TestPlaneToPlaneFactor:
    def test_analytic_matches_autodiff(self, rng):
        n_b = rng.normal(size=3); n_b /= np.linalg.norm(n_b)
        n_a = rng.normal(size=3); n_a /= np.linalg.norm(n_a)
        cov_b = FA.point_normal_covariance(jnp.asarray(n_b))
        cov_a = FA.point_normal_covariance(jnp.asarray(n_a))
        p_b = jnp.asarray(rng.normal(size=3))
        p_a = jnp.asarray(rng.normal(size=3))
        p_i, q_i = _rand_pose(rng, rot_scale=0.3)
        p_j, q_j = _rand_pose(rng, rot_scale=0.3)
        t_lb = jnp.asarray(rng.normal(size=3) * 0.1)
        q_lb = quat.exp(jnp.asarray(rng.normal(0, 0.2, 3)))

        res, (j_i, j_j, j_ex) = FA.plane_to_plane_factor(
            p_b, cov_b, p_a, cov_a, p_i, q_i, p_j, q_j, t_lb, q_lb)

        def f(dx):
            r, _ = FA.plane_to_plane_factor(
                p_b, cov_b, p_a, cov_a,
                p_i + dx[0:3], quat.qmul(q_i, quat.exp(dx[3:6])),
                p_j + dx[6:9], quat.qmul(q_j, quat.exp(dx[9:12])),
                t_lb + dx[12:15], quat.qmul(q_lb, quat.exp(dx[15:18])))
            return r

        # the whitening matrix is state-dependent but treated as locally
        # constant (Gauss-Newton, as the reference does); stop_gradient in
        # the factor makes autodiff agree exactly.
        j_num = jax.jacfwd(f)(jnp.zeros(18, jnp.float64))
        np.testing.assert_allclose(np.asarray(j_i), np.asarray(j_num[:, 0:6]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(j_j), np.asarray(j_num[:, 6:12]), atol=1e-8)
        np.testing.assert_allclose(np.asarray(j_ex), np.asarray(j_num[:, 12:18]), atol=1e-8)

    def test_zero_residual_when_aligned(self, rng):
        """Same world point seen from both frames -> zero residual."""
        p_i, q_i = _rand_pose(rng, rot_scale=0.3)
        p_j, q_j = _rand_pose(rng, rot_scale=0.3)
        t_lb = jnp.asarray(rng.normal(size=3) * 0.1)
        q_lb = quat.exp(jnp.asarray(rng.normal(0, 0.2, 3)))
        x_w = jnp.asarray(rng.normal(size=3) * 2)

        def to_local(p, q):
            q_l = quat.qmul(q, quat.conjugate(q_lb))
            p_l = p - quat.rotate(q_l, t_lb)
            return quat.rotate(quat.conjugate(q_l), x_w - p_l)

        n = jnp.asarray([0.0, 0.0, 1.0])
        cov = FA.point_normal_covariance(n)
        res, _ = FA.plane_to_plane_factor(
            to_local(p_i, q_i), cov, to_local(p_j, q_j), cov,
            p_i, q_i, p_j, q_j, t_lb, q_lb)
        np.testing.assert_allclose(np.asarray(res), 0.0, atol=1e-10)


class TestPointNormalCovariance:
    def test_normal_direction_has_small_variance(self, rng):
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        c = np.asarray(FA.point_normal_covariance(jnp.asarray(n)))
        np.testing.assert_allclose(n @ c @ n, 0.001, atol=1e-9)
        # tangent directions keep unit variance
        t = np.cross(n, [1.0, 0.3, -0.2])
        t /= np.linalg.norm(t)
        np.testing.assert_allclose(t @ c @ t, 1.0, atol=1e-9)

    def test_antiparallel_normal(self):
        c = np.asarray(FA.point_normal_covariance(jnp.asarray([-1.0, 0.0, 0.0])))
        np.testing.assert_allclose(c[0, 0], 0.001, atol=1e-6)


class TestGravityBoxplus:
    def test_keeps_unit_norm_and_moves_xy_only(self, rng):
        q = quat.exp(jnp.asarray(rng.normal(0, 0.5, 3)))
        d = jnp.asarray(rng.normal(0, 0.1, 2))
        q2 = FA.gravity_boxplus(q, d)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(q2)), 1.0, atol=1e-12)
        dq = quat.qmul(quat.conjugate(q), q2)
        # z-component of the local rotation stays zero
        np.testing.assert_allclose(float(dq[3]), 0.0, atol=1e-12)
