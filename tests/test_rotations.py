"""Core rotation-math tests.

Mirrors the validation strategy of reference test/test_rotations.cc: check
quaternion conventions against rotation matrices, SO(3) exp/log round trips,
right-Jacobian identities (J_r^-1 J_r = I), Jacobian-predicted perturbations
vs ground truth, and left/right quaternion matrices.
"""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from lio_mapping_tpu.utils import quaternion as quat
from lio_mapping_tpu.utils import se3, so3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return np.asarray(quat.normalize(jnp.asarray(q)))


def scipy_from_wxyz(q):
    return Rotation.from_quat(np.roll(np.atleast_2d(q), -1, axis=-1))


class TestQuaternion:
    def test_qmul_matches_rotation_composition(self, rng):
        qa, qb = random_quats(rng, 5), random_quats(rng, 5)
        got = np.asarray(quat.to_matrix(quat.qmul(jnp.asarray(qa), jnp.asarray(qb))))
        want = scipy_from_wxyz(qa).as_matrix() @ scipy_from_wxyz(qb).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_rotate_matches_matrix(self, rng):
        q = random_quats(rng, 7)
        v = rng.normal(size=(7, 3))
        got = np.asarray(quat.rotate(jnp.asarray(q), jnp.asarray(v)))
        want = np.einsum("nij,nj->ni", scipy_from_wxyz(q).as_matrix(), v)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_from_matrix_roundtrip(self, rng):
        q = random_quats(rng, 50)
        m = quat.to_matrix(jnp.asarray(q))
        q2 = np.asarray(quat.from_matrix(m))
        # sign ambiguity
        dot = np.abs(np.sum(q * q2, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-9)

    def test_exp_log_roundtrip(self, rng):
        phi = rng.normal(size=(20, 3))
        q = quat.exp(jnp.asarray(phi))
        np.testing.assert_allclose(np.asarray(quat.log(q)), phi, atol=1e-9)

    def test_exp_matches_scipy(self, rng):
        phi = rng.normal(size=(10, 3))
        got = np.asarray(quat.to_matrix(quat.exp(jnp.asarray(phi))))
        want = Rotation.from_rotvec(phi).as_matrix()
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_left_right_matrices(self, rng):
        """LeftQuatMatrix/RightQuatMatrix identities in Eigen coeff order [x,y,z,w]."""
        qa, qb = random_quats(rng, 4), random_quats(rng, 4)
        prod = quat.qmul(jnp.asarray(qa), jnp.asarray(qb))
        coeffs = lambda q: jnp.concatenate([q[..., 1:4], q[..., 0:1]], axis=-1)
        via_left = jnp.einsum("nij,nj->ni", quat.left_matrix(jnp.asarray(qa)), coeffs(jnp.asarray(qb)))
        via_right = jnp.einsum("nij,nj->ni", quat.right_matrix(jnp.asarray(qb)), coeffs(jnp.asarray(qa)))
        np.testing.assert_allclose(np.asarray(via_left), np.asarray(coeffs(prod)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(via_right), np.asarray(coeffs(prod)), atol=1e-12)

    def test_slerp_endpoints_and_mid(self, rng):
        q0, q1 = jnp.asarray(random_quats(rng, 3)), jnp.asarray(random_quats(rng, 3))
        np.testing.assert_allclose(
            np.abs(np.sum(np.asarray(quat.slerp(q0, q1, jnp.zeros(3))) * np.asarray(q0), -1)),
            1.0, atol=1e-9)
        np.testing.assert_allclose(
            np.abs(np.sum(np.asarray(quat.slerp(q0, q1, jnp.ones(3))) * np.asarray(q1), -1)),
            1.0, atol=1e-9)
        mid = quat.slerp(q0, q1, jnp.full(3, 0.5))
        d0 = np.asarray(quat.angular_distance(q0, mid))
        d1 = np.asarray(quat.angular_distance(mid, q1))
        np.testing.assert_allclose(d0, d1, atol=1e-7)

    def test_ypr_roundtrip(self, rng):
        ypr = rng.uniform(-60, 60, size=(10, 3))
        m = quat.ypr_to_rot(jnp.asarray(ypr))
        back = np.asarray(quat.rot_to_ypr(m))
        np.testing.assert_allclose(back, ypr, atol=1e-9)

    def test_angular_distance(self, rng):
        q = random_quats(rng, 5)
        phi = rng.normal(size=(5, 3)) * 0.3
        q2 = quat.qmul(jnp.asarray(q), quat.exp(jnp.asarray(phi)))
        d = np.asarray(quat.angular_distance(jnp.asarray(q), q2))
        np.testing.assert_allclose(d, np.linalg.norm(phi, axis=-1), atol=1e-9)


class TestSO3Jacobians:
    def test_right_jacobian_inverse_identity(self, rng):
        """RightJacobianInverse * RightJacobian == I (test_rotations.cc:215-249)."""
        phi = rng.normal(size=(10, 3))
        jr = so3.right_jacobian(jnp.asarray(phi))
        jri = so3.right_jacobian_inverse(jnp.asarray(phi))
        np.testing.assert_allclose(
            np.asarray(jri @ jr), np.broadcast_to(np.eye(3), (10, 3, 3)), atol=1e-9)

    def test_right_jacobian_perturbation(self, rng):
        """exp(phi + dphi) ~= exp(phi) exp(J_r(phi) dphi) to first order."""
        phi = rng.normal(size=(3,))
        dphi = rng.normal(size=(3,)) * 1e-6
        jr = np.asarray(so3.right_jacobian(jnp.asarray(phi)))
        r = Rotation.from_rotvec(phi) * Rotation.from_rotvec(jr @ dphi)
        np.testing.assert_allclose(r.as_rotvec(), phi + dphi, atol=1e-10)

    def test_right_jacobian_inverse_is_dlog(self, rng):
        """J_r^-1(phi) == d/d_eps log(exp(phi) exp(eps)) at eps=0 (numeric)."""
        phi = rng.normal(size=(3,))
        eps = 1e-7
        jnum = np.zeros((3, 3))
        for i in range(3):
            e = np.zeros(3)
            e[i] = eps
            jnum[:, i] = ((Rotation.from_rotvec(phi) * Rotation.from_rotvec(e)).as_rotvec() - phi) / eps
        jri = np.asarray(so3.right_jacobian_inverse(jnp.asarray(phi)))
        np.testing.assert_allclose(jri, jnum, atol=1e-6)

    def test_exp_log_matrix(self, rng):
        phi = rng.normal(size=(10, 3))
        m = so3.exp_matrix(jnp.asarray(phi))
        np.testing.assert_allclose(np.asarray(so3.log_matrix(m)), phi, atol=1e-8)


class TestPose:
    def test_compose_inverse(self, rng):
        a = se3.Pose(jnp.asarray(random_quats(rng, 4)), jnp.asarray(rng.normal(size=(4, 3))))
        b = se3.Pose(jnp.asarray(random_quats(rng, 4)), jnp.asarray(rng.normal(size=(4, 3))))
        ab = a @ b
        ident = ab @ ab.inverse()
        np.testing.assert_allclose(np.asarray(ident.t), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.abs(np.asarray(ident.q)[:, 0]), 1.0, atol=1e-12)

    def test_apply_matches_matrix(self, rng):
        p = se3.Pose(jnp.asarray(random_quats(rng, 2)), jnp.asarray(rng.normal(size=(2, 3))))
        pts = jnp.asarray(rng.normal(size=(2, 6, 3)))
        got = np.asarray(p.apply(pts))
        m = np.asarray(p.matrix())
        want = np.einsum("bij,bnj->bni", m[:, :3, :3], np.asarray(pts)) + m[:, None, :3, 3]
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_compose_matches_reference_twist(self, rng):
        """Twist::operator* : (q1,t1)*(q2,t2) = (q1 q2, q1 t2 + t1)."""
        q1, q2 = random_quats(rng, 1)[0], random_quats(rng, 1)[0]
        t1, t2 = rng.normal(size=3), rng.normal(size=3)
        p = se3.Pose(jnp.asarray(q1), jnp.asarray(t1)) @ se3.Pose(jnp.asarray(q2), jnp.asarray(t2))
        want_q = scipy_from_wxyz(q1) * scipy_from_wxyz(q2)
        want_t = scipy_from_wxyz(q1).apply(t2).ravel() + t1
        np.testing.assert_allclose(np.asarray(p.t), want_t, atol=1e-12)
        np.testing.assert_allclose(
            np.abs(np.sum(np.asarray(p.q) * np.roll(want_q.as_quat(), 1))), 1.0, atol=1e-12)
