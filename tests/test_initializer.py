"""Initializer unit tests: hand-eye extrinsic rotation, gyro bias, gravity."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from lio_mapping_tpu.io import synthetic
from lio_mapping_tpu.models import initializer as INIT
from lio_mapping_tpu.ops import preintegration as PI
from lio_mapping_tpu.utils import quaternion as quat

from tests.test_preintegration import make_samples, gt_state


def _window_data(n_frames=13, bg_true=np.zeros(3), q_lb=None, traj=None, dt=0.12):
    """Laser transforms + preintegrations from the synthetic trajectory."""
    if traj is None:
        traj = synthetic.Trajectory()
    times = [0.2 + dt * i for i in range(n_frames)]
    noise18 = PI.noise_matrix(0.2, 0.02, 2e-4, 2e-5, dtype=jnp.float64)

    laser_q, laser_p = [], []
    for t in times:
        q, p, v = gt_state(traj, t)
        if q_lb is not None:
            # laser pose: T_li = T_bi * T_lb^-1
            q_li = quat.qmul(q, quat.conjugate(jnp.asarray(q_lb)))
            laser_q.append(np.asarray(q_li))
            laser_p.append(np.asarray(p))  # t_lb = 0 for these tests
        else:
            laser_q.append(np.asarray(q))
            laser_p.append(np.asarray(p))

    pres = []
    for i in range(n_frames - 1):
        samples = make_samples(traj, times[i], times[i + 1])
        # inject a constant gyro bias into the measurements
        samples = samples._replace(gyr=samples.gyr + jnp.asarray(bg_true),
                                   gyr0=samples.gyr0 + jnp.asarray(bg_true))
        pres.append(PI.integrate(samples, jnp.zeros(3, jnp.float64),
                                 jnp.zeros(3, jnp.float64), noise18))
    return np.stack(laser_q), np.stack(laser_p), pres


class TestExtrinsicRotation:
    def test_recovers_known_rotation(self):
        # hand-eye needs rotation about >=2 axes; the default trajectory is
        # nearly yaw-only (the reference's gate would likewise keep waiting
        # for excitation, ImuInitializer.cc:404-417), so excite roll/pitch.
        traj = synthetic.Trajectory(yaw_amp=0.8, pitch_amp=0.45, roll_amp=0.4,
                                    rp_freq=0.45)
        q_lb = np.asarray(quat.exp(jnp.asarray([0.2, -0.1, 0.3])))
        laser_q, _, pres = _window_data(q_lb=q_lb, traj=traj, n_frames=16, dt=0.25)
        imu_dq = np.stack([np.asarray(p.delta_q) for p in pres])
        got, ok = INIT.estimate_extrinsic_rotation(
            laser_q, imu_dq, np.array([1.0, 0, 0, 0]))
        assert ok
        err = np.rad2deg(float(quat.angular_distance(jnp.asarray(got), jnp.asarray(q_lb))))
        assert err < 1.0, f"extrinsic rotation error {err} deg"


class TestGyroBias:
    def test_recovers_injected_bias(self):
        bg_true = np.array([0.01, -0.02, 0.015])
        laser_q, _, pres = _window_data(bg_true=bg_true)
        jacs = [np.asarray(p.jacobian) for p in pres]
        dqs = [np.asarray(p.delta_q) for p in pres]
        dbg = INIT.estimate_gyro_bias(laser_q, jacs, dqs)
        np.testing.assert_allclose(dbg, bg_true, atol=2e-3)


class TestGravity:
    def test_approximate_and_refine(self):
        laser_q, laser_p, pres = _window_data()
        sum_dts = np.array([float(p.sum_dt) for p in pres])
        delta_ps = np.stack([np.asarray(p.delta_p) for p in pres])
        delta_vs = np.stack([np.asarray(p.delta_v) for p in pres])
        q_lb = np.array([1.0, 0, 0, 0])
        t_lb = np.zeros(3)

        g, ok = INIT.approximate_gravity(
            laser_p, laser_q, q_lb, t_lb, sum_dts, delta_ps, delta_vs, 9.805)
        assert ok
        np.testing.assert_allclose(g, [0, 0, -9.805], atol=0.35)

        vels, g_ref, r_wi = INIT.refine_gravity_acc_bias(
            laser_p, laser_q, q_lb, t_lb, sum_dts, delta_ps, delta_vs, g, 9.805)
        np.testing.assert_allclose(g_ref, [0, 0, -9.805], atol=0.05)
        # velocities close to ground truth
        traj = synthetic.Trajectory()
        for i, t in enumerate([0.2 + 0.12 * k for k in range(len(laser_p))]):
            _, _, v_gt, _, _ = traj.pose(t)
            assert np.linalg.norm(vels[i] - v_gt) < 0.15
