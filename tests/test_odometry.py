"""Closed-loop scan-to-scan odometry test (the minimum end-to-end slice).

Simulates a moving sensor in the synthetic box world, runs the LOAM front
end + scan-to-scan odometry, and checks the recovered trajectory against
ground truth — the BASELINE config-1 scenario in miniature.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from lio_mapping_tpu.config import LioConfig
from lio_mapping_tpu.io import synthetic
from lio_mapping_tpu.models import odometry as O
from lio_mapping_tpu.models.point_processor import process_sweep


def _quat_wxyz_to_rot(q):
    return Rotation.from_quat(np.roll(np.asarray(q), -1))


class TestResiduals:
    def test_edge_residual_gradient(self, rng):
        """Direction n must be the unit gradient of distance w.r.t. p0."""
        p0 = jnp.asarray(rng.normal(size=3))
        p1 = jnp.asarray(rng.normal(size=3))
        p2 = jnp.asarray(rng.normal(size=3))

        def dist(p):
            d, _ = O._edge_residual(p, p1, p2)
            return d

        d, n = O._edge_residual(p0, p1, p2)
        g = jax.grad(dist)(p0)
        np.testing.assert_allclose(np.asarray(n), np.asarray(g), atol=1e-6)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(n)), 1.0, atol=1e-9)

    def test_plane_residual_signed_distance(self, rng):
        p1, p2, p3 = (jnp.asarray(rng.normal(size=3)) for _ in range(3))
        p0 = jnp.asarray(rng.normal(size=3))
        d, n = O._plane_residual(p0, p1, p2, p3)
        # moving p0 along -n by d lands on the plane
        p_proj = p0 - d * n
        d2, _ = O._plane_residual(p_proj, p1, p2, p3)
        np.testing.assert_allclose(float(d2), 0.0, atol=1e-9)


@pytest.mark.slow
class TestOdometryClosedLoop:
    def test_trajectory_recovery(self):
        cfg = LioConfig.indoor()
        traj = synthetic.Trajectory()
        n_sweeps = 10
        dt = cfg.sensor.scan_period

        state = O.init_state(cfg)
        step = jax.jit(lambda s, f: O.odometry_step(s, f, cfg))

        est_poses = []
        gt_poses = []
        for i in range(n_sweeps):
            t0 = i * dt
            xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=720)
            feats = process_sweep(jnp.asarray(xyz), jnp.asarray(mask), cfg)
            state, out = step(state, feats)
            # pose estimate corresponds to sweep END (t0 + dt)
            est_poses.append((np.asarray(out["pose"].q), np.asarray(out["pose"].t)))
            gt_poses.append(synthetic.gt_sensor_pose(traj, t0 + dt))

        # align: estimated frame == sensor frame at end of sweep 0
        q0_gt, p0_gt = gt_poses[0]
        r0_gt = _quat_wxyz_to_rot(q0_gt)
        q0_es, p0_es = est_poses[0]
        r0_es = _quat_wxyz_to_rot(q0_es)

        # absolute error w.r.t. first estimated frame (includes the
        # cold-start transient: sweep-0 target cloud is unskewed because no
        # velocity prior exists yet — same as the reference)
        errs_t, errs_r = [], []
        for (qe, pe), (qg, pg) in zip(est_poses[1:], gt_poses[1:]):
            re = r0_es.inv() * _quat_wxyz_to_rot(qe)
            te = r0_es.inv().apply(pe - p0_es)
            rg = r0_gt.inv() * _quat_wxyz_to_rot(qg)
            tg = r0_gt.inv().apply(pg - p0_gt)
            errs_t.append(np.linalg.norm(te - tg))
            errs_r.append(np.rad2deg((re.inv() * rg).magnitude()))
        rmse = float(np.sqrt(np.mean(np.square(errs_t))))
        assert rmse < 0.25, f"translation RMSE {rmse:.3f} m, errs={errs_t}"
        assert max(errs_r) < 4.0, f"rotation errs deg: {errs_r}"

        # per-step relative accuracy after warm-up: the real scan-to-scan
        # quality measure (motion is 10-26 cm per step)
        for i in range(2, len(est_poses)):
            qe0, pe0 = est_poses[i - 1]
            qe1, pe1 = est_poses[i]
            qg0, pg0 = gt_poses[i - 1]
            qg1, pg1 = gt_poses[i]
            te = _quat_wxyz_to_rot(qe0).inv().apply(pe1 - pe0)
            tg = _quat_wxyz_to_rot(qg0).inv().apply(pg1 - pg0)
            re = _quat_wxyz_to_rot(qe0).inv() * _quat_wxyz_to_rot(qe1)
            rg = _quat_wxyz_to_rot(qg0).inv() * _quat_wxyz_to_rot(qg1)
            assert np.linalg.norm(te - tg) < 0.08, f"step {i} rel err {np.linalg.norm(te - tg)}"
            assert np.rad2deg((re.inv() * rg).magnitude()) < 1.5
