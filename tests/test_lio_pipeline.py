"""Closed-loop tightly-coupled LIO test on the synthetic world.

The miniature version of BASELINE config 2: moving sensor + IMU in the box
world, full pipeline (front end -> odometry -> initializer -> sliding-window
estimator), trajectory checked against ground truth.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from lio_mapping_tpu.config import (EstimatorConfig, ImuConfig, LioConfig,
                                    OdometryConfig)
from lio_mapping_tpu.io import synthetic
from lio_mapping_tpu.models.pipeline import LioPipeline


def small_cfg() -> LioConfig:
    base = LioConfig.indoor()
    est = dataclasses.replace(
        base.estimator,
        window_size=5,
        opt_window_size=3,
        init_window_factor=1,
        odom_io=1,  # every-sweep cadence (the io_ratio test covers odom_io=2)
        estimate_extrinsic=0,
        opt_extrinsic=False,
        extrinsic_rotation=(1, 0, 0, 0, 1, 0, 0, 0, 1),
        extrinsic_translation=(0.0, 0.0, 0.0),
        surf_stack_cap=2048,
        local_map_filtered_cap=8192,
        features_per_frame_cap=2048,
        max_solver_iterations=8,
    )
    return dataclasses.replace(base, estimator=est)


def rot_of(q):
    return Rotation.from_quat(np.roll(np.array(q), -1))


@pytest.mark.slow
class TestLioClosedLoop:
    # The reference's USE_CORNER / FIX_MAP compile-time variants
    # (Estimator.h:55-56) as config flags. Both are commented out in the
    # shipped reference; FIX_MAP builds the local map at frozen
    # linearization poses (stale by construction), which costs ~1.7x ATE
    # on this synthetic sequence in isolation (measured 0.14 vs 0.084),
    # hence its looser bound. USE_CORNER alone matches the default.
    @pytest.mark.parametrize(
        "variant,tol",
        [("default", 0.1), ("corner", 0.1), ("corner_fixmap", 0.2)],
        ids=["default", "use_corner", "use_corner+fix_map"])
    def test_trajectory(self, variant, tol):
        cfg = small_cfg()
        if variant != "default":
            cfg = dataclasses.replace(
                cfg,
                estimator=dataclasses.replace(
                    cfg.estimator, use_corner=True,
                    fix_map=(variant == "corner_fixmap"),
                    corner_stack_cap=1024, local_map_corner_cap=4096))
        traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm)
        pipe = LioPipeline(cfg, dtype=jnp.float64)
        dt = cfg.sensor.scan_period
        n_sweeps = 16
        imu_rate = 200.0

        results = []
        for i in range(n_sweeps):
            t0 = i * dt
            xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=540)
            # IMU over (t_k-1 end, t_k end] where frame stamp = sweep end
            te_prev, te = t0 - dt + dt, t0 + dt  # (t0, t0+dt]
            ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, te, imu_rate)
            a0, w0 = traj.imu(t0)
            dts = np.diff(np.concatenate([[t0], ts]))
            samples = pipe.make_samples(dts, acc, gyr, a0, w0)
            out = pipe.process(xyz, mask, samples)
            results.append((t0 + dt, out))

        assert pipe.stage == "INITED", "initialization failed"

        # evaluate the INITED segment: laser pose vs GT, aligned at the
        # first INITED frame
        est, gt = [], []
        for t_end, out in results:
            if out["stage"] != "INITED" or "body_pose" not in out:
                continue
            est.append((np.array(out["laser_pose"].q), np.array(out["laser_pose"].t)))
            gt.append(synthetic.gt_sensor_pose(traj, t_end))

        assert len(est) >= 6
        q0e, p0e = est[0]
        q0g, p0g = gt[0]
        r0e, r0g = rot_of(q0e), rot_of(q0g)

        errs = []
        for (qe, pe), (qg, pg) in zip(est, gt):
            te = r0e.inv().apply(pe - p0e)
            tg = r0g.inv().apply(pg - p0g)
            errs.append(np.linalg.norm(te - tg))
        rmse = float(np.sqrt(np.mean(np.square(errs))))
        assert rmse < tol, f"LIO ATE RMSE {rmse:.3f} m, errs={errs}"

        # velocity estimate sanity at the last frame
        _, out = results[-1]
        v_est = np.array(out["velocity"])
        _, _, v_gt, _, _ = traj.pose(results[-1][0])
        # velocity error scales with the variant's pose tolerance
        assert np.linalg.norm(v_est - v_gt) < 3.0 * tol, (v_est, v_gt)


@pytest.mark.slow
class TestIoRatioCadence:
    def test_io_ratio_2_closed_loop(self):
        """Reference cadence (VERDICT r2 missing #3): with odom_io=2 the
        estimator consumes every 2nd sweep (PointOdometry.cc:725-729), the
        skipped sweeps' IMU accumulates into the next preintegration
        interval, and skipped sweeps emit IMU-predicted poses
        (/predict_laser_odom). The whole 10 Hz trajectory — consumed AND
        predicted frames — must still track ground truth."""
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg, estimator=dataclasses.replace(cfg.estimator, odom_io=2))
        traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm)
        pipe = LioPipeline(cfg, dtype=jnp.float64)
        dt = cfg.sensor.scan_period
        n_sweeps = 26
        imu_rate = 200.0

        results = []
        for i in range(n_sweeps):
            t0 = i * dt
            xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=540)
            ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, imu_rate)
            a0, w0 = traj.imu(t0)
            dts = np.diff(np.concatenate([[t0], ts]))
            samples = pipe.make_samples(dts, acc, gyr, a0, w0)
            out = pipe.process(xyz, mask, samples)
            results.append((t0 + dt, out))

        assert pipe.stage == "INITED", "initialization failed"

        est, gt, n_pred, n_full = [], [], 0, 0
        for t_end, out in results:
            if out["stage"] != "INITED":
                continue
            if out.get("predicted"):
                n_pred += 1
            elif "body_pose" in out:
                n_full += 1
            else:
                continue  # transition frame (scan-to-scan pose)
            est.append((np.array(out["laser_pose"].q), np.array(out["laser_pose"].t)))
            gt.append(synthetic.gt_sensor_pose(traj, t_end))

        # the cadence actually took effect: both kinds of INITED outputs
        assert n_pred >= 3 and n_full >= 4, (n_pred, n_full)
        q0e, p0e = est[0]
        q0g, p0g = gt[0]
        r0e, r0g = rot_of(q0e), rot_of(q0g)
        errs = []
        for (qe, pe), (qg, pg) in zip(est, gt):
            te = r0e.inv().apply(pe - p0e)
            tg = r0g.inv().apply(pg - p0g)
            errs.append(np.linalg.norm(te - tg))
        rmse = float(np.sqrt(np.mean(np.square(errs))))
        assert rmse < 0.15, f"io_ratio=2 ATE RMSE {rmse:.3f} m, errs={errs}"


@pytest.mark.slow
class TestPrefetchAndCadence:
    """Bench-loop paths (ADVICE r3): PrefetchedCloud processing must match
    the plain (xyz, mask) path pose-for-pose, and ``will_consume(1)``
    evaluated before each call must agree with the ``predicted`` flag the
    call actually returns (one cadence predicate, pipeline._is_compact)."""

    @pytest.mark.parametrize("mesh_n,ingest_shard",
                             [(0, False), (2, False), (2, True)],
                             ids=["single", "mesh2", "mesh2_ingest"])
    def test_prefetch_matches_plain_and_cadence_agrees(self, mesh_n,
                                                       ingest_shard):
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg, estimator=dataclasses.replace(cfg.estimator, odom_io=2))
        traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm)
        mesh = None
        if mesh_n:
            from lio_mapping_tpu.parallel import lio_dist

            mesh = lio_dist.make_mesh(mesh_n)
        # both pipelines share the mesh (or its absence): prefetch and
        # sharded ingest must be pure transport changes, and the sharded
        # program's psum ordering differs from single-device
        # (tests/test_lio_dist.py covers that)
        pipe_plain = LioPipeline(cfg, dtype=jnp.float32, mesh=mesh)
        pipe_pf = LioPipeline(cfg, dtype=jnp.float32, mesh=mesh,
                              ingest_shard=ingest_shard)
        dt = cfg.sensor.scan_period
        n_sweeps = 20

        n_pred = 0
        for i in range(n_sweeps):
            t0 = i * dt
            xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=540)
            ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, 200.0)
            a0, w0 = traj.imu(t0)
            dts = np.diff(np.concatenate([[t0], ts]))
            out1 = pipe_plain.process(
                xyz, mask, pipe_plain.make_samples(dts, acc, gyr, a0, w0))
            wc = pipe_pf.will_consume(1)
            pf = pipe_pf.prefetch_cloud(xyz, mask) if wc else None
            out2 = pipe_pf.process(
                pf if pf is not None else xyz,
                None if pf is not None else mask,
                pipe_pf.make_samples(dts, acc, gyr, a0, w0))
            assert wc == (not out2.get("predicted", False)), i
            if out2.get("predicted"):
                n_pred += 1
            np.testing.assert_allclose(
                np.asarray(out1["laser_pose"].t),
                np.asarray(out2["laser_pose"].t), atol=5e-4,
                err_msg=f"sweep {i} ({out1['stage']}/{out2['stage']})")
        assert pipe_plain.stage == "INITED" and pipe_pf.stage == "INITED"
        assert n_pred >= 3  # the cadence actually skipped sweeps


@pytest.mark.slow
class TestHostPredict:
    def test_host_predict_matches_device(self):
        """Skipped-cadence poses from the host-side numpy integrator
        (pipeline._host_predict_pose) must match the device predict
        program pose-for-pose — it exists purely to keep the device queue
        on ONE executable (no predict<->estimator switches)."""
        cfg = small_cfg()
        cfg = dataclasses.replace(
            cfg, estimator=dataclasses.replace(cfg.estimator, odom_io=2))
        traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm)
        p_dev = LioPipeline(cfg, dtype=jnp.float32, host_predict=False)
        p_host = LioPipeline(cfg, dtype=jnp.float32, host_predict=True)
        dt = cfg.sensor.scan_period

        n_host_pred = 0
        for i in range(20):
            t0 = i * dt
            xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=540)
            ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, 200.0)
            a0, w0 = traj.imu(t0)
            dts = np.diff(np.concatenate([[t0], ts]))
            o1 = p_dev.process(xyz, mask,
                               p_dev.make_samples(dts, acc, gyr, a0, w0))
            snap_live = p_host._snap is not None
            o2 = p_host.process(xyz, mask,
                                p_host.make_samples(dts, acc, gyr, a0, w0))
            if o2.get("predicted") and snap_live:
                n_host_pred += 1
                assert isinstance(o2["laser_pose"].t, np.ndarray)
            np.testing.assert_allclose(
                np.asarray(o1["laser_pose"].t),
                np.asarray(o2["laser_pose"].t), atol=5e-4, err_msg=f"sweep {i}")
            np.testing.assert_allclose(
                np.asarray(o1["laser_pose"].q),
                np.asarray(o2["laser_pose"].q), atol=5e-4, err_msg=f"sweep {i}")
        assert p_dev.stage == p_host.stage == "INITED"
        assert n_host_pred >= 3  # the host path actually ran


@pytest.mark.slow
class TestExtrinsicCalibration:
    def test_from_scratch_extrinsic_closed_loop(self):
        """BASELINE config 2's calibration path: estimate_extrinsic=2
        (hand-eye SVD bootstrap, Estimator.cc:520-531 + opt_extrinsic in
        the window solver) with a real laser->body offset in the
        simulator. The pipeline must initialize, recover the extrinsic
        ROTATION to a few degrees, and track the trajectory."""
        cfg = small_cfg()
        # true extrinsic: ~11 deg rotation + 12 cm offset
        r_true = Rotation.from_euler("ZYX", [0.15, 0.1, -0.08])
        q_true = np.roll(r_true.as_quat(), 1)
        t_true = np.array([0.08, -0.05, 0.06])
        cfg = dataclasses.replace(
            cfg,
            estimator=dataclasses.replace(
                cfg.estimator,
                estimate_extrinsic=2,
                opt_extrinsic=True,
                # start from identity rotation and the TRUE translation
                # (the hand-eye calibrates rotation only; translation
                # comes from config, as in the reference's yaml)
                extrinsic_rotation=(1, 0, 0, 0, 1, 0, 0, 0, 1),
                extrinsic_translation=tuple(t_true),
            ))
        # strong pitch/roll excitation: the hand-eye SVD gate needs
        # rotation about >=2 axes (ImuInitializer.cc:404-417 — the same
        # reason cli.py simulate defaults pitch/roll amplitude up)
        traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm,
                                    pitch_amp=0.4, roll_amp=0.35,
                                    rp_freq=0.45)
        pipe = LioPipeline(cfg, dtype=jnp.float64)
        dt = cfg.sensor.scan_period
        n_sweeps = 24
        ext = (q_true, t_true)

        results = []
        for i in range(n_sweeps):
            t0 = i * dt
            xyz, mask = synthetic.simulate_sweep(
                traj, t0, n_azimuth=540, extrinsic_lb=ext)
            ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, 200.0)
            a0, w0 = traj.imu(t0)
            dts = np.diff(np.concatenate([[t0], ts]))
            samples = pipe.make_samples(dts, acc, gyr, a0, w0)
            out = pipe.process(xyz, mask, samples)
            results.append((t0 + dt, out))

        assert pipe.stage == "INITED", "calibration bootstrap failed"

        # recovered extrinsic rotation within a few degrees of truth
        q_est = np.asarray(pipe.est_state.q_lb)
        r_est = rot_of(q_est)
        ang = np.rad2deg((r_est.inv() * r_true).magnitude())
        assert ang < 4.0, f"extrinsic rotation error {ang:.2f} deg"

        # trajectory still tracks (laser pose vs GT sensor pose)
        est, gt = [], []
        for t_end, out in results:
            if out["stage"] != "INITED" or "body_pose" not in out:
                continue
            est.append((np.array(out["laser_pose"].q), np.array(out["laser_pose"].t)))
            gt.append(synthetic.gt_sensor_pose(traj, t_end, extrinsic_lb=ext))
        assert len(est) >= 5
        q0e, p0e = est[0]
        q0g, p0g = gt[0]
        r0e, r0g = rot_of(q0e), rot_of(q0g)
        errs = []
        for (qe, pe), (qg, pg) in zip(est, gt):
            te = r0e.inv().apply(pe - p0e)
            tg = r0g.inv().apply(np.asarray(pg) - p0g)
            errs.append(np.linalg.norm(te - tg))
        rmse = float(np.sqrt(np.mean(np.square(errs))))
        # measured 0.22 m: the window is still refining the extrinsic
        # (started 11 deg off) over this short sequence — gate the
        # calibration transient against regression, not at steady-state
        assert rmse < 0.35, f"calibrated-extrinsic ATE {rmse:.3f} m, errs={errs}"


@pytest.mark.slow
class TestOutdoorProfile:
    def test_kaist_lever_closed_loop(self):
        """BASELINE config 3's shape: outdoor settings (window 7/5,
        odom_io 3, estimate_extrinsic=1, keep_features off) with the KAIST
        2.4 m laser->body lever arm and car-like attitude (gentle
        pitch/roll — the rig does not pitch +-23 deg; on an
        aggressive-wobble trajectory the lever whip costs ~5x ATE,
        measured 5.7 vs 1.1 m on-device)."""
        base = LioConfig.outdoor()
        cfg = dataclasses.replace(
            base,
            estimator=dataclasses.replace(
                base.estimator,
                surf_stack_cap=2048,
                local_map_filtered_cap=8192,
                features_per_frame_cap=2048,
                max_solver_iterations=8,
                # synthetic IMU has no transport delay and g = 9.805
                msg_time_delay=0.0,
                imu=dataclasses.replace(base.estimator.imu, g_norm=9.805),
            ))
        t_lb = np.array([-2.4, 0.0, 0.7])
        ext = (np.array([1.0, 0, 0, 0]), t_lb)
        traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm,
                                    pitch_amp=0.05, roll_amp=0.04)
        pipe = LioPipeline(cfg, dtype=jnp.float32)
        dt = cfg.sensor.scan_period
        n_sweeps = 60

        results = []
        for i in range(n_sweeps):
            t0 = i * dt
            xyz, mask = synthetic.simulate_sweep(
                traj, t0, n_azimuth=540, extrinsic_lb=ext)
            ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, 200.0)
            a0, w0 = traj.imu(t0)
            dts = np.diff(np.concatenate([[t0], ts]))
            out = pipe.process(xyz, mask,
                               pipe.make_samples(dts, acc, gyr, a0, w0))
            results.append((t0 + dt, out))

        assert pipe.stage == "INITED", "outdoor-profile init failed"
        est, gt = [], []
        for t_end, out in results:
            if out["stage"] != "INITED" or "laser_pose" not in out:
                continue
            if "body_pose" not in out and not out.get("predicted"):
                continue
            est.append((np.array(out["laser_pose"].q),
                        np.array(out["laser_pose"].t)))
            gt.append(synthetic.gt_sensor_pose(traj, t_end, extrinsic_lb=ext))
        assert len(est) >= 12
        q0e, p0e = est[0]
        q0g, p0g = gt[0]
        r0e, r0g = rot_of(q0e), rot_of(q0g)
        errs = []
        for (qe, pe), (qg, pg) in zip(est, gt):
            te = r0e.inv().apply(pe - p0e)
            tg = r0g.inv().apply(np.asarray(pg) - p0g)
            errs.append(np.linalg.norm(te - tg))
        rmse = float(np.sqrt(np.mean(np.square(errs))))
        # on-device 120-sweep figure: 0.343 m (full caps)
        assert rmse < 0.6, f"outdoor-profile ATE {rmse:.3f} m, errs={errs}"
