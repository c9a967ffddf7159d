"""Runtime auxiliaries: LOAM baseline pipeline, checkpoint/resume,
crop-box self-filter, stage timing.

Covers the reference's baseline launch graph (16_scans_test.launch:
processor -> odometry -> mapping, no IMU), the input_filters_node crop box,
the TicToc instrumentation, and the net-new checkpoint/resume subsystem.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lio_mapping_tpu.config import LioConfig
from lio_mapping_tpu.io import synthetic
from lio_mapping_tpu.models.pipeline import LioPipeline, LoamPipeline
from lio_mapping_tpu.ops.cloud import (KAIST_SELF_FILTER_ROTATION,
                                       crop_box_filter)
from lio_mapping_tpu.utils.timing import StageTimer, device_trace


def loam_cfg() -> LioConfig:
    # same scale as tests/test_mapping.py::small_cfg (CPU compile budget)
    base = LioConfig.indoor()
    m = dataclasses.replace(base.mapping, cube_point_cap=256)
    est = dataclasses.replace(
        base.estimator, surf_stack_cap=4096, corner_stack_cap=1024)
    return dataclasses.replace(base, mapping=m, estimator=est)


class TestCropBoxFilter:
    def test_negative_removes_inside(self):
        xyz = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.5, 0.5, 0.5]])
        mask = jnp.asarray([True, True, True])
        out = crop_box_filter(xyz, mask, (-1, -1, -1), (1, 1, 1))
        assert np.array_equal(np.asarray(out), [False, True, False])

    def test_positive_keeps_inside(self):
        xyz = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
        mask = jnp.asarray([True, True])
        out = crop_box_filter(xyz, mask, (-1, -1, -1), (1, 1, 1), negative=False)
        assert np.array_equal(np.asarray(out), [True, False])

    def test_rotation_applied_to_containment(self):
        # 90 deg about z maps (2,0,0) -> (0,2,0): a box tight around
        # (0,2,0) must catch it only when the rotation is applied.
        rz = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        xyz = jnp.asarray([[2.0, 0.0, 0.0]])
        mask = jnp.asarray([True])
        hit = crop_box_filter(xyz, mask, (-0.1, 1.9, -0.1), (0.1, 2.1, 0.1),
                              rotation=rz)
        miss = crop_box_filter(xyz, mask, (-0.1, 1.9, -0.1), (0.1, 2.1, 0.1))
        assert not bool(hit[0]) and bool(miss[0])

    def test_kaist_rotation_orthonormal(self):
        r = np.asarray(KAIST_SELF_FILTER_ROTATION)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-6)

    def test_respects_existing_mask(self):
        xyz = jnp.asarray([[5.0, 5.0, 5.0], [6.0, 6.0, 6.0]])
        mask = jnp.asarray([True, False])
        out = crop_box_filter(xyz, mask, (-1, -1, -1), (1, 1, 1))
        assert np.array_equal(np.asarray(out), [True, False])


class TestStageTimer:
    def test_records_and_reports(self):
        t = StageTimer()
        with t.stage("a"):
            pass
        with t.stage("a"):
            pass
        t0 = t.tic()
        t.toc("b", t0)
        s = t.summary()
        assert s["a"]["count"] == 2 and s["b"]["count"] == 1
        rep = t.report()
        assert "a" in rep and "mean ms" in rep

    def test_disabled_is_noop(self):
        t = StageTimer(enabled=False)
        with t.stage("a"):
            pass
        assert t.summary() == {}

    def test_device_trace_noop(self):
        with device_trace(None):
            x = jnp.ones(3) + 1
        assert float(x.sum()) == 6.0


@pytest.mark.slow
class TestLoamPipeline:
    def test_closed_loop_and_resume(self, tmp_path):
        """LOAM baseline tracks the synthetic trajectory; resuming from a
        mid-sequence checkpoint reproduces the uninterrupted run exactly."""
        cfg = loam_cfg()
        traj = synthetic.Trajectory()
        dt = cfg.sensor.scan_period
        n_sweeps = 10
        sweeps = [synthetic.simulate_sweep(traj, i * dt, n_azimuth=540)
                  for i in range(n_sweeps)]

        pipe = LoamPipeline(cfg, dtype=jnp.float32)
        poses = []
        ckpt = str(tmp_path / "loam.npz")
        for i, (xyz, mask) in enumerate(sweeps):
            out = pipe.process(xyz, mask)
            poses.append(out["laser_pose"])
            if i == 5:
                pipe.save(ckpt)

        # closed-loop accuracy vs ground truth (relative to first frame)
        q0g, p0g = synthetic.gt_sensor_pose(traj, dt)
        errs = []
        for i, pose in enumerate(poses):
            qg, pg = synthetic.gt_sensor_pose(traj, (i + 1) * dt)
            errs.append(np.linalg.norm(np.asarray(pose.t) - (pg - p0g)))
        rmse = float(np.sqrt(np.mean(np.square(errs))))
        assert rmse < 0.12, f"LOAM ATE RMSE {rmse:.3f} m, errs={errs}"

        # resume equivalence: bitwise-identical continuation
        pipe2 = LoamPipeline(cfg, dtype=jnp.float32)
        pipe2.load(ckpt)
        assert pipe2.frame_count == 6
        for i in range(6, n_sweeps):
            xyz, mask = sweeps[i]
            out2 = pipe2.process(xyz, mask)
            np.testing.assert_array_equal(
                np.asarray(out2["laser_pose"].t), np.asarray(poses[i].t))
            np.testing.assert_array_equal(
                np.asarray(out2["laser_pose"].q), np.asarray(poses[i].q))


class TestLioCheckpointRoundTrip:
    def test_state_serialization_exact(self, tmp_path):
        """save/load round-trips every leaf of the estimator + odometry
        state bit-exactly (net-new checkpoint subsystem, SURVEY §5)."""
        cfg = LioConfig.indoor()
        pipe = LioPipeline(cfg, dtype=jnp.float32)
        # scramble the state so the test is not trivially zeros
        rng = np.random.default_rng(3)
        pipe.est_state = jax.tree.map(
            lambda a: jnp.asarray(
                rng.standard_normal(a.shape).astype(np.asarray(a).dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a),
            pipe.est_state)
        pipe.stage = "INITED"
        pipe.frame_count = 41
        path = str(tmp_path / "lio.npz")
        pipe.save(path)

        pipe2 = LioPipeline(cfg, dtype=jnp.float32)
        pipe2.load(path)
        assert pipe2.stage == "INITED" and pipe2.frame_count == 41
        for a, b in zip(jax.tree.leaves(pipe.est_state),
                        jax.tree.leaves(pipe2.est_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_default_matmul_precision_is_full_f32():
    """Importing the package must pin full-f32 matmuls: TPU-default bf16
    MXU truncation costs ~10x ATE on the window solver (measured 4.7 m ->
    0.59 m on the synthetic indoor sequence). LIO_MATMUL_PRECISION
    overrides."""
    import os

    import lio_mapping_tpu  # noqa: F401

    expect = os.environ.get("LIO_MATMUL_PRECISION", "highest")
    assert jax.config.jax_default_matmul_precision == expect
