"""On-device (TPU) f32 accuracy gate.

Run with:  LIO_TEST_TPU=1 python -m pytest tests/test_tpu_accuracy.py -m tpu

The CI suite runs CPU-only (conftest forces it); this module is the
``tpu``-marked twin the verify skill executes on the attached chip — the
SHIPPED configuration (f32, full-f32 matmul precision, TPU backend) must
hold the closed-loop ATE bound, not just the CPU emulation of it.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        not os.environ.get("LIO_TEST_TPU")
        or jax.default_backend() not in ("tpu", "axon"),
        reason="needs LIO_TEST_TPU=1 and an attached TPU"),
]


def test_f32_closed_loop_on_device():
    from lio_mapping_tpu.io import synthetic
    from lio_mapping_tpu.models.pipeline import LioPipeline

    from tests.test_lio_pipeline import rot_of, small_cfg

    cfg = small_cfg()
    traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm)
    pipe = LioPipeline(cfg, dtype=jnp.float32)
    dt = cfg.sensor.scan_period
    n_sweeps = 24

    results = []
    for i in range(n_sweeps):
        t0 = i * dt
        xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=540)
        ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, 200.0)
        a0, w0 = traj.imu(t0)
        dts = np.diff(np.concatenate([[t0], ts]))
        out = pipe.process(xyz, mask, pipe.make_samples(dts, acc, gyr, a0, w0))
        results.append((t0 + dt, out))

    assert pipe.stage == "INITED", "initialization failed on device"
    assert str(jax.devices()[0].platform).lower() in ("tpu", "axon")

    est, gt = [], []
    for t_end, out in results:
        if out["stage"] != "INITED" or "body_pose" not in out:
            continue
        est.append((np.array(out["laser_pose"].q), np.array(out["laser_pose"].t)))
        gt.append(synthetic.gt_sensor_pose(traj, t_end))
    assert len(est) >= 8
    q0e, p0e = est[0]
    q0g, p0g = gt[0]
    r0e, r0g = rot_of(q0e), rot_of(q0g)
    errs = []
    for (qe, pe), (qg, pg) in zip(est, gt):
        te = r0e.inv().apply(pe - p0e)
        tg = r0g.inv().apply(np.asarray(pg) - p0g)
        errs.append(np.linalg.norm(te - tg))
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    assert rmse < 0.2, f"on-device f32 ATE {rmse:.3f} m, errs={errs}"
