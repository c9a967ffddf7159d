"""Isolate which flag (use_corner / fix_map) degrades closed-loop ATE."""
import dataclasses
import sys

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation

sys.path.insert(0, "/root/repo")
from lio_mapping_tpu.config import LioConfig
from lio_mapping_tpu.io import synthetic
from lio_mapping_tpu.models.pipeline import LioPipeline


def small_cfg():
    base = LioConfig.indoor()
    est = dataclasses.replace(
        base.estimator, window_size=5, opt_window_size=3, init_window_factor=1,
        estimate_extrinsic=0, opt_extrinsic=False,
        extrinsic_rotation=(1, 0, 0, 0, 1, 0, 0, 0, 1),
        extrinsic_translation=(0.0, 0.0, 0.0),
        surf_stack_cap=2048, local_map_filtered_cap=8192,
        features_per_frame_cap=2048, max_solver_iterations=8)
    return dataclasses.replace(base, estimator=est)


def run(use_corner, fix_map):
    cfg = small_cfg()
    cfg = dataclasses.replace(cfg, estimator=dataclasses.replace(
        cfg.estimator, use_corner=use_corner, fix_map=fix_map,
        corner_stack_cap=1024, local_map_corner_cap=4096))
    traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm)
    pipe = LioPipeline(cfg, dtype=jnp.float64)
    dt = cfg.sensor.scan_period
    results = []
    for i in range(16):
        t0 = i * dt
        xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=540)
        ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, 200.0)
        a0, w0 = traj.imu(t0)
        dts = np.diff(np.concatenate([[t0], ts]))
        samples = pipe.make_samples(dts, acc, gyr, a0, w0)
        out = pipe.process(xyz, mask, samples)
        results.append((t0 + dt, out))

    est, gt = [], []
    for t_end, out in results:
        if out["stage"] != "INITED" or "body_pose" not in out:
            continue
        est.append((np.array(out["laser_pose"].q), np.array(out["laser_pose"].t)))
        gt.append(synthetic.gt_sensor_pose(traj, t_end))
    q0e, p0e = est[0]
    q0g, p0g = gt[0]
    r0e = Rotation.from_quat(np.roll(np.array(q0e), -1))
    r0g = Rotation.from_quat(np.roll(np.array(q0g), -1))
    errs = [np.linalg.norm(r0e.inv().apply(pe - p0e) - r0g.inv().apply(pg - p0g))
            for (qe, pe), (qg, pg) in zip(est, gt)]
    rmse = float(np.sqrt(np.mean(np.square(errs))))
    print(f"use_corner={use_corner} fix_map={fix_map}: RMSE={rmse:.4f} errs={[f'{e:.3f}' for e in errs]}")
    return rmse


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("all", "default"):
        run(False, False)
    if mode in ("all", "fixmap"):
        run(False, True)
    if mode in ("all", "corner"):
        run(True, False)
    if mode in ("all", "both"):
        run(True, True)
