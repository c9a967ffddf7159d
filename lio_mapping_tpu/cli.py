"""Command-line runners (the reference's node executables, SURVEY §2 #21).

    python -m lio_mapping_tpu.cli run --log seq.liol --profile indoor \
        --out traj.tum [--map-out map.pcd] [--mode lio|loam]
    python -m lio_mapping_tpu.cli simulate --out seq.liol --sweeps 100
    python -m lio_mapping_tpu.cli evaluate --est traj.tum --gt gt.tum

``run`` replaces the roslaunch graphs: it replays a sequence log through
the full pipeline (LIO or LiDAR-only LOAM), writes a TUM trajectory, and
optionally exports the accumulated global map as a PCD via the native
voxel-map archive (the save_bag_to_pcd equivalent).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def _profile(name: str):
    from .config import LioConfig

    return {"indoor": LioConfig.indoor, "outdoor": LioConfig.outdoor,
            "outdoor_64": LioConfig.outdoor_64}[name]()


def cmd_simulate(args):
    from .io import synthetic
    from . import native

    # Rotation excitation about >=2 axes by default: the indoor profile
    # calibrates the laser-IMU extrinsic from scratch, and its hand-eye
    # SVD gate (ImuInitializer.cc:404-417) never accepts on a yaw-only
    # path. --pitch-amp 0 --roll-amp 0 reproduces the flat trajectory.
    traj = synthetic.Trajectory(pitch_amp=args.pitch_amp, roll_amp=args.roll_amp,
                                rp_freq=0.45)
    log = native.SequenceLog(args.out, write=True)
    dt = 0.1
    imu_rate = args.imu_rate
    t_imu = 0.0
    for i in range(args.sweeps):
        t0 = i * dt
        # IMU up to the sweep end
        while t_imu < t0 + dt:
            t_imu += 1.0 / imu_rate
            acc, gyr = traj.imu(t_imu)
            log.write_imu(t_imu, acc.astype(np.float32), gyr.astype(np.float32))
        xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=args.azimuth)
        rel = np.zeros(len(xyz), np.float32)
        log.write_sweep(t0 + dt, xyz[mask], rel[mask])
    log.close()
    print(f"wrote {args.sweeps} sweeps to {args.out}")
    if args.gt_out:
        from .io.evaluation import save_tum

        times = [i * dt + dt for i in range(args.sweeps)]
        qs, ps = [], []
        for t in times:
            q, p = synthetic.gt_sensor_pose(traj, t)
            qs.append(q)
            ps.append(p)
        save_tum(args.gt_out, times, np.stack(qs), np.stack(ps))
        print(f"wrote ground truth to {args.gt_out}")
    return 0


def cmd_run(args):
    import jax.numpy as jnp

    from . import native
    from .io.evaluation import save_tum
    from .models.pipeline import LioPipeline

    cfg = _profile(args.profile)
    pipe = LioPipeline(cfg, dtype=jnp.float32)
    mq = native.MeasurementQueue(cfg.estimator.msg_time_delay)
    global_map = native.GlobalVoxelMap(cfg.mapping.map_filter_size) if args.map_out else None

    sweeps = {}
    times, qs, ts = [], [], []
    next_id = 0
    for item in native.SequenceLog(args.log):
        if item[0] == "imu":
            mq.push_imu(item[1], item[2], item[3])
        else:
            sweeps[next_id] = (item[2], item[3])
            mq.push_sweep(item[1], next_id)
            next_id += 1
        while True:
            pair = mq.next_pair()
            if pair is None:
                break
            t, sid, imu_t, acc, gyr = pair
            xyz, rel = sweeps.pop(sid)
            if len(imu_t) >= 2:
                dts = np.diff(np.concatenate([[imu_t[0]], imu_t[1:]]))
                samples = pipe.make_samples(dts, acc[1:], gyr[1:], acc[0], gyr[0])
            else:
                samples = None
            out = pipe.process(xyz, np.ones(len(xyz), bool), samples)
            pose = out.get("laser_pose")
            if pose is not None:
                times.append(t)
                qs.append(np.asarray(pose.q))
                ts.append(np.asarray(pose.t))
                if global_map is not None and out.get("stage") == "INITED":
                    from .utils import quaternion as quat

                    world = np.asarray(quat.rotate(pose.q[None, :], jnp.asarray(xyz))) + np.asarray(pose.t)
                    global_map.insert(world)

    save_tum(args.out, times, np.stack(qs), np.stack(ts))
    print(f"wrote {len(times)} poses to {args.out} (stage: {pipe.stage})")
    if global_map is not None:
        global_map.save_pcd(args.map_out)
        print(f"wrote {len(global_map)} map voxels to {args.map_out}")
    return 0


def cmd_evaluate(args):
    from .io.evaluation import evaluate_trajectory, load_tum

    t_e, q_e, p_e = load_tum(args.est)
    t_g, q_g, p_g = load_tum(args.gt)
    n = min(len(t_e), len(t_g))
    m = evaluate_trajectory(q_e[:n], p_e[:n], q_g[:n], p_g[:n])
    print(f"ATE RMSE: {m.ate_rmse:.4f} m  mean {m.ate_mean:.4f}  max {m.ate_max:.4f}")
    print(f"RPE: {m.rpe_trans_rmse:.4f} m / {m.rpe_rot_rmse_deg:.3f} deg over {m.n_poses} poses")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="lio_mapping_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("simulate")
    p.add_argument("--out", required=True)
    p.add_argument("--sweeps", type=int, default=100)
    p.add_argument("--azimuth", type=int, default=900)
    p.add_argument("--imu-rate", type=float, default=200.0)
    p.add_argument("--pitch-amp", type=float, default=0.4)
    p.add_argument("--gt-out", default=None)
    p.add_argument("--roll-amp", type=float, default=0.35)
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("run")
    p.add_argument("--log", required=True)
    p.add_argument("--profile", default="indoor",
                   choices=["indoor", "outdoor", "outdoor_64"])
    p.add_argument("--out", required=True)
    p.add_argument("--map-out", default=None)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("evaluate")
    p.add_argument("--est", required=True)
    p.add_argument("--gt", required=True)
    p.set_defaults(fn=cmd_evaluate)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
