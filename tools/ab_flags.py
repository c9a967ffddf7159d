"""A/B the estimator's accuracy/cost flags on the flagship 89-sweep
synthetic indoor sequence (VERDICT r3 next #8).

The two knobs that trade accuracy for per-sweep compute:

* ``keep_features`` — accumulate association rows across the newest-frame
  mini-GN rounds (Estimator.cc:978 semantics; the indoor yaml enables it).
  Costs ~10x features_per_frame extra factor rows through LM +
  marginalization.
* ``newest_refine_iters`` — the mini-GN round budget itself
  (num_max_iterations_, Estimator.cc:1561): each round is one serial
  KNN + fit association pass.

Usage:
    python tools/ab_flags.py [--sweeps 90] [--out AB_FLAGS.json] [--cpu]

Each variant runs in its OWN subprocess (resident executables from one
variant perturb the next — same isolation bench.py uses) over the SAME
simulated sequence, reporting timestamp-matched ATE and steady-state
frames/s as one JSON file.
"""

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import time

import numpy as np

VARIANTS = {
    "indoor_default": {},  # keep_features=True, newest_refine_iters=10
    "no_keep_features": {"keep_features": False},
    "refine_iters_2": {"newest_refine_iters": 2},
    "no_keep_refine_2": {"keep_features": False, "newest_refine_iters": 2},
}


def run_variant(name: str, sweeps: int) -> dict:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lio_mapping_tpu.config import LioConfig
    from lio_mapping_tpu.io import synthetic
    from lio_mapping_tpu.models.pipeline import LioPipeline

    base = LioConfig.indoor()
    cfg = dataclasses.replace(
        base, estimator=dataclasses.replace(base.estimator, **VARIANTS[name]))

    # the flagship sequence shape (cli simulate defaults): pitch/roll
    # excitation so the from-scratch extrinsic calibration accepts
    traj = synthetic.Trajectory(pitch_amp=0.4, roll_amp=0.35, rp_freq=0.45,
                                g_norm=cfg.estimator.imu.g_norm)
    pipe = LioPipeline(cfg, dtype=jnp.float32)
    dt = cfg.sensor.scan_period
    imu_rate = 200.0

    # pre-generate the sequence: the ray-casting simulator must not sit
    # inside the timed loop (it dominates wall time and hides the flags'
    # relative cost)
    frames = []
    for i in range(sweeps):
        t0 = i * dt
        xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=900)
        ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, imu_rate)
        a0, w0 = traj.imu(t0)
        dts = np.diff(np.concatenate([[t0], ts]))
        frames.append((t0, xyz, mask, (dts, acc, gyr, a0, w0)))

    est, gt, stamps = [], [], []
    t_steady = None
    n_steady = 0
    for t0, xyz, mask, imu in frames:
        out = pipe.process(xyz, mask, pipe.make_samples(*imu))
        pose = out.get("laser_pose")
        if pose is None:
            continue
        if out["stage"] == "INITED":
            if t_steady is None:
                jax.block_until_ready(pose.t)
                t_steady = time.perf_counter()
            else:
                n_steady += 1
            est.append((np.asarray(pose.q), np.asarray(pose.t)))
            q_g, p_g = synthetic.gt_sensor_pose(traj, t0 + dt)
            gt.append((q_g, p_g))
            stamps.append(t0 + dt)
    if not est or pipe.stage != "INITED":
        return {"variant": name, "error": "init failed"}
    jax.block_until_ready(pipe.est_state.ps)
    elapsed = time.perf_counter() - t_steady

    from lio_mapping_tpu.io.evaluation import evaluate_trajectory

    q_e = np.stack([e[0] for e in est])
    p_e = np.stack([e[1] for e in est])
    q_g = np.stack([g[0] for g in gt])
    p_g = np.stack([g[1] for g in gt])
    m = evaluate_trajectory(q_e, p_e, q_g, p_g)
    return {
        "variant": name,
        "overrides": VARIANTS[name],
        "ate_rmse_m": round(float(m.ate_rmse), 4),
        "ate_max_m": round(float(m.ate_max), 4),
        "n_inited_poses": len(est),
        "fps": round(n_steady / elapsed, 2) if elapsed > 0 else None,
        "device": str(jax.devices()[0]),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweeps", type=int, default=90)
    ap.add_argument("--out", default="AB_FLAGS.json")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--variant", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.variant:
        print(json.dumps(run_variant(args.variant, args.sweeps)))
        return 0

    results = []
    for name in VARIANTS:
        cmd = [sys.executable, os.path.abspath(__file__),
               "--variant", name, "--sweeps", str(args.sweeps)] \
            + (["--cpu"] if args.cpu else [])
        proc = subprocess.run(cmd, capture_output=True, text=True)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
        try:
            results.append(json.loads(line))
        except json.JSONDecodeError:
            results.append({"variant": name,
                            "error": (proc.stderr or line)[-400:]})
        print(results[-1], flush=True)
    with open(args.out, "w") as f:
        json.dump({"sweeps": args.sweeps, "results": results}, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
