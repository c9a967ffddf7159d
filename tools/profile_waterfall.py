"""Cumulative stage waterfall of the fused lio_step on real inputs.

Sets estimator._TRUNCATE_STAGE to each checkpoint and re-jits: XLA
dead-code-eliminates everything after the early return, so each timing is
the exact cumulative cost of the program prefix — differences are
per-stage costs inside the REAL fused program (unlike profile_step.py,
which times stages as separate programs).

Inputs are steady-state: the pipeline is run on the synthetic sequence
until INITED + a few solved sweeps, then the captured state/cloud/samples
feed the truncated programs.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from lio_mapping_tpu.io import synthetic
from lio_mapping_tpu.models import estimator as EST
from lio_mapping_tpu.models.pipeline import LioPipeline
from lio_mapping_tpu.ops import preintegration as PI


def timeit(fn, *args, n=30, warmup=5):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    profile = sys.argv[1] if len(sys.argv) > 1 else "indoor"
    cfg = bench.build_cfg(profile)
    traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm)
    pipe = LioPipeline(cfg, dtype=jnp.float32)
    dt = cfg.sensor.scan_period

    state_cap = {}
    for i in range(6 * cfg.estimator.window_size + 24):
        if "state" in state_cap and "surf" in state_cap:
            break
        t0 = i * dt
        xyz, mask = synthetic.simulate_sweep(
            traj, t0, n_azimuth=900, n_rings=cfg.sensor.n_rings,
            lower_deg=cfg.sensor.lower_bound_deg,
            upper_deg=cfg.sensor.upper_bound_deg)
        ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, 200.0)
        a0, w0 = traj.imu(t0)
        dts = np.diff(np.concatenate([[t0], ts]))
        samples = pipe.make_samples(dts, acc, gyr, a0, w0)
        # capture pre-step state once INITED
        if pipe.stage == "INITED":
            state_cap = {"state": pipe.est_state, "samples": samples}
        out = pipe.process(xyz, mask, samples)
        if pipe.stage == "INITED" and "surf_cloud" in out:
            state_cap["surf"] = out["surf_cloud"]
    assert pipe.stage == "INITED", "did not initialize"

    st, surf = state_cap["state"], state_cap["surf"]
    samples = PI.unpack_samples(state_cap["samples"].astype(jnp.float32))
    stages = ["window", "map", "assoc", "gates", "solve", None]
    prev = 0.0
    print(f"profile={profile}  (cumulative | delta)")
    for stage in stages:
        EST._TRUNCATE_STAGE = stage
        step = jax.jit(lambda s, c, i: EST.lio_step.__wrapped__(s, c, i, cfg))
        t = timeit(step, st, surf, samples)
        name = stage or "full"
        print(f"{name:8s} {t:7.2f} ms | +{t - prev:.2f}")
        prev = t
    EST._TRUNCATE_STAGE = None


if __name__ == "__main__":
    main()
