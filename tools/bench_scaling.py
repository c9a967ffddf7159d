"""Multi-device scaling benchmark for the distributed window-BA step
(BASELINE config 5).

Runs the full shard_map program (association + sharded BA + sharded
marginalization, parallel/distributed.py) at a FIXED total problem size
over meshes of 1..N devices and reports per-step wall time + scaling
efficiency.

On a real pod slice (multiple `jax.devices()`), the numbers measure ICI
scaling. On a single-chip or CPU host it falls back to a virtual device
mesh (``--virtual N``), which validates the collective structure and
sharding but NOT speedup (virtual devices share one host's cores) — the
output labels which mode ran.

Usage:
    python tools/bench_scaling.py                 # real devices
    python tools/bench_scaling.py --virtual 8     # 8 virtual CPU devices
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices")
    ap.add_argument("--features-total", type=int, default=32768,
                    help="total plane-feature rows per frame (fixed work)")
    ap.add_argument("--map-points", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    if args.virtual:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from lio_mapping_tpu.config import LioConfig
    from lio_mapping_tpu.ops import marginalization as MG
    from lio_mapping_tpu.ops import preintegration as PI
    from lio_mapping_tpu.ops import solver as SV
    from lio_mapping_tpu.parallel import distributed as DIST
    from lio_mapping_tpu.utils import quaternion as quat

    devices = jax.devices()
    mode = "virtual-cpu" if args.virtual else str(devices[0].platform)

    base = LioConfig.indoor()
    cfg = dataclasses.replace(
        base, estimator=dataclasses.replace(
            base.estimator, window_size=12, opt_window_size=7,
            max_solver_iterations=8))
    e = cfg.estimator
    s = e.opt_window_size
    dtype = jnp.float32
    rng = np.random.default_rng(0)

    f_total = args.features_total
    map_n = args.map_points

    x0 = SV.OptStates(
        q=jnp.tile(quat.identity(dtype), (s + 1, 1)),
        p=jnp.asarray(rng.normal(0, 0.05, (s + 1, 3)), dtype),
        sb=jnp.zeros((s + 1, 9), dtype),
        ex_q=quat.identity(dtype),
        ex_p=jnp.zeros(3, dtype))
    pres = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (s,) + a.shape),
        PI.Preintegration.identity(dtype)._replace(
            covariance=jnp.eye(15, dtype=dtype) * 1e-4,
            sum_dt=jnp.asarray(0.1, dtype)))
    g_vec = jnp.asarray([0.0, 0.0, -9.805], dtype)
    map_xyz = jnp.asarray(rng.uniform(-8, 8, (map_n, 3)), dtype)
    map_mask = jnp.ones((map_n,), bool)
    stacks_xyz = jnp.asarray(rng.uniform(-8, 8, (s, f_total, 3)), dtype)
    stacks_mask = jnp.ones((s, f_total), bool)
    rel_q = jnp.tile(quat.identity(dtype), (s + 1, 1))
    rel_t = jnp.asarray(rng.normal(0, 0.05, (s + 1, 3)), dtype)
    prior = MG.PriorState.empty(s, dtype)

    results = []
    n = 1
    while n <= len(devices):
        if f_total % n:
            n *= 2
            continue
        mesh = Mesh(np.array(devices[:n]), (DIST.AXIS,))
        step = DIST.make_distributed_step(mesh, cfg)
        out = step(x0, pres, g_vec, map_xyz, map_mask, stacks_xyz,
                   stacks_mask, rel_q, rel_t, prior)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(x0, pres, g_vec, map_xyz, map_mask, stacks_xyz,
                       stacks_mask, rel_q, rel_t, prior)
        jax.block_until_ready(out)
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        results.append((n, ms))
        n *= 2

    base_ms = results[0][1]
    report = {
        "mode": mode,
        "devices": len(devices),
        "features_total": f_total,
        "steps": [
            {"n_devices": n, "ms_per_step": round(ms, 3),
             "speedup": round(base_ms / ms, 3),
             "efficiency": round(base_ms / ms / n, 3)}
            for n, ms in results
        ],
    }
    if mode == "virtual-cpu":
        report["note"] = ("virtual devices share one host's cores: validates "
                          "sharding/collectives, NOT speedup")
    print(json.dumps(report))


if __name__ == "__main__":
    main()
