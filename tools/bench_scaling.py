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
    python tools/bench_scaling.py --processes 2 --virtual 2
        # multi-HOST validation: 2 OS processes x 2 devices joined via
        # jax.distributed; the same shard_map program spans the process
        # boundary (collectives over the DCN transport; Gloo on CPU).
        # Reports per-step time on the global mesh + efficiency vs a
        # 1-process mesh of the same per-process size.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _spawn_multiproc(args):
    """Parent: launch N worker copies of this script joined by
    jax.distributed; print the rank-0 report."""
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (f"--xla_force_host_platform_device_count="
                        f"{max(1, args.virtual)}")
    procs = []
    for i in range(args.processes):
        cmd = [sys.executable, os.path.abspath(__file__),
               "--worker", str(i), "--port", str(port),
               "--processes", str(args.processes),
               "--virtual", str(max(1, args.virtual)),
               "--features-total", str(args.features_total),
               "--map-points", str(args.map_points),
               "--iters", str(args.iters)]
        procs.append(subprocess.Popen(
            cmd, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL))
    outs = [p.communicate()[0].decode() for p in procs]
    for i, p in enumerate(procs):
        if p.returncode != 0:
            print(f"worker {i} failed", file=sys.stderr)
            sys.exit(1)
    # rank 0 prints the report line (last line of its stdout)
    print(outs[0].strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (per process when "
                         "--processes is set)")
    ap.add_argument("--features-total", type=int, default=32768,
                    help="total plane-feature rows per frame (fixed work)")
    ap.add_argument("--map-points", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--processes", type=int, default=0,
                    help="multi-process (multi-host) mode: total processes")
    ap.add_argument("--worker", type=int, default=-1,
                    help="(internal) worker rank in --processes mode")
    ap.add_argument("--port", type=int, default=0, help="(internal)")
    args = ap.parse_args()

    if args.processes and args.worker < 0:
        _spawn_multiproc(args)
        return

    if args.virtual and args.worker < 0:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.worker >= 0:
        jax.config.update("jax_platforms", "cpu")
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{args.port}",
            num_processes=args.processes, process_id=args.worker)
    elif args.virtual:
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

    def bench(step, inputs):
        out = step(*inputs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = step(*inputs)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    inputs = (x0, pres, g_vec, map_xyz, map_mask, stacks_xyz,
              stacks_mask, rel_q, rel_t, prior)

    if args.worker >= 0:
        # ---- multi-process mode: local 1-device baseline + global mesh ----
        from jax.sharding import PartitionSpec as P
        from jax.experimental import multihost_utils

        from lio_mapping_tpu.parallel import multihost as MH

        local_mesh = Mesh(np.array(jax.local_devices()[:1]), (DIST.AXIS,))
        base_ms = bench(DIST.make_distributed_step(local_mesh, cfg), inputs)

        mesh = MH.global_mesh(DIST.AXIS)
        n_glob = mesh.devices.size
        repl = MH.replicate(
            (x0, pres, g_vec, map_xyz, map_mask, rel_q, rel_t, prior), mesh)

        def shard1(a):
            a = np.asarray(a)
            n_proc = jax.process_count()
            chunk = a.shape[1] // n_proc
            pid = jax.process_index()
            return multihost_utils.host_local_array_to_global_array(
                a[:, pid * chunk:(pid + 1) * chunk], mesh, P(None, DIST.AXIS))

        g_inputs = (repl[0], repl[1], repl[2], repl[3], repl[4],
                    shard1(stacks_xyz), shard1(stacks_mask),
                    repl[5], repl[6], repl[7])
        ms = bench(DIST.make_distributed_step(mesh, cfg), g_inputs)
        if jax.process_index() == 0:
            report = {
                "mode": f"multiprocess-cpu ({jax.process_count()} procs)",
                "processes": jax.process_count(),
                "devices": int(n_glob),
                "features_total": f_total,
                "steps": [
                    {"n_devices": 1, "ms_per_step": round(base_ms, 3)},
                    {"n_devices": int(n_glob), "ms_per_step": round(ms, 3),
                     "speedup": round(base_ms / ms, 3),
                     "efficiency": round(base_ms / ms / n_glob, 3)},
                ],
                "note": ("CPU processes share one box: validates the "
                         "cross-process (DCN) collective path, NOT speedup"),
            }
            print(json.dumps(report))
        return

    results = []
    n = 1
    while n <= len(devices):
        if f_total % n:
            n *= 2
            continue
        mesh = Mesh(np.array(devices[:n]), (DIST.AXIS,))
        step = DIST.make_distributed_step(mesh, cfg)
        ms = bench(step, inputs)
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
