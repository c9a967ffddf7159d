"""Worker program for the 2-process multi-host test (not a test module).

Launched by tests/test_multihost.py as N separate OS processes with
``JAX_PLATFORMS=cpu`` and 2 virtual devices each. Joins the distributed
runtime, builds the process-spanning mesh, and checks that the sharded
window BA over the GLOBAL mesh (collectives crossing the process boundary
over the DCN transport) matches the process-local single-device solve.
Writes a JSON verdict per process.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    n_proc = int(sys.argv[2])
    port = sys.argv[3]
    outdir = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "ba"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lio_mapping_tpu.parallel import multihost as MH

    MH.initialize(f"127.0.0.1:{port}", n_proc, pid)
    if mode == "fullstep":
        return fullstep(pid, outdir)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from lio_mapping_tpu.ops import marginalization as MG
    from lio_mapping_tpu.ops import solver as SV
    from lio_mapping_tpu.parallel import sharded_ba as SB
    from tests.test_solver import _make_window_problem
    from lio_mapping_tpu.utils import quaternion as quat

    assert jax.process_count() == n_proc
    mesh = MH.global_mesh()
    n_dev = mesh.devices.size

    # cross-process psum sanity
    fn = jax.jit(jax.shard_map(lambda a: jax.lax.psum(a, MH.AXIS),
                               mesh=mesh, in_specs=P(MH.AXIS), out_specs=P()))
    x = MH.shard_rows(np.arange(float(2 * n_dev)), mesh)
    psum_ok = bool(np.allclose(MH.fetch(fn(x)),
                               np.arange(float(2 * n_dev)).reshape(n_dev, -1).sum(0)))

    # window-BA: global-mesh sharded vs process-local single-device
    s, f = 3, 96
    x_gt, pres, planes = _make_window_problem(s=s, f=f, noise=0.01, seed=7)
    rng = np.random.default_rng(1)
    dq = jnp.asarray(rng.normal(0, 0.01, (s + 1, 3))).at[0].set(0.0)
    x0 = x_gt._replace(q=quat.normalize(quat.qmul(x_gt.q, quat.exp(dq))))
    prior = MG.PriorState.empty(s, jnp.float64)
    g_vec = jnp.asarray([0.0, 0.0, -9.805])

    x_ref, _ = SV.solve_window(
        x0, pres, g_vec, planes, prior, None, s=s, max_iterations=6,
        opt_extrinsic=jnp.asarray(False), use_marg=jnp.asarray(False))

    ba = jax.jit(jax.shard_map(
        lambda x0_, pres_, pl_, pr_: SB.solve_window_sharded(
            x0_, pres_, g_vec, pl_, pr_, None, s=s, max_iterations=6,
            opt_extrinsic=jnp.asarray(False), use_marg=jnp.asarray(False)),
        mesh=mesh,
        in_specs=(P(), P(), P(None, MH.AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False))

    x0_g, pres_g, prior_g = MH.replicate((x0, pres, prior), mesh)
    planes_g = jax.tree.map(
        lambda a: _shard_axis1(a, mesh), planes)
    x_sh, cost = ba(x0_g, pres_g, planes_g, prior_g)

    p_diff = float(np.max(np.abs(MH.fetch(x_sh.p) - np.asarray(x_ref.p))))
    sb_diff = float(np.max(np.abs(MH.fetch(x_sh.sb) - np.asarray(x_ref.sb))))

    result = {"pid": pid, "n_devices": int(n_dev), "psum_ok": psum_ok,
              "p_diff": p_diff, "sb_diff": sb_diff,
              "ok": psum_ok and p_diff < 1e-6 and sb_diff < 1e-6}
    with open(os.path.join(outdir, f"worker{pid}.json"), "w") as fh:
        json.dump(result, fh)
    print(f"proc {pid}: {result}", flush=True)


def fullstep(pid, outdir):
    """The FULL distributed lio_step over the process-spanning mesh: the
    same program `run --mesh N` dispatches, with the psum/while_loop
    collectives crossing the process boundary. 3 sweeps from a fabricated
    INITED state; trajectory compared against the process-local
    single-device step."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from lio_mapping_tpu.io import synthetic
    from lio_mapping_tpu.models import estimator as EST
    from lio_mapping_tpu.parallel import lio_dist, multihost as MH
    from tests.test_lio_dist import _make_inputs, _tiny_cfg

    cfg = _tiny_cfg()
    # smallest caps that divide the 4-device global mesh
    est = dataclasses.replace(cfg.estimator, surf_stack_cap=256,
                              local_map_filtered_cap=1024,
                              max_solver_iterations=3)
    cfg = dataclasses.replace(cfg, estimator=est)
    dtype = jnp.float64
    traj = synthetic.Trajectory(g_norm=cfg.estimator.imu.g_norm)
    state, t_next = synthetic.synthetic_estimator_state(
        cfg, traj, dtype, n_azimuth=240)

    mesh = MH.global_mesh(lio_dist.AXIS)
    step = lio_dist.make_sharded_lio_step(mesh, cfg)
    s_g = MH.replicate(state, mesh)
    s_l = state
    dt = cfg.sensor.scan_period
    diffs = []
    for i in range(3):
        cloud, samples = _make_inputs(cfg, traj, t_next + (i - 1) * dt, dtype)
        s_l, out_l = EST.lio_step(s_l, cloud, samples, cfg)
        cloud_g, samples_g = MH.replicate((cloud, samples), mesh)
        s_g, out_g = step(s_g, cloud_g, samples_g)
        diffs.append(float(np.max(np.abs(
            MH.fetch(out_g["laser_pose"].t) - np.asarray(out_l["laser_pose"].t)))))

    # ---- pipeline-level sharded ingest (VERDICT r3 #6) ----
    # Each process transfers only its ROW SLICE of the packed cloud
    # (multihost.shard_rows via LioPipeline ingest_shard); the program
    # reassembles it with a tiled all_gather over the DCN transport. The
    # trajectory must match a process-local single-device pipeline fed the
    # full cloud.
    from lio_mapping_tpu.models.pipeline import LioPipeline

    pipe_g = LioPipeline(cfg, dtype=dtype, mesh=mesh, ingest_shard=True)
    pipe_l = LioPipeline(cfg, dtype=dtype)
    pipe_g.est_state = MH.replicate(state, mesh)
    pipe_l.est_state = state
    pipe_g.stage = pipe_l.stage = "INITED"
    ingest_diffs = []
    for i in range(2):
        t0 = t_next + (i - 1) * dt
        xyz, mask = synthetic.simulate_sweep(traj, t0, n_azimuth=240)
        ts, acc, gyr = synthetic.simulate_imu_interval(traj, t0, t0 + dt, 200.0)
        a0, w0 = traj.imu(t0)
        dts = np.diff(np.concatenate([[t0], ts]))
        out_l = pipe_l.process(xyz, mask,
                               pipe_l.make_samples(dts, acc, gyr, a0, w0))
        out_g = pipe_g.process(xyz, mask,
                               pipe_g.make_samples(dts, acc, gyr, a0, w0))
        ingest_diffs.append(float(np.max(np.abs(
            MH.fetch(out_g["laser_pose"].t)
            - np.asarray(out_l["laser_pose"].t)))))

    result = {"pid": pid, "mode": "fullstep",
              "n_devices": int(mesh.devices.size),
              "max_diff": max(diffs), "ingest_max_diff": max(ingest_diffs),
              "ok": max(diffs) < 1e-2 and max(ingest_diffs) < 1e-2}
    with open(os.path.join(outdir, f"worker{pid}.json"), "w") as fh:
        json.dump(result, fh)
    print(f"proc {pid}: {result}", flush=True)


def _shard_axis1(a, mesh):
    """Host-local (S, F, ...) identical on every process -> global array
    with axis 1 sharded over the mesh."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    from lio_mapping_tpu.parallel import multihost as MH

    a = np.asarray(a)
    n_proc = jax.process_count()
    pid = jax.process_index()
    chunk = a.shape[1] // n_proc
    local = a[:, pid * chunk:(pid + 1) * chunk]
    return multihost_utils.host_local_array_to_global_array(
        local, mesh, P(None, MH.AXIS))


if __name__ == "__main__":
    main()
