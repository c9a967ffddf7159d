"""Command-line runners (the reference's node executables, SURVEY §2 #21).

    python -m lio_mapping_tpu.cli run --log seq.liol --profile indoor \
        --out traj.tum [--map-out map.pcd] [--mode lio|loam] [--enable-4d]
        [--self-filter] [--timing] [--trace-dir d] [--checkpoint-out c.npz
        --checkpoint-every N] [--resume c.npz]
    python -m lio_mapping_tpu.cli simulate --out seq.liol --sweeps 100
    python -m lio_mapping_tpu.cli evaluate --est traj.tum --gt gt.tum
    python -m lio_mapping_tpu.cli export-pcd --log seq.liol --traj traj.tum \
        --out map.pcd

``run`` replaces the roslaunch graphs: it replays a sequence log through
the full pipeline (LIO or LiDAR-only LOAM), writes a TUM trajectory, and
optionally exports the accumulated global map as a PCD via the native
voxel-map archive (the save_bag_to_pcd equivalent).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _profile(name: str, config_path: str = None):
    """Named profile, or a YAML profile file (the reference's
    cv::FileStorage config mechanism, estimator_node.cc:62-140)."""
    from .config import LioConfig, load_yaml

    if config_path:
        return load_yaml(config_path)
    return {"indoor": LioConfig.indoor, "outdoor": LioConfig.outdoor,
            "outdoor_64": LioConfig.outdoor_64}[name]()


def cmd_simulate(args):
    from scipy.spatial.transform import Rotation

    from .io import synthetic
    from . import native

    # Rotation excitation about >=2 axes by default: the indoor profile
    # calibrates the laser-IMU extrinsic from scratch, and its hand-eye
    # SVD gate (ImuInitializer.cc:404-417) never accepts on a yaw-only
    # path. --pitch-amp 0 --roll-amp 0 reproduces the flat trajectory.
    traj = synthetic.Trajectory(pitch_amp=args.pitch_amp, roll_amp=args.roll_amp,
                                rp_freq=0.45)
    # optional laser->body rig offset (e.g. the KAIST extrinsic of the
    # outdoor profile, config/outdoor_test_config.yaml): the sensor rides
    # at T_wb * T_bl while the IMU stays on the body trajectory
    ext = None
    if args.extrinsic_translation or args.extrinsic_ypr_deg:
        t_lb = np.asarray(args.extrinsic_translation or (0.0, 0.0, 0.0))
        ypr = np.deg2rad(np.asarray(args.extrinsic_ypr_deg or (0.0, 0.0, 0.0)))
        q_lb = np.roll(Rotation.from_euler("ZYX", ypr).as_quat(), 1)
        ext = (q_lb, t_lb)
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
        xyz, mask = synthetic.simulate_sweep(
            traj, t0, n_azimuth=args.azimuth, extrinsic_lb=ext)
        rel = np.zeros(len(xyz), np.float32)
        log.write_sweep(t0 + dt, xyz[mask], rel[mask])
    log.close()
    print(f"wrote {args.sweeps} sweeps to {args.out}")
    if args.gt_out:
        from .io.evaluation import save_tum

        times = [i * dt + dt for i in range(args.sweeps)]
        qs, ps = [], []
        for t in times:
            q, p = synthetic.gt_sensor_pose(traj, t, extrinsic_lb=ext)
            qs.append(q)
            ps.append(p)
        save_tum(args.gt_out, times, np.stack(qs), np.stack(ps))
        print(f"wrote ground truth to {args.gt_out}")
    return 0


def _run_two_phase(args):
    """Clean-stream deployment (README 'device-queue discipline'): phase A
    initializes in a throwaway subprocess (its readbacks poison only that
    process) and checkpoints; phase B resumes H2D-only in a fresh process
    and replays the remaining log with zero readbacks, so the tunnel stays
    in its streaming dispatch mode for the whole mapping run."""
    import json as _json
    import shutil
    import subprocess
    import tempfile

    if args.resume:
        # A user --resume would be silently ignored (phase A always starts
        # from scratch and writes its own checkpoint) — refuse instead
        print("error: --two-phase and --resume are mutually exclusive "
              "(phase A creates the init checkpoint itself; to resume a "
              "previous run use plain `run --resume`)", file=sys.stderr)
        return 2

    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "init_ckpt.npz")
        sidecar = os.path.join(td, "init_meta.json")
        prefix = os.path.join(td, "prefix.tum")
        base = [sys.executable, "-m", "lio_mapping_tpu.cli", "run",
                "--log", args.log, "--profile", args.profile,
                "--mode", args.mode]
        if args.config:
            base += ["--config", args.config]
        if args.self_filter:
            base.append("--self-filter")
        if getattr(args, "compile_cache", None):
            base += ["--compile-cache", args.compile_cache]
        # Mesh topology changes reduction order (psum) and therefore
        # numerics: both phases must run the SAME topology or phase B
        # would resume an unsharded phase-A checkpoint onto a sharded
        # program (advisor r4)
        if args.mesh:
            base += ["--mesh", str(args.mesh)]
        if args.map_shard:
            base.append("--map-shard")
        if args.ingest_shard:
            base.append("--ingest-shard")
        rc = subprocess.call(base + [
            "--out", prefix, "--checkpoint-out", ckpt,
            "--stop-at-init", sidecar])
        if rc != 0:
            return rc
        with open(sidecar) as f:
            meta = _json.load(f)
        if not meta.get("inited"):
            print("two-phase: initialization never succeeded — the "
                  "phase-A trajectory is the full output")
            shutil.copy(prefix, args.out)
            return 1
        pb = base + ["--out", args.out, "--resume", ckpt,
                     "--skip-pairs", str(meta["pairs"]),
                     "--bound-in", sidecar, "--traj-prefix", prefix]
        for flag, val in (("--map-out", args.map_out),
                          ("--out-4d", args.out_4d),
                          ("--trace-dir", args.trace_dir),
                          ("--stats-json", getattr(args, "stats_json", None)),
                          ("--checkpoint-out", args.checkpoint_out)):
            if val:
                pb += [flag, val]
        if args.enable_4d:
            pb.append("--enable-4d")
        if args.timing:
            pb.append("--timing")
        if args.checkpoint_every:
            pb += ["--checkpoint-every", str(args.checkpoint_every)]
        return subprocess.call(pb)


def cmd_run(args):
    if getattr(args, "compile_cache", None):
        # persistent XLA compilation cache: the indoor estimator
        # executable costs ~47 s to compile on the tunneled TPU — with the
        # cache, repeat runs (and phase B after phase A) pay a disk read
        import jax

        jax.config.update("jax_compilation_cache_dir", args.compile_cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if getattr(args, "stop_at_init", None) and not args.checkpoint_out:
        # without a checkpoint the sidecar would claim `inited` with
        # nothing for phase B to resume from (advisor r4)
        print("error: --stop-at-init requires --checkpoint-out",
              file=sys.stderr)
        return 2
    if getattr(args, "two_phase", False):
        return _run_two_phase(args)

    import jax
    import jax.numpy as jnp

    from . import native
    from .io.evaluation import save_tum
    from .models.pipeline import LioPipeline, LoamPipeline
    from .utils.timing import StageTimer, device_trace

    cfg = _profile(args.profile, getattr(args, "config", None))
    if args.mode == "loam":
        pipe = LoamPipeline(cfg, dtype=jnp.float32)
    else:
        mesh = None
        if args.mesh:
            from .parallel import lio_dist

            mesh = lio_dist.make_mesh(args.mesh)
            print(f"distributed estimator over {mesh.devices.size} devices"
                  f"{' (map-sharded)' if args.map_shard else ''}")
        pipe = LioPipeline(cfg, dtype=jnp.float32, mesh=mesh,
                           map_shard=args.map_shard,
                           ingest_shard=args.ingest_shard)
    if args.resume:
        pipe.load(args.resume)
        print(f"resumed from {args.resume} (frame {pipe.frame_count})")
    mq = native.MeasurementQueue(cfg.estimator.msg_time_delay)
    global_map = native.GlobalVoxelMap(cfg.mapping.map_filter_size) if args.map_out else None
    timer = StageTimer(enabled=args.timing, sync=args.timing)

    # 4D map builder consuming the estimator's local output
    # (launch/map_4D_indoor.launch:9-15)
    mb_state = None
    times_4d, qs_4d, ts_4d = [], [], []
    if args.enable_4d:
        from .models import map_builder as MB
        from .models import mapping as MAPM

        mb_state = MAPM.init_state(cfg, jnp.float32)

    self_rot = self_box = None
    if args.self_filter:
        from .ops.cloud import (KAIST_SELF_FILTER_BOX,
                                KAIST_SELF_FILTER_ROTATION, crop_box_filter)

        self_rot = np.asarray(KAIST_SELF_FILTER_ROTATION, np.float32)
        self_box = KAIST_SELF_FILTER_BOX

    # Deferred readbacks: poses are buffered as DEVICE references and
    # converted in chunks — np.asarray on a per-sweep pose would block the
    # host on the in-flight step every sweep, exposing the tunnel round
    # trip (~10-30 ms) and capping replay throughput at a fraction of the
    # device rate. A chunked flush blocks once per FLUSH_EVERY sweeps on a
    # long-finished step, so replay streams at the bench rate.
    # Pose flush cadence: every flush performs D2H readbacks, and on the
    # tunneled TPU the FIRST readback permanently degrades the process's
    # dispatch path (README "device-queue discipline"). Pose-only replays
    # therefore buffer device refs for the whole run (tiny: two <=4-float
    # arrays per sweep; 64k sweeps ~ 2 MB device-side) and flush once at
    # the end — the loop stays in streaming mode. Map/4D exports must
    # materialize clouds host-side anyway, so they flush periodically and
    # accept the degraded mode.
    FLUSH_EVERY = 512 if (global_map is not None or args.enable_4d) else 65536
    pend_t, pend_q, pend_p = [], [], []       # stamps + device pose refs
    pend_t4, pend_q4, pend_p4 = [], [], []    # 4D builder output refs
    map_pend = []                             # (idx in pend, masked xyz)

    # end-to-end replay accounting (VERDICT r4 next #4): wall-clock split
    # of the production entry point — step dispatch vs chunked flush
    # readbacks vs host ingest (log parse + queue + interpolation = the
    # remainder). perf_counter bookkeeping only; no device syncs added.
    import time as _time

    stats = {"t_step": 0.0, "t_flush": 0.0, "t_first_step": 0.0,
             "n_pairs": 0, "step_times": []}

    def flush():
        from scipy.spatial.transform import Rotation

        _f0 = _time.perf_counter()
        # start ALL D2H copies first: each blocking np.asarray on this
        # tunnel costs a full round trip (~35-70 ms) — 350 buffered poses
        # took 24 s serially; with the copies in flight concurrently the
        # conversions below hit already-landed host buffers
        for a in pend_q + pend_p + pend_q4 + pend_p4:
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass  # already a numpy array (e.g. host-predicted pose)
        qs_h = [np.asarray(q, np.float64) for q in pend_q]
        ps_h = [np.asarray(p, np.float64) for p in pend_p]
        times.extend(pend_t)
        qs.extend(qs_h)
        ts.extend(ps_h)
        if global_map is not None and map_pend:
            with timer.stage("global_map"):
                for idx, xyzm in map_pend:
                    world = Rotation.from_quat(np.roll(qs_h[idx], -1)) \
                        .apply(xyzm) + ps_h[idx]
                    global_map.insert(world.astype(np.float32))
            map_pend.clear()
        pend_t.clear(), pend_q.clear(), pend_p.clear()
        for tt, qq, pp in zip(pend_t4, pend_q4, pend_p4):
            times_4d.append(tt)
            qs_4d.append(np.asarray(qq))
            ts_4d.append(np.asarray(pp))
        pend_t4.clear(), pend_q4.clear(), pend_p4.clear()
        stats["t_flush"] += _time.perf_counter() - _f0

    def step(t, xyz, mask, samples, ring=None, pf=None):
        nonlocal mb_state
        _s0 = _time.perf_counter()
        _step_impl(t, xyz, mask, samples, ring, pf)
        _dt = _time.perf_counter() - _s0
        stats["t_step"] += _dt
        stats["step_times"].append(_dt)
        if stats["n_pairs"] == 0:
            stats["t_first_step"] = _dt  # executable compile lives here
        stats["n_pairs"] += 1

    def _step_impl(t, xyz, mask, samples, ring, pf=None):
        nonlocal mb_state
        if self_rot is not None:
            with timer.stage("self_filter"):
                mask = np.asarray(crop_box_filter(
                    jnp.asarray(xyz), jnp.asarray(mask), self_box[0],
                    self_box[1], self_rot))
        with timer.stage("pipeline"):
            if args.mode == "loam":
                out = pipe.process(xyz, mask, ring_ids=ring)
            elif pf is not None:
                # cloud already in flight (prefetched at sweep arrival)
                out = pipe.process(pf, None, samples)
            else:
                out = pipe.process(xyz, mask, samples, ring_ids=ring)
            if timer.sync:
                jax.block_until_ready(out["laser_pose"].t)
        pose = out.get("laser_pose")
        if pose is None:
            return
        if mb_state is not None and out.get("stage") == "INITED" \
                and "corner_cloud" in out and not out.get("predicted"):
            with timer.stage("map_builder"):
                mb_state, mb_out = MB.map_builder_step(
                    mb_state, out["corner_cloud"], out["surf_cloud"], pose, cfg)
                pose_4d = mb_out["pose"]
                if timer.sync:
                    jax.block_until_ready(pose_4d.t)
            pend_t4.append(t)
            pend_q4.append(pose_4d.q)
            pend_p4.append(pose_4d.t)
        pend_t.append(t)
        pend_q.append(pose.q)
        pend_p.append(pose.t)
        if global_map is not None and out.get("stage") in ("INITED", "LOAM") \
                and not out.get("predicted"):
            map_pend.append((len(pend_t) - 1, np.asarray(xyz)[mask]))
        if len(pend_t) >= FLUSH_EVERY:
            flush()
        if args.checkpoint_out and args.checkpoint_every and \
                (len(times) + len(pend_t)) % args.checkpoint_every == 0:
            with timer.stage("checkpoint"):
                pipe.save(args.checkpoint_out)

    sweeps = {}
    times, qs, ts = [], [], []
    next_id = 0
    delay = cfg.estimator.msg_time_delay
    prev_bound = None  # (t_b, acc_b, gyr_b): interpolated interval boundary
    skip_pairs = getattr(args, "skip_pairs", 0) or 0
    # two-phase --map-out completeness: phase A's final (init) sweep is
    # the one INITED sweep whose cloud never reaches THIS process's
    # pipeline (it lives inside --skip-pairs). Its pose is the last line
    # of the phase-A prefix — insert its world-transformed cloud here so
    # the exported map matches the single-process run sweep-for-sweep.
    init_map_entry = None
    if global_map is not None and getattr(args, "traj_prefix", None) \
            and skip_pairs:
        from .io.evaluation import load_tum as _load_tum

        _tp, _qp, _pp = _load_tum(args.traj_prefix)
        if len(_tp):
            init_map_entry = (float(_tp[-1]), _qp[-1], _pp[-1])
    if getattr(args, "bound_in", None):
        # phase-B resume: the skipped pairs' IMU already lives inside the
        # checkpoint; restore the interval-boundary state the phase-A
        # process left off at so preintegration intervals stay exact
        import json as _json

        with open(args.bound_in) as f:
            _meta = _json.load(f)
        if _meta.get("prev_bound") is not None:
            _b = _meta["prev_bound"]
            prev_bound = (float(_b[0]), np.asarray(_b[1], np.float64),
                          np.asarray(_b[2], np.float64))
    stop_at_init = getattr(args, "stop_at_init", None)
    pair_idx = 0
    stopped_early = False
    _loop_t0 = _time.perf_counter()
    with device_trace(args.trace_dir):
        for item in native.SequenceLog(args.log):
            if stopped_early:
                break
            if item[0] == "imu":
                mq.push_imu(item[1], item[2], item[3])
            else:
                xyz, ring = item[2], item[4]
                # Shape bucketing: recorded sweeps carry a DIFFERENT point
                # count each (drivers drop invalid returns), and every new
                # (N, 4) shape would compile its own executable — measured
                # 475 ms/sweep average on a 400-sweep replay (each sweep a
                # fresh compile) vs ~0.5 ms once shapes repeat. Pad to the
                # next PAD_Q multiple with masked-off rows (a no-op through
                # the masked front end) so the whole log shares a handful
                # of executables.
                PAD_Q = 4096
                n_raw = len(xyz)
                n_pad = -(-max(n_raw, 1) // PAD_Q) * PAD_Q
                mask = np.zeros(n_pad, bool)
                mask[:n_raw] = True
                if n_pad != n_raw:
                    xyz = np.concatenate(
                        [xyz, np.zeros((n_pad - n_raw, 3), xyz.dtype)])
                    if ring is not None:
                        ring = np.concatenate(
                            [ring, np.zeros(n_pad - n_raw, ring.dtype)])
                # Prefetch: start the packed cloud's H2D NOW (sweep arrival
                # precedes its IMU-complete pair by several queue pushes),
                # so the ~250 KB tunnel transfer rides under the previous
                # step instead of serializing at dispatch — measured 149 ->
                # ~7 ms/sweep on the phase-B replay loop. Skipped-cadence
                # sweeps (will_consume) never transfer; the self-filter
                # path needs host-side mask edits, so it stays unprefetched.
                pf = None
                if args.mode == "lio" and not args.self_filter \
                        and pipe.will_consume(len(sweeps) + 1):
                    pf = pipe.prefetch_cloud(xyz, mask, ring)
                sweeps[next_id] = (xyz, mask, ring, pf)
                mq.push_sweep(item[1], next_id)
                next_id += 1
            while True:
                pair = mq.next_pair()
                if pair is None:
                    break
                t, sid, imu_t, acc, gyr = pair
                xyz, mask, ring, pf = sweeps.pop(sid)
                if pair_idx < skip_pairs:
                    if init_map_entry is not None \
                            and abs(t - init_map_entry[0]) < 1e-6:
                        from scipy.spatial.transform import Rotation

                        _, q_i, p_i = init_map_entry
                        world = Rotation.from_quat(np.roll(q_i, -1)) \
                            .apply(xyz[mask]) + p_i
                        global_map.insert(world.astype(np.float32))
                    pair_idx += 1
                    continue
                samples = None
                if args.mode == "lio" and len(imu_t) >= 2:
                    # split the boundary IMU sample at exactly t + delay by
                    # linear interpolation (Estimator.cc:373-385) so each
                    # preintegration interval ends at the same offset from
                    # its sweep stamp — sample-time jitter at the boundary
                    # otherwise aliases into the init gyro-bias solve
                    t_b = t + delay
                    if imu_t[-1] > t_b and len(imu_t) >= 2:
                        w = (t_b - imu_t[-2]) / max(imu_t[-1] - imu_t[-2], 1e-9)
                        acc_b = (1 - w) * acc[-2] + w * acc[-1]
                        gyr_b = (1 - w) * gyr[-2] + w * gyr[-1]
                        imu_t = np.concatenate([imu_t[:-1], [t_b]])
                        acc = np.concatenate([acc[:-1], acc_b[None]])
                        gyr = np.concatenate([gyr[:-1], gyr_b[None]])
                    else:
                        acc_b, gyr_b = acc[-1], gyr[-1]
                        t_b = imu_t[-1]
                    if prev_bound is not None:
                        t0_a, a0, w0 = prev_bound
                        keep = imu_t > t0_a + 1e-9
                        imu_ts = np.concatenate([[t0_a], imu_t[keep]])
                        dts = np.diff(imu_ts)
                        samples = pipe.make_samples(
                            dts, acc[keep], gyr[keep], a0, w0)
                    else:
                        dts = np.diff(imu_t)
                        samples = pipe.make_samples(
                            dts, acc[1:], gyr[1:], acc[0], gyr[0])
                    prev_bound = (t_b, acc_b, gyr_b)
                step(t, xyz, mask, samples, ring=ring, pf=pf)
                pair_idx += 1
                if stop_at_init and args.mode == "lio" \
                        and pipe.stage == "INITED":
                    stopped_early = True
                    break
    disp_ms = None
    _probe_cost = 0.0
    if getattr(args, "stats_json", None):
        _probe_t0 = _time.perf_counter()
        # dispatch-floor tripwire (bench.dispatch_floor_ms), measured
        # BEFORE the final flush's readbacks: ~0.03 ms means the loop ran
        # in the tunnel's streaming mode; ~1.4 ms means some readback
        # degraded it mid-loop
        probe_in = jnp.asarray(np.ones((64, 15, 15), np.float32))
        probe = jax.jit(lambda x: jnp.einsum("kij,kjl,kml->im", x, x, x))
        for _ in range(3):
            jax.block_until_ready(probe(probe_in))
        _p0 = _time.perf_counter()
        for _ in range(30):
            probe_out = probe(probe_in)
        jax.block_until_ready(probe_out)
        disp_ms = (_time.perf_counter() - _p0) / 30 * 1e3
        _probe_cost = _time.perf_counter() - _probe_t0

    flush()
    _loop_wall = _time.perf_counter() - _loop_t0 - _probe_cost

    if getattr(args, "stats_json", None):
        # production-entry-point throughput artifact (JSON): wall f/s over
        # the replay loop, with the split host-ingest / step-dispatch /
        # flush-readback and the compile cost isolated (first step).
        import json as _json

        n = stats["n_pairs"]
        # compile cost is NOT only the first step: the predict and
        # consumed-sweep executables compile on their respective FIRST
        # invocations (measured 1.3 s + 47 s on the indoor profile) —
        # classify any step > 10x the median as compile and exclude it
        # from the steady rate
        st = np.asarray(stats["step_times"]) if stats["step_times"] else \
            np.zeros(0)
        med = float(np.median(st)) if len(st) else 0.0
        compile_mask = st > 10.0 * max(med, 1e-9)
        t_compile = float(st[compile_mask].sum())
        n_steady = int((~compile_mask).sum())
        steady_wall = _loop_wall - t_compile
        payload = {
            "n_pairs": n,
            "loop_wall_s": round(_loop_wall, 4),
            "fps_total": round(n / _loop_wall, 2) if _loop_wall > 0 else 0.0,
            "fps_steady": round(n_steady / max(steady_wall - stats["t_flush"],
                                               1e-9), 2)
            if n_steady else 0.0,
            "per_step_ms_median": round(med * 1e3, 3),
            "t_compile_s": round(t_compile, 4),
            "n_compile_steps": int(compile_mask.sum()),
            "t_first_step_s": round(stats["t_first_step"], 4),
            "t_step_s": round(stats["t_step"], 4),
            "t_flush_s": round(stats["t_flush"], 4),
            "t_ingest_s": round(
                max(0.0, _loop_wall - stats["t_step"] - stats["t_flush"]), 4),
            "dispatch_floor_ms": round(disp_ms, 3) if disp_ms else None,
            "clean_stream": bool(disp_ms and disp_ms < 0.5),
            "mode": args.mode,
            "resumed": bool(args.resume),
        }
        with open(args.stats_json, "w") as f:
            _json.dump(payload, f)
        print(f"replay stats -> {args.stats_json}: "
              f"{payload['fps_steady']} f/s steady "
              f"({payload['fps_total']} incl. compile)")

    if stop_at_init:
        # phase A of --two-phase: checkpoint + sidecar, partial trajectory
        import json as _json

        if args.checkpoint_out:
            pipe.save(args.checkpoint_out)
        meta = {
            "inited": pipe.stage == "INITED" if args.mode == "lio" else True,
            "pairs": pair_idx,
            "prev_bound": None if prev_bound is None else [
                float(prev_bound[0]),
                np.asarray(prev_bound[1], np.float64).tolist(),
                np.asarray(prev_bound[2], np.float64).tolist()],
        }
        with open(stop_at_init, "w") as f:
            _json.dump(meta, f)
        if times:
            save_tum(args.out, times, np.stack(qs), np.stack(ts))
        else:
            open(args.out, "w").close()
        print(f"stopped after init: {pair_idx} pairs, "
              f"checkpoint {args.checkpoint_out}, sidecar {stop_at_init}")
        return 0

    if getattr(args, "traj_prefix", None):
        from .io.evaluation import load_tum

        t_pre, q_pre, p_pre = load_tum(args.traj_prefix)
        times = list(t_pre) + times
        qs = list(q_pre) + qs
        ts = list(p_pre) + ts

    save_tum(args.out, times, np.stack(qs), np.stack(ts))
    stage = pipe.stage if args.mode == "lio" else "LOAM"
    print(f"wrote {len(times)} poses to {args.out} (stage: {stage})")
    if args.out_4d and times_4d:
        save_tum(args.out_4d, times_4d, np.stack(qs_4d), np.stack(ts_4d))
        print(f"wrote {len(times_4d)} 4D-refined poses to {args.out_4d}")
    if global_map is not None:
        global_map.save_pcd(args.map_out)
        print(f"wrote {len(global_map)} map voxels to {args.map_out}")
    if args.checkpoint_out:
        pipe.save(args.checkpoint_out)
        print(f"wrote checkpoint to {args.checkpoint_out}")
    if args.timing:
        print(timer.report())
    return 0


def cmd_export_pcd(args):
    """Offline sequence-log + trajectory -> aggregated world-frame PCD.

    Parity: src/save_bag_to_pcd.cc:60-105 — the reference replays a
    recorded bag of registered clouds + mapped odometry into one PCD; here
    the sweeps come from the sequence log and the poses from a TUM
    trajectory (matched by timestamp, |dt| <= half a scan period).
    """
    import jax.numpy as jnp

    from . import native
    from .io.evaluation import load_tum
    from .utils import quaternion as quat

    t_tr, q_tr, p_tr = load_tum(args.traj)
    gmap = native.GlobalVoxelMap(args.leaf)
    half = 0.05
    n_used = 0
    for item in native.SequenceLog(args.log):
        if item[0] != "sweep":
            continue
        t, xyz = item[1], item[2]
        i = int(np.argmin(np.abs(t_tr - t)))
        if abs(t_tr[i] - t) > half:
            continue
        world = np.asarray(quat.rotate(jnp.asarray(q_tr[i])[None, :],
                                       jnp.asarray(xyz))) + p_tr[i]
        gmap.insert(world)
        n_used += 1
    gmap.save_pcd(args.out)
    print(f"aggregated {n_used} sweeps -> {len(gmap)} voxels in {args.out}")
    return 0


def cmd_bag_info(args):
    """Topic inventory of a rosbag (``rosbag info`` equivalent)."""
    from .io.rosbag import BagReader

    info = BagReader(args.bag).topics()
    for topic, (msg_type, count) in sorted(info.items()):
        print(f"{topic:40s} {msg_type:30s} {count:8d} msgs")
    return 0


def cmd_convert_bag(args):
    """rosbag -> sequence log (the reference's `rosbag play` entry point).

    Topics default to the largest sensor_msgs/PointCloud2 and
    sensor_msgs/Imu topics in the bag (the reference remaps
    /velodyne_points + /imu/data in its launch files)."""
    from .io.rosbag import convert_bag

    n_sweeps, n_imu = convert_bag(
        args.bag, args.out, points_topic=args.points_topic,
        imu_topic=args.imu_topic, scan_period=args.scan_period,
        min_range=args.min_range)
    print(f"converted {n_sweeps} sweeps + {n_imu} imu msgs -> {args.out}")
    if n_sweeps == 0:
        print("warning: no sweeps converted (check --points-topic)")
        return 1
    return 0


def cmd_export_bag(args):
    """Sequence log -> rosbag (for ROS-side tooling/rviz replay)."""
    from . import native
    from .io import rosbag as RB

    n = 0
    with RB.BagWriter(args.out, compression=args.compression) as w:
        for item in native.SequenceLog(args.log):
            if item[0] == "sweep":
                _, t, xyz, rel, ring = item
                w.write(args.points_topic, "sensor_msgs/PointCloud2", t,
                        RB.serialize_pointcloud2(t, xyz, rel, ring=ring))
            else:
                _, t, acc, gyr = item
                w.write(args.imu_topic, "sensor_msgs/Imu", t,
                        RB.serialize_imu(t, acc, gyr))
            n += 1
    print(f"wrote {n} messages to {args.out}")
    return 0


def cmd_plot_traj(args):
    """Trajectory dashboards: XY path, altitude, euler angles.

    Parity: scripts/transform_monitor.py (euler republisher) +
    scripts/debug_plot.sh (rqt_plot driver) — rendered straight to PNG,
    with an optional euler CSV for external tooling.
    """
    from .io.evaluation import load_tum
    from .io.viz import plot_trajectory, save_euler_csv

    t_e, q_e, p_e = load_tum(args.est)
    gt = None
    if args.gt:
        gt = load_tum(args.gt)
    plot_trajectory(args.out, t_e, q_e, p_e, gt=gt, title=args.title)
    print(f"wrote {args.out}")
    if args.euler_csv:
        save_euler_csv(args.euler_csv, t_e, q_e)
        print(f"wrote {args.euler_csv}")
    return 0


def cmd_viz_normals(args):
    """Local map + fitted plane normals export (PlaneNormalVisualizer).

    Rebuilds the estimator's association view at one sweep: the previous
    ``--frames`` sweeps (posed by the TUM trajectory) form a pivot-frame
    local map, the target sweep's points associate against it with the
    SAME device kernels the estimator runs (KNN + plane fit), and the
    accepted features are written as a normals-annotated PLY alongside the
    map cloud (Visualizer.h:75-106, the score/point/coeff multimap view).
    """
    import jax.numpy as jnp

    from . import native
    from .io.evaluation import load_tum
    from .io.viz import save_ply_cloud, save_ply_normals
    from .models import estimator as EST
    from .ops import voxel as VX
    from .utils import quaternion as quat
    from .utils.se3 import Pose

    cfg = _profile(args.profile)
    e = cfg.estimator
    t_tr, q_tr, p_tr = load_tum(args.traj)

    posed = []  # (t, xyz, Pose)
    half = 0.05
    for item in native.SequenceLog(args.log):
        if item[0] != "sweep":
            continue
        t, xyz = item[1], item[2]
        i = int(np.argmin(np.abs(t_tr - t)))
        if abs(t_tr[i] - t) > half:
            continue
        posed.append((t, xyz, Pose(jnp.asarray(q_tr[i], jnp.float32),
                                   jnp.asarray(p_tr[i], jnp.float32))))
    if len(posed) < 2:
        print("not enough posed sweeps")
        return 1
    idx = args.index if args.index >= 0 else len(posed) - 1
    idx = min(max(idx, 1), len(posed) - 1)
    first = max(0, idx - args.frames)
    pivot_pose = posed[idx][2]

    # map: sweeps [first, idx) in the pivot frame
    pts = []
    for t, xyz, pose in posed[first:idx]:
        rel = pivot_pose.inverse() @ pose
        pts.append(np.asarray(
            quat.rotate(rel.q[None, :], jnp.asarray(xyz, jnp.float32))
            + rel.t[None, :]))
    merged = np.concatenate(pts, axis=0)
    map_xyz, map_mask, _ = VX.voxel_downsample(
        jnp.asarray(merged), jnp.ones((len(merged),), bool),
        e.surf_filter_size, e.local_map_filtered_cap)

    q_xyz, q_mask, _ = VX.voxel_downsample(
        jnp.asarray(posed[idx][1], jnp.float32),
        jnp.ones((len(posed[idx][1]),), bool),
        e.surf_filter_size, e.surf_stack_cap)
    in_fov = jnp.ones(q_xyz.shape[:1], bool)
    coeff, score, ok = EST._surf_rows(
        EST.make_knn5(map_xyz, map_mask, cfg), q_xyz, q_mask, in_fov, cfg)

    okn = np.asarray(ok)
    s_np = np.asarray(score)[okn]
    normals = np.asarray(coeff)[okn, :3] / np.maximum(s_np, 1e-6)[:, None]
    save_ply_normals(args.out, np.asarray(q_xyz)[okn], normals, s_np)
    print(f"wrote {int(okn.sum())} features with normals to {args.out}")
    if args.map_out:
        save_ply_cloud(args.map_out, np.asarray(map_xyz)[np.asarray(map_mask)])
        print(f"wrote local map to {args.map_out}")
    return 0


def cmd_evaluate(args):
    from .io.evaluation import associate_by_time, evaluate_trajectory, load_tum

    t_e, q_e, p_e = load_tum(args.est)
    t_g, q_g, p_g = load_tum(args.gt)
    ei, gi = associate_by_time(t_e, t_g, max_dt=args.max_dt)
    if len(ei) < 2:
        print(f"only {len(ei)} timestamp matches within {args.max_dt}s — "
              "check the trajectories' time bases")
        return 1
    m = evaluate_trajectory(q_e[ei], p_e[ei], q_g[gi], p_g[gi])
    print(f"matched {len(ei)}/{len(t_e)} poses by timestamp (max_dt {args.max_dt}s)")
    print(f"ATE RMSE: {m.ate_rmse:.4f} m  mean {m.ate_mean:.4f}  max {m.ate_max:.4f}")
    print(f"RPE: {m.rpe_trans_rmse:.4f} m / {m.rpe_rot_rmse_deg:.3f} deg over {m.n_poses} poses")
    return 0


def _honor_platform_env():
    """Re-assert ``JAX_PLATFORMS`` from the environment.

    Accelerator plugins registered via sitecustomize may override the
    platform selection AFTER jax captured the env var (the tunneled-TPU
    ``axon.register()`` sets ``jax_platforms="axon,cpu"`` unconditionally),
    so ``JAX_PLATFORMS=cpu python -m lio_mapping_tpu.cli ...`` would
    silently run on the accelerator. The CLI is a process entry point, so
    the env var is the user's explicit platform choice — make it stick.
    (Found via the two-phase equivalence test: its CLI subprocesses ran
    on TPU f32 while the in-process reference ran CPU f64.)
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        if str(jax.config.jax_platforms or "") != plat:
            jax.config.update("jax_platforms", plat)


def main(argv=None):
    _honor_platform_env()
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
    p.add_argument("--extrinsic-translation", nargs=3, type=float,
                   default=None, metavar=("X", "Y", "Z"),
                   help="laser->body rig offset t_lb (m)")
    p.add_argument("--extrinsic-ypr-deg", nargs=3, type=float,
                   default=None, metavar=("YAW", "PITCH", "ROLL"),
                   help="laser->body rig rotation (deg, ZYX)")
    p.set_defaults(fn=cmd_simulate)

    p = sub.add_parser("run")
    p.add_argument("--log", required=True)
    p.add_argument("--profile", default="indoor",
                   choices=["indoor", "outdoor", "outdoor_64"])
    p.add_argument("--config", default=None,
                   help="YAML profile file overriding --profile "
                        "(configs/*.yaml format)")
    p.add_argument("--out", required=True)
    p.add_argument("--map-out", default=None)
    p.add_argument("--mode", default="lio", choices=["lio", "loam"],
                   help="lio = tightly-coupled estimator (test_indoor.launch); "
                        "loam = LiDAR-only baseline (16_scans_test.launch)")
    p.add_argument("--enable-4d", action="store_true",
                   help="run the yaw-constrained 4D map builder on the "
                        "estimator output (map_4D_indoor.launch)")
    p.add_argument("--out-4d", default=None,
                   help="TUM output for the 4D-refined trajectory")
    p.add_argument("--self-filter", action="store_true",
                   help="KAIST-rig vehicle crop-box self-filter "
                        "(input_filters_node.cc)")
    p.add_argument("--timing", action="store_true",
                   help="per-stage wall-clock report (TicToc equivalent)")
    p.add_argument("--trace-dir", default=None,
                   help="write a jax.profiler device trace here")
    p.add_argument("--checkpoint-out", default=None)
    p.add_argument("--checkpoint-every", type=int, default=0)
    p.add_argument("--resume", default=None)
    p.add_argument("--mesh", type=int, default=0,
                   help="run the estimator step distributed over this many "
                        "devices (full lio_step under shard_map)")
    p.add_argument("--map-shard", action="store_true",
                   help="with --mesh: shard the local map too "
                        "(ppermute-ring association)")
    p.add_argument("--ingest-shard", action="store_true",
                   help="with --mesh: each process/device transfers only "
                        "its row slice of the packed cloud (on-device "
                        "all_gather reassembles it)")
    p.add_argument("--two-phase", action="store_true",
                   help="clean-stream deployment: initialize in a "
                        "throwaway subprocess, then replay the rest in a "
                        "fresh process that resumes H2D-only and streams "
                        "with zero device readbacks (on the tunneled TPU "
                        "a single readback permanently degrades dispatch "
                        "~45x — see README 'device-queue discipline'). "
                        "--map-out is complete (phase B inserts the init "
                        "sweep's cloud at its phase-A pose); --out-4d/"
                        "--enable-4d start one sweep after init (the 4D "
                        "builder needs the init sweep's device-side "
                        "feature clouds, which live in the throwaway "
                        "phase-A process)")
    # internal worker flags for --two-phase (also usable directly to
    # resume a checkpointed replay mid-log)
    p.add_argument("--stop-at-init", default=None, metavar="SIDECAR",
                   help="stop right after initialization succeeds; write "
                        "pair-count + IMU-boundary state to this JSON "
                        "(requires --checkpoint-out)")
    p.add_argument("--skip-pairs", type=int, default=0,
                   help="with --resume: skip the first N measurement "
                        "pairs of the log (already inside the checkpoint)")
    p.add_argument("--bound-in", default=None,
                   help="with --resume: restore the IMU interval-boundary "
                        "state from a --stop-at-init sidecar")
    p.add_argument("--traj-prefix", default=None,
                   help="prepend this TUM file's poses to --out")
    p.add_argument("--stats-json", default=None,
                   help="write replay-loop throughput stats (f/s, "
                        "ingest/dispatch/flush wall split) to this JSON; "
                        "with --two-phase, reports phase B (the streaming "
                        "deployment loop)")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: "
                        "repeat runs skip the ~47 s estimator compile "
                        "(with --two-phase, phase B reuses phase A's "
                        "predict/odometry compiles too)")
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("bag-info")
    p.add_argument("--bag", required=True)
    p.set_defaults(fn=cmd_bag_info)

    p = sub.add_parser("convert-bag")
    p.add_argument("--bag", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--points-topic", default=None)
    p.add_argument("--imu-topic", default=None)
    p.add_argument("--scan-period", type=float, default=0.1)
    p.add_argument("--min-range", type=float, default=0.0,
                   help="drop points closer than this (self-returns)")
    p.set_defaults(fn=cmd_convert_bag)

    p = sub.add_parser("export-bag")
    p.add_argument("--log", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--points-topic", default="/velodyne_points")
    p.add_argument("--imu-topic", default="/imu/data")
    p.add_argument("--compression", default="bz2", choices=["none", "bz2"])
    p.set_defaults(fn=cmd_export_bag)

    p = sub.add_parser("evaluate")
    p.add_argument("--est", required=True)
    p.add_argument("--gt", required=True)
    p.add_argument("--max-dt", type=float, default=0.02,
                   help="max |dt| for nearest-timestamp pose association")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("plot-traj")
    p.add_argument("--est", required=True)
    p.add_argument("--gt", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--euler-csv", default=None,
                   help="also write t,yaw,pitch,roll CSV "
                        "(transform_monitor.py output)")
    p.add_argument("--title", default="trajectory")
    p.set_defaults(fn=cmd_plot_traj)

    p = sub.add_parser("viz-normals")
    p.add_argument("--log", required=True)
    p.add_argument("--traj", required=True)
    p.add_argument("--out", required=True, help="features+normals PLY")
    p.add_argument("--map-out", default=None, help="local-map PLY")
    p.add_argument("--index", type=int, default=-1,
                   help="sweep index to associate (-1 = last)")
    p.add_argument("--frames", type=int, default=10,
                   help="how many previous sweeps build the local map")
    p.add_argument("--profile", default="indoor",
                   choices=["indoor", "outdoor", "outdoor_64"])
    p.set_defaults(fn=cmd_viz_normals)

    p = sub.add_parser("export-pcd")
    p.add_argument("--log", required=True)
    p.add_argument("--traj", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--leaf", type=float, default=0.2)
    p.set_defaults(fn=cmd_export_pcd)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
