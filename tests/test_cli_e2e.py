"""End-to-end CLI loop in CI (VERDICT r3 next #1).

One closed path through every host-side ingest stage, driven purely via
``cli.main`` — the reference's only integration test is exactly this bag
replay (/root/reference/README.md:31-36, rosbag play -> nodes -> rviz):

    simulate -> export-bag -> convert-bag (rosbag round trip)
      -> run --mode lio (MeasurementQueue pairing + IMU boundary
         interpolation, cli.py; full pipeline; --map-out global map;
         --enable-4d map builder) -> evaluate (ATE gate)

plus a ``run --mesh 2`` variant of the same loop (distributed estimator
program from the CLI, virtual CPU devices).
"""

import re

import numpy as np
import pytest
import yaml

from lio_mapping_tpu import cli

N_SWEEPS = 30

SMALL_PROFILE = {
    # small_cfg caps (tests/test_lio_pipeline.py) as a YAML profile: the
    # CLI path must go through --config exactly like a user profile
    "estimator": {
        "window_size": 5,
        "opt_window_size": 3,
        "init_window_factor": 1,
        "estimate_extrinsic": 0,
        "opt_extrinsic": False,
        "extrinsic_rotation": [1, 0, 0, 0, 1, 0, 0, 0, 1],
        "extrinsic_translation": [0.0, 0.0, 0.0],
        "surf_stack_cap": 2048,
        "local_map_filtered_cap": 8192,
        "features_per_frame_cap": 2048,
        "max_solver_iterations": 8,
    },
}


@pytest.fixture(scope="module")
def sequence(tmp_path_factory):
    """simulate -> export-bag -> convert-bag: the converted log + GT."""
    d = tmp_path_factory.mktemp("e2e")
    log = str(d / "seq.liol")
    gt = str(d / "gt.tum")
    bag = str(d / "seq.bag")
    log2 = str(d / "seq_roundtrip.liol")
    cfg_yaml = str(d / "small.yaml")

    assert cli.main(["simulate", "--out", log, "--sweeps", str(N_SWEEPS),
                     "--azimuth", "300", "--gt-out", gt]) == 0
    assert cli.main(["export-bag", "--log", log, "--out", bag]) == 0
    assert cli.main(["convert-bag", "--bag", bag, "--out", log2]) == 0
    with open(cfg_yaml, "w") as f:
        yaml.safe_dump(SMALL_PROFILE, f)
    return {"dir": d, "log": log2, "gt": gt, "cfg": cfg_yaml}


def _ate(capsys, est, gt):
    assert cli.main(["evaluate", "--est", est, "--gt", gt]) == 0
    out = capsys.readouterr().out
    m = re.search(r"ATE RMSE: ([0-9.]+) m", out)
    assert m, out
    return float(m.group(1))


@pytest.mark.slow
def test_full_cli_loop(sequence, capsys):
    """The flagship accuracy claim's exact host path, guarded in CI: bag
    round trip -> MeasurementQueue -> boundary interpolation -> pipeline
    -> timestamp-matched evaluate, with --map-out and --enable-4d on."""
    d = sequence["dir"]
    traj = str(d / "traj.tum")
    traj4d = str(d / "traj_4d.tum")
    pcd = str(d / "map.pcd")
    stats = str(d / "stats.json")

    assert cli.main(["run", "--log", sequence["log"], "--config",
                     sequence["cfg"], "--out", traj, "--mode", "lio",
                     "--map-out", pcd, "--enable-4d", "--out-4d",
                     traj4d, "--stats-json", stats]) == 0
    out = capsys.readouterr().out
    assert "stage: INITED" in out, out
    assert "4D-refined poses" in out, out
    m = re.search(r"wrote (\d+) map voxels", out)
    assert m and int(m.group(1)) > 500, out

    ate = _ate(capsys, traj, sequence["gt"])
    # measured 0.29 m on this 30-sweep sequence (CPU f32) — the init
    # transient dominates at this length (the 90-sweep on-device flagship
    # run reaches 0.18 m); gate at measured + 50%
    assert ate < 0.45, f"CLI loop ATE {ate} m"

    # the 4D refinement consumes the estimator output and must not wreck it
    ate4d = _ate(capsys, traj4d, sequence["gt"])
    assert ate4d < max(2.0 * ate, 0.3), f"4D ATE {ate4d} vs LIO {ate}"

    # exported map is a sane reconstruction: valid header, enough points
    with open(pcd, "rb") as f:
        head = f.read(300).decode("ascii", "ignore")
    assert "POINTS" in head and "DATA" in head

    # replay stats artifact (the driver-facing throughput record): all
    # pairs accounted, wall split fields present and self-consistent
    import json

    with open(stats) as f:
        st = json.load(f)
    assert st["n_pairs"] == N_SWEEPS - 1  # first sweep awaits leading IMU
    for key in ("fps_steady", "per_step_ms_median", "t_compile_s",
                "t_flush_s", "t_ingest_s", "dispatch_floor_ms"):
        assert key in st, key
    assert st["fps_steady"] > 0
    assert st["t_step_s"] <= st["loop_wall_s"] + 1e-6


@pytest.mark.slow
def test_full_cli_loop_mesh2(sequence, capsys):
    """Same loop distributed: run --mesh 2 builds the shard_map estimator
    program over a 2-device mesh from the CLI."""
    d = sequence["dir"]
    traj = str(d / "traj_mesh2.tum")

    assert cli.main(["run", "--log", sequence["log"], "--config",
                     sequence["cfg"], "--out", traj, "--mode", "lio",
                     "--mesh", "2"]) == 0
    out = capsys.readouterr().out
    assert "distributed estimator over 2 devices" in out
    assert "stage: INITED" in out, out

    ate = _ate(capsys, traj, sequence["gt"])
    # psum ordering differs from single-device; same gate with headroom
    assert ate < 0.45, f"mesh-2 CLI loop ATE {ate} m"


@pytest.mark.slow
def test_ring_annotated_uneven_e2e(sequence, capsys):
    """sensor_type-320 path end-to-end (VERDICT r4 next #3): a bag whose
    clouds carry ONLY ring annotations (Velodyne-driver `ring` PointField)
    drives the full CLI loop under a ``sensor.uneven`` profile —
    convert-bag carries the rings into the .liol v2 log, the pipeline
    threads them to the device program, and project_to_rings uses them
    in place of elevation binning (processor_node.cc:68-74,
    point_types.h:37-44)."""
    from lio_mapping_tpu import native
    from lio_mapping_tpu.io import rosbag as RB

    d = sequence["dir"]
    bag = str(d / "ring.bag")
    log_r = str(d / "ring.liol")
    cfg_yaml = str(d / "uneven.yaml")
    traj = str(d / "traj_uneven.tum")

    # annotate each simulated sweep with its elevation-derived ring id;
    # the run below must recover the same binning from the annotation
    # alone (sensor.uneven skips elevation entirely)
    n_rings, lo, hi = 16, -15.0, 15.0
    factor = (n_rings - 1) / (hi - lo)
    n_ann = 0
    with RB.BagWriter(bag, compression="bz2") as w:
        for item in native.SequenceLog(sequence["log"]):
            if item[0] == "imu":
                _, t, acc, gyr = item
                w.write("/imu/data", "sensor_msgs/Imu", t,
                        RB.serialize_imu(t, acc, gyr))
            else:
                t, xyz = item[1], item[2]
                ele = np.degrees(np.arctan2(
                    xyz[:, 2], np.hypot(xyz[:, 0], xyz[:, 1])))
                ring = np.floor((ele - lo) * factor + 0.5).astype(np.int32)
                keep = (ring >= 0) & (ring < n_rings)
                w.write("/velodyne_points", "sensor_msgs/PointCloud2", t,
                        RB.serialize_pointcloud2(
                            t, xyz[keep], None,
                            ring[keep].astype(np.uint16)))
                n_ann += 1
    assert n_ann == N_SWEEPS
    assert cli.main(["convert-bag", "--bag", bag, "--out", log_r]) == 0
    capsys.readouterr()

    with open(cfg_yaml, "w") as f:
        yaml.safe_dump({**SMALL_PROFILE, "sensor": {"uneven": True}}, f)
    assert cli.main(["run", "--log", log_r, "--config", cfg_yaml,
                     "--out", traj, "--mode", "lio"]) == 0
    out = capsys.readouterr().out
    assert "stage: INITED" in out, out
    ate = _ate(capsys, traj, sequence["gt"])
    assert ate < 0.45, f"uneven-profile CLI loop ATE {ate} m"

    # an uneven profile without ring data must fail loudly, not produce a
    # silently wrong elevation binning
    with pytest.raises(ValueError, match="ring"):
        cli.main(["run", "--log", sequence["log"], "--config", cfg_yaml,
                  "--out", str(d / "nope.tum"), "--mode", "lio"])


@pytest.mark.slow
def test_two_phase_clean_stream_matches_single(sequence, capsys):
    """``run --two-phase`` (init in a throwaway subprocess, H2D-only
    resume + zero-readback stream in a fresh one — the clean-stream
    deployment, README 'device-queue discipline') must reproduce the
    single-process trajectory pose-for-pose: the checkpoint round trip is
    exact, the IMU boundary state is carried via the sidecar, and pair
    skipping replays the identical measurement pairing."""
    from lio_mapping_tpu.io.evaluation import load_tum

    d = sequence["dir"]
    traj_sp = str(d / "traj_sp.tum")
    traj_tp = str(d / "traj_tp.tum")
    map_sp = str(d / "map_sp.pcd")
    map_tp = str(d / "map_tp.pcd")

    assert cli.main(["run", "--log", sequence["log"], "--config",
                     sequence["cfg"], "--out", traj_sp,
                     "--map-out", map_sp, "--mode", "lio"]) == 0
    assert cli.main(["run", "--log", sequence["log"], "--config",
                     sequence["cfg"], "--out", traj_tp, "--mode", "lio",
                     "--map-out", map_tp, "--two-phase"]) == 0

    t_sp, q_sp, p_sp = load_tum(traj_sp)
    t_tp, q_tp, p_tp = load_tum(traj_tp)
    assert len(t_tp) == len(t_sp), (len(t_tp), len(t_sp))
    np.testing.assert_allclose(t_tp, t_sp, atol=1e-6)
    np.testing.assert_allclose(p_tp, p_sp, atol=1e-4,
                               err_msg="two-phase trajectory diverged")
    # quaternion sign is gauge; compare |dot|
    dots = np.abs(np.sum(q_tp * q_sp, axis=-1))
    assert dots.min() > 1.0 - 1e-6, f"min |q dot| {dots.min()}"

    # --map-out parity: phase B re-inserts the init sweep's cloud at its
    # phase-A pose, so the exported maps hold the SAME voxel set (poses
    # are identical, hence identical world points and voxel keys)
    def _n_voxels(path):
        with open(path, "rb") as f:
            head = f.read(300).decode("ascii", "ignore")
        m = re.search(r"POINTS (\d+)", head)
        assert m, head
        return int(m.group(1))

    n_sp, n_tp = _n_voxels(map_sp), _n_voxels(map_tp)
    assert n_sp == n_tp, f"two-phase map lost voxels: {n_tp} vs {n_sp}"
