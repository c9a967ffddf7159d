"""CLI smoke tests: simulate -> export-pcd -> evaluate round trip.

Covers the node-executable surface (SURVEY §2 #21) without paying a
pipeline compile: the sequence-log writer, the offline PCD aggregator
(save_bag_to_pcd parity), and the trajectory evaluator.
"""

import numpy as np

from lio_mapping_tpu import cli


def test_simulate_export_evaluate(tmp_path, capsys):
    log = str(tmp_path / "seq.liol")
    gt = str(tmp_path / "gt.tum")
    pcd = str(tmp_path / "map.pcd")

    assert cli.main(["simulate", "--out", log, "--sweeps", "3",
                     "--azimuth", "120", "--gt-out", gt]) == 0
    assert cli.main(["export-pcd", "--log", log, "--traj", gt,
                     "--out", pcd, "--leaf", "0.5"]) == 0
    out = capsys.readouterr().out
    assert "aggregated 3 sweeps" in out

    # pcd has a valid header and points
    with open(pcd, "rb") as f:
        head = f.read(200).decode("ascii", "ignore")
    assert "POINTS" in head and "DATA" in head

    assert cli.main(["evaluate", "--est", gt, "--gt", gt]) == 0
    out = capsys.readouterr().out
    assert "ATE RMSE: 0.0000" in out


def test_yaml_profiles_match_presets():
    """configs/*.yaml (the reference's cv::FileStorage mechanism) must load
    hashable (jit-static) and stay in sync with the coded presets."""
    import os

    from lio_mapping_tpu.config import LioConfig, load_yaml

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    presets = {"indoor": LioConfig.indoor, "outdoor": LioConfig.outdoor,
               "outdoor_64": LioConfig.outdoor_64}
    for name, preset in presets.items():
        cfg = load_yaml(os.path.join(root, f"{name}.yaml"))
        hash(cfg)  # static-arg requirement
        assert cfg == preset(), f"configs/{name}.yaml drifted from preset"


def test_plot_traj_and_viz_normals(tmp_path, capsys):
    """Visualizer-parity surfaces: euler dashboards + normals PLY export."""
    log = str(tmp_path / "seq.liol")
    gt = str(tmp_path / "gt.tum")
    png = str(tmp_path / "dash.png")
    csv = str(tmp_path / "euler.csv")
    ply = str(tmp_path / "normals.ply")
    map_ply = str(tmp_path / "map.ply")

    cli.main(["simulate", "--out", log, "--sweeps", "6",
              "--azimuth", "240", "--gt-out", gt])
    assert cli.main(["plot-traj", "--est", gt, "--gt", gt, "--out", png,
                     "--euler-csv", csv]) == 0
    with open(csv) as f:
        header = f.readline().strip()
    assert header == "t,yaw_deg,pitch_deg,roll_deg"
    assert len(open(csv).readlines()) == 7
    import os

    assert os.path.getsize(png) > 1000

    assert cli.main(["viz-normals", "--log", log, "--traj", gt,
                     "--out", ply, "--map-out", map_ply,
                     "--frames", "4"]) == 0
    out = capsys.readouterr().out
    assert "features with normals" in out
    with open(ply) as f:
        head = f.read(400)
    assert "property float nx" in head and "property float quality" in head
    # normals are unit-ish
    rows = np.loadtxt(ply, skiprows=11)
    if rows.ndim == 2 and len(rows):
        n = rows[:, 3:6]
        np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-2)


def test_trajectory_matches_log_timestamps(tmp_path):
    """Every sweep in the log finds a trajectory pose within half a scan
    period (the export-pcd association contract)."""
    from lio_mapping_tpu import native
    from lio_mapping_tpu.io.evaluation import load_tum

    log = str(tmp_path / "seq.liol")
    gt = str(tmp_path / "gt.tum")
    cli.main(["simulate", "--out", log, "--sweeps", "4",
              "--azimuth", "120", "--gt-out", gt])
    t_tr, _, _ = load_tum(gt)
    sweep_ts = [item[1] for item in native.SequenceLog(log)
                if item[0] == "sweep"]
    assert len(sweep_ts) == 4
    for t in sweep_ts:
        assert np.min(np.abs(t_tr - t)) < 0.05


def test_evaluate_timestamp_association(tmp_path, capsys):
    """evaluate pairs poses by nearest timestamp (TUM convention), so an
    estimate missing its first frames (LIO init) still scores correctly
    against a full-length GT file; index truncation would misalign every
    pair (VERDICT r2 weak #6)."""
    from lio_mapping_tpu.io.evaluation import (associate_by_time, load_tum,
                                               save_tum)

    rng = np.random.default_rng(3)
    n = 20
    times = 0.1 * np.arange(n) + 0.1
    ps = np.cumsum(rng.normal(0, 0.5, (n, 3)), axis=0)
    qs = np.tile([1.0, 0, 0, 0], (n, 1))

    gt = str(tmp_path / "gt.tum")
    est = str(tmp_path / "est.tum")
    save_tum(gt, times, qs, ps)
    # estimate drops the first 5 frames and jitters stamps by <2ms
    keep = slice(5, None)
    save_tum(est, times[keep] + rng.uniform(-2e-3, 2e-3, n - 5),
             qs[keep], ps[keep])

    assert cli.main(["evaluate", "--est", est, "--gt", gt]) == 0
    out = capsys.readouterr().out
    assert f"matched {n - 5}/{n - 5} poses" in out
    assert "ATE RMSE: 0.0000" in out

    # the exact index pairing survives an offset start
    ei, gi = associate_by_time(load_tum(est)[0], load_tum(gt)[0])
    np.testing.assert_array_equal(gi - ei, np.full(n - 5, 5))

    # no matches when time bases disagree -> hard failure, not garbage ATE
    far = str(tmp_path / "far.tum")
    save_tum(far, times[keep] + 1000.0, qs[keep], ps[keep])
    assert cli.main(["evaluate", "--est", far, "--gt", gt]) == 1


def test_run_flag_validation(tmp_path, capsys):
    """Advisor-r4 flag hygiene: --stop-at-init without --checkpoint-out
    and --two-phase with --resume are refused up front (exit 2) instead
    of silently producing an unresumable sidecar / ignoring the resume."""
    log = str(tmp_path / "missing.liol")  # never opened: validation first
    rc = cli.main(["run", "--log", log, "--out", str(tmp_path / "t.tum"),
                   "--mode", "lio", "--stop-at-init",
                   str(tmp_path / "side.json")])
    assert rc == 2

    rc = cli.main(["run", "--log", log, "--out", str(tmp_path / "t.tum"),
                   "--mode", "lio", "--two-phase", "--resume",
                   str(tmp_path / "ck.npz")])
    assert rc == 2
