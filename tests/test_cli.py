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
