"""Test harness configuration.

Tests run on a virtual 8-device CPU mesh (the driver separately dry-runs the
multi-chip path); float64 is enabled so numeric-vs-analytic Jacobian checks
(the reference's factor ``Check()`` pattern) can use tight tolerances.
"""

import os

if os.environ.get("LIO_TEST_TPU"):
    # On-device accuracy gates (verify skill: LIO_TEST_TPU=1 pytest -m tpu):
    # keep the attached accelerator and the production f32 dtype.
    import jax
else:
    # Force CPU: the driver environment may preset JAX_PLATFORMS=axon
    # (tunneled TPU), and its sitecustomize imports jax at interpreter
    # start — so jax has already captured the env var. Setting the env
    # alone is too late; update the live config too. Unit tests must run
    # on the virtual 8-device CPU mesh.
    os.environ["JAX_PLATFORMS"] = "cpu"
    # Export x64 via the environment too (not only jax.config.update):
    # e2e tests spawn `python -m lio_mapping_tpu.cli` subprocesses, and an
    # in-process-only config would leave them on f32 — the two runs would
    # then diverge numerically (advisor r4: the two-phase equivalence test
    # failed exactly this way, falsely implicating the resume path).
    os.environ["JAX_ENABLE_X64"] = "1"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
