#!/bin/bash
# Fast CPU test runner.
#
# The baked axon TPU plugin (PYTHONPATH=/root/.axon_site) adds a ~150 s
# backend-init handshake to EVERY python process, even under
# JAX_PLATFORMS=cpu. Clearing PYTHONPATH skips the plugin entirely for
# CPU-only test runs. TPU runs (bench.py) keep the default environment.
cd "$(dirname "$0")"
PYTHONPATH="$(pwd)" JAX_PLATFORMS=cpu exec python -m pytest tests/ "$@"
