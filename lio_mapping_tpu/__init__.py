"""lio_mapping_tpu: a TPU-native LiDAR-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference LIO-mapping system (hyye/lio-mapping, ICRA 2019): LOAM-style
feature extraction, scan-to-scan odometry, tightly-coupled sliding-window
LiDAR-inertial optimization with marginalization priors, scan-to-map
refinement with a voxel map, and yaw-constrained global map building —
all as fixed-shape, batched, jit-compiled array programs.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# On TPU, float32 matmul inputs are truncated to bfloat16 on the MXU by
# default. The estimator's normal-equation assembly and 126-dim window
# solves are ill-conditioned enough that this costs ~10x trajectory
# accuracy (measured: 4.7 m vs 0.54 m ATE RMSE on the synthetic indoor
# sequence, TPU-default vs full-f32). Default to full-f32 ("highest" =
# 6-pass bf16 emulation); kernels that tolerate bf16 opt back down
# explicitly via jax.lax.Precision at their call sites.
_jax.config.update(
    "jax_default_matmul_precision",
    _os.environ.get("LIO_MATMUL_PRECISION", "highest"))

from . import utils  # noqa: F401,E402
