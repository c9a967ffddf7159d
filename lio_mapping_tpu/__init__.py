"""lio_mapping_tpu: a TPU-native LiDAR-inertial SLAM engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference LIO-mapping system (hyye/lio-mapping, ICRA 2019): LOAM-style
feature extraction, scan-to-scan odometry, tightly-coupled sliding-window
LiDAR-inertial optimization with marginalization priors, scan-to-map
refinement with a voxel map, and yaw-constrained global map building —
all as fixed-shape, batched, jit-compiled array programs.
"""

__version__ = "0.1.0"

from . import utils  # noqa: F401
