"""Front-end stage: raw sweep -> LOAM features.

The TPU equivalent of the reference's ``PointProcessor`` node
(src/point_processor/PointProcessor.cc, SURVEY L1): ring projection +
curvature feature extraction fused into one jit-compiled program per sweep.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import LioConfig
from ..ops import features as F
from ..ops import ring as R
from ..ops.features import SweepFeatures


@partial(jax.jit, static_argnames=("cfg",))
def process_sweep(xyz: jnp.ndarray, mask: jnp.ndarray, cfg: LioConfig) -> SweepFeatures:
    """Raw (N,3) sweep in the sensor frame -> feature clouds."""
    s = cfg.sensor
    rc, start_ori = R.project_to_rings(
        xyz, mask,
        n_rings=s.n_rings,
        lower_bound_deg=s.lower_bound_deg,
        upper_bound_deg=s.upper_bound_deg,
        max_points_per_ring=s.max_points_per_ring,
        scan_period=s.scan_period,
    )
    return F.extract_features(rc, start_ori, cfg.feature, s)
