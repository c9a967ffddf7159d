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
def process_sweep(xyz: jnp.ndarray, mask: jnp.ndarray, cfg: LioConfig,
                  start_ori=None, ring_ids=None) -> SweepFeatures:
    """Raw (N,3) sweep in the sensor frame -> feature clouds.

    ``start_ori``: optional inferred start azimuth from
    :class:`StartOriTracker` (the ``infer_start_ori`` mode).

    ``ring_ids``: optional (N,) per-point ring annotation for
    unevenly-spaced lasers (the reference's ``uneven`` mode /
    sensor_type 320, processor_node.cc:72-74)."""
    s = cfg.sensor
    rc, so = R.project_to_rings(
        xyz, mask,
        n_rings=s.n_rings,
        lower_bound_deg=s.lower_bound_deg,
        upper_bound_deg=s.upper_bound_deg,
        max_points_per_ring=s.max_points_per_ring,
        scan_period=s.scan_period,
        start_ori_override=start_ori,
        ring_ids=ring_ids if s.uneven else None,
    )
    return F.extract_features(rc, so, cfg.feature, s)


def _normalize_rad(a: float) -> float:
    """Wrap to (-pi, pi] (math_utils.h NormalizeRad)."""
    import math
    a = math.fmod(a, 2.0 * math.pi)
    if a > math.pi:
        a -= 2.0 * math.pi
    elif a <= -math.pi:
        a += 2.0 * math.pi
    return a


def raw_start_ori(xyz, mask) -> float:
    """Observed start azimuth of a sweep: ``2*pi - atan2(y, x)`` of the
    first valid point in scan order (PointProcessor.cc:248-267)."""
    import math

    import numpy as np

    xyz = np.asarray(xyz)
    v = np.asarray(mask) & np.all(np.isfinite(xyz), axis=-1)
    i = int(np.argmax(v))
    azi = 2.0 * math.pi - math.atan2(float(xyz[i, 1]), float(xyz[i, 0]))
    if azi >= 2.0 * math.pi:
        azi -= 2.0 * math.pi
    return azi


class StartOriTracker:
    """Host-side start-azimuth smoother: the reference's ``infer_start_ori``
    mode (PointProcessor.cc:348-389). Two 10-deep circular buffers track the
    accepted (buf1) and raw observed (buf2) start orientations. When the new
    raw value jumps more than ``rad_diff`` from the last accepted one, it is
    replaced by a constant-rate extrapolation of buf1; when the raw stream
    has itself been rate-consistent for 10 sweeps (all consecutive diffs
    within 0.05 rad of buf1's mean step), the tracker resets to the raw
    observation (the reference reads ring 0's first azimuth here; the sweep
    start azimuth is the same point for a full sweep)."""

    #: consistency tolerance, rad (PointProcessor.cc:371-380)
    STEP_TOL = 0.05

    def __init__(self, rad_diff: float):
        from collections import deque

        self.rad_diff = float(rad_diff)
        self._buf1 = deque(maxlen=10)  # accepted / inferred
        self._buf2 = deque(maxlen=10)  # raw observations

    def update(self, raw: float) -> float:
        import math

        start = float(raw)
        self._buf2.append(float(raw))
        if len(self._buf1) >= 10:
            step1 = _normalize_rad(self._buf1[-1] - self._buf1[0]) / 9.0
            step2 = _normalize_rad(self._buf2[-1] - self._buf2[0]) / 9.0
            if abs(_normalize_rad(start - self._buf1[-1])) > self.rad_diff:
                start = _normalize_rad(self._buf1[-1] + step1)
                if start < 0:
                    start += 2.0 * math.pi
            consistent = abs(_normalize_rad(step1 - step2)) < self.STEP_TOL and all(
                abs(_normalize_rad(self._buf2[k + 1] - self._buf2[k] - step1)) < self.STEP_TOL
                for k in range(9))
            if consistent:
                start = float(raw)
        self._buf1.append(start)
        return start
