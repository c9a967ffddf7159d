"""Per-stage wall-clock instrumentation + device tracing.

The reference instruments every stage with a ``TicToc`` stopwatch
(include/utils/TicToc.h:38-63) and reports per-stage durations through
glog/ROS_DEBUG (e.g. ring binning PointProcessor.cc:326,424, odometry
iteration PointOdometry.cc:678, ceres prep/solve Estimator.cc:1906,1993,
marginalization Estimator.cc:2220-2247). This module is the TPU-native
equivalent: a host-side stage timer (with optional device sync so a stage
attributes its own device work instead of the previous stage's) plus a
``jax.profiler`` trace context for XLA-level flamegraphs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StageTimer:
    """Named-stage stopwatch aggregating count / mean / max / total.

    ``sync=True`` inserts a ``jax.block_until_ready`` barrier at stage
    exit so asynchronously dispatched device work is charged to the stage
    that launched it. Leave it off for throughput measurement (the
    pipeline then overlaps host and device work, and only end-to-end
    numbers are meaningful).
    """

    def __init__(self, enabled: bool = True, sync: bool = False):
        self.enabled = enabled
        self.sync = sync
        self.records: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and sync_on is not None:
                import jax

                jax.block_until_ready(sync_on)
            self.records.setdefault(name, []).append(
                (time.perf_counter() - t0) * 1e3)

    def tic(self) -> float:
        return time.perf_counter()

    def toc(self, name: str, t0: float) -> float:
        """Explicit TicToc-style pair; returns elapsed ms."""
        ms = (time.perf_counter() - t0) * 1e3
        if self.enabled:
            self.records.setdefault(name, []).append(ms)
        return ms

    def summary(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, vals in self.records.items():
            out[name] = {
                "count": len(vals),
                "mean_ms": sum(vals) / len(vals),
                "max_ms": max(vals),
                "total_ms": sum(vals),
            }
        return out

    def report(self) -> str:
        rows = [f"{'stage':<28}{'count':>7}{'mean ms':>10}{'max ms':>10}{'total ms':>11}"]
        for name, s in sorted(self.summary().items(),
                              key=lambda kv: -kv[1]["total_ms"]):
            rows.append(f"{name:<28}{s['count']:>7d}{s['mean_ms']:>10.2f}"
                        f"{s['max_ms']:>10.2f}{s['total_ms']:>11.1f}")
        return "\n".join(rows)

    def reset(self):
        self.records.clear()


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str]):
    """``jax.profiler`` trace wrapper (XLA timeline -> TensorBoard/Perfetto).

    No-op when ``trace_dir`` is None, so call sites can pass the CLI flag
    straight through.
    """
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
