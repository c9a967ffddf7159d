"""The FULL per-sweep LIO estimator step on a device mesh.

This is the BASELINE config-5 scale-out of the real pipeline, not a
reduced BA core: ``make_sharded_lio_step`` wraps
``models.estimator.lio_step_impl`` — deskew, window push, local-map build,
corner rows, newest-frame mini-GN with keep_features, convergence gates,
extrinsic optimization + prior, LM with ftol early exit, yaw-gauge fix and
pivot marginalization — in ONE ``shard_map`` program over a 1-D mesh:

* inputs (state, cloud, IMU) arrive replicated — one broadcast per sweep;
* feature association rank-slices every frame's stack rows, so the
  KNN + plane/line fits (the dominant per-sweep cost) run at 1/D work per
  device; with ``map_shard`` the local map is rank-sliced too and
  association runs the ppermute ring (parallel/map_sharded);
* the window LM and the pivot marginalization psum-reduce their normal
  equations (ops/solver with ``psum_axis``) — the Schur-style collective
  reduction of the north star — and the small dense solves replicate;
* every state output is replicated, so the host loop (LioPipeline) is
  unchanged: the distributed step is a drop-in for the single-device one
  and its trajectory matches within f32 summation-order tolerance
  (tests/test_lio_dist.py).

The reference has no distributed mode (SURVEY §2 concurrency table: ROS
process pipeline + 4 pthreads); this capability is net-new.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import LioConfig
from ..models import estimator as EST

AXIS = "data"


def make_mesh(n_devices: int = None, axis: str = AXIS) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def check_caps(cfg: LioConfig, n_devices: int):
    """Stack/map capacities must divide the mesh so rank-slicing keeps
    every row (a remainder would silently drop features)."""
    e = cfg.estimator
    caps = {"surf_stack_cap": e.surf_stack_cap}
    if e.use_corner:
        caps["corner_stack_cap"] = e.corner_stack_cap
        caps["local_map_corner_cap"] = e.local_map_corner_cap
    caps["local_map_filtered_cap"] = e.local_map_filtered_cap
    for name, cap in caps.items():
        if cap % n_devices != 0:
            raise ValueError(
                f"{name}={cap} not divisible by mesh size {n_devices}")


def make_sharded_lio_step(mesh: Mesh, cfg: LioConfig,
                          map_shard: bool = False):
    """jit-compiled distributed ``lio_step``: (state, surf_cloud, samples
    [, corner_cloud]) -> (new_state, outputs), all replicated over the mesh.
    """
    check_caps(cfg, mesh.devices.size)

    if cfg.estimator.use_corner:
        def body(state, surf_cloud, samples, corner_cloud):
            return EST.lio_step_impl(
                state, surf_cloud, samples, cfg, corner_cloud,
                axis=AXIS, map_shard=map_shard)

        in_specs = (P(), P(), P(), P())
    else:
        def body(state, surf_cloud, samples):
            return EST.lio_step_impl(
                state, surf_cloud, samples, cfg,
                axis=AXIS, map_shard=map_shard)

        in_specs = (P(), P(), P())

    fn = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn)
