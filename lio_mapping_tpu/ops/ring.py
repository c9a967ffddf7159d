"""Sweep -> ring-organized cloud (reference PointProcessor::PointToRing).

Parity target: src/point_processor/PointProcessor.cc:207-426.

Behavior reproduced:
* elevation -> ring via ``(deg - lower) * factor + 0.5`` truncation
  (PointProcessor.h:153-156); out-of-range rings dropped.
* azimuth ``2*pi - atan2(y, x)`` wrapped to [0, 2*pi)
  (PointProcessor.cc:248-254).
* ``start_ori`` = azimuth of the first valid point in scan order
  (PointProcessor.cc:264-267).
* per-point relative time = ``scan_period * ((azi - start_ori) mod 2*pi) / (2*pi)``
  (PointProcessor.cc:403-408).
* non-finite points dropped (PointProcessor.cc:240-244).

The sequential per-ring ``push_back`` becomes a stable sort by
(ring, scan-index) plus a prefix-sum scatter into a padded (R, P) grid.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cloud import Cloud, RingCloud


def project_to_rings(
    xyz: jnp.ndarray,
    in_mask: jnp.ndarray,
    *,
    n_rings: int,
    lower_bound_deg: float,
    upper_bound_deg: float,
    max_points_per_ring: int,
    scan_period: float,
    start_ori_override=None,
    ring_ids=None,
) -> RingCloud:
    """Bin a raw sweep (N,3) into per-ring rows with relative times.

    ``start_ori_override``: inferred start azimuth from the host-side
    smoother (PointProcessor.cc:348-389); replaces the observed first-point
    azimuth in the relative-time computation when given.

    ``ring_ids``: (N,) int32 per-point ring annotation for unevenly-spaced
    lasers (the reference's ``uneven`` mode reading PointXYZIR's ring field,
    PointProcessor.cc:105-118 + the PointIR PointToRing overload); replaces
    elevation binning when given."""
    n = xyz.shape[0]
    dtype = xyz.dtype

    finite = jnp.all(jnp.isfinite(xyz), axis=-1)
    valid = in_mask & finite
    xyz = jnp.where(valid[:, None], xyz, 0.0)

    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    if ring_ids is not None:
        ring = ring_ids.astype(jnp.int32)
    else:
        dis = jnp.sqrt(x * x + y * y)
        ele_deg = jnp.arctan2(z, dis) * (180.0 / jnp.pi)
        factor = (n_rings - 1) / (upper_bound_deg - lower_bound_deg)
        ring = jnp.floor((ele_deg - lower_bound_deg) * factor + 0.5).astype(jnp.int32)
    valid = valid & (ring >= 0) & (ring < n_rings)

    azi = 2.0 * jnp.pi - jnp.arctan2(y, x)
    azi = jnp.where(azi >= 2.0 * jnp.pi, azi - 2.0 * jnp.pi, azi)

    # start_ori: azimuth of first valid point in scan order
    first_idx = jnp.argmax(valid)  # first True (0 if none)
    start_ori = azi[first_idx]
    if start_ori_override is not None:
        start_ori = jnp.asarray(start_ori_override, dtype)

    azi_rel = azi - start_ori
    azi_rel = jnp.where(azi_rel < 0, azi_rel + 2.0 * jnp.pi, azi_rel)
    rel_time = (scan_period / (2.0 * jnp.pi)) * azi_rel

    # --- stable grouping by ring, preserving scan order within a ring ---
    ring_key = jnp.where(valid, ring, n_rings)  # invalid -> overflow bucket
    order = jnp.argsort(ring_key, stable=True)
    ring_sorted = ring_key[order]

    # position within ring = rank - start_of_ring
    counts = jnp.bincount(ring_key, length=n_rings + 1)[:n_rings]
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32)
    pos = rank - starts[jnp.clip(ring_sorted, 0, n_rings - 1)]

    dest_valid = (ring_sorted < n_rings) & (pos < max_points_per_ring)
    flat_dest = jnp.where(
        dest_valid,
        ring_sorted * max_points_per_ring + pos,
        n_rings * max_points_per_ring,
    )

    r_cap = n_rings * max_points_per_ring
    grid_xyz = jnp.zeros((r_cap + 1, 3), dtype=dtype).at[flat_dest].set(xyz[order], mode="drop")
    grid_rt = jnp.zeros((r_cap + 1,), dtype=dtype).at[flat_dest].set(rel_time[order], mode="drop")
    grid_mask = jnp.zeros((r_cap + 1,), dtype=bool).at[flat_dest].set(dest_valid, mode="drop")

    out_xyz = grid_xyz[:r_cap].reshape(n_rings, max_points_per_ring, 3)
    out_rt = grid_rt[:r_cap].reshape(n_rings, max_points_per_ring)
    out_mask = grid_mask[:r_cap].reshape(n_rings, max_points_per_ring)
    out_count = jnp.minimum(counts, max_points_per_ring).astype(jnp.int32)
    return RingCloud(out_xyz, out_rt, out_mask, out_count), start_ori


def ring_cloud_to_flat(rc: RingCloud) -> Cloud:
    """Flatten (R,P) grid to a flat Cloud (ring annotation kept)."""
    r, p = rc.mask.shape
    ring_ids = jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32)[:, None], (r, p))
    return Cloud(
        xyz=rc.xyz.reshape(r * p, 3),
        rel_time=rc.rel_time.reshape(r * p),
        ring=jnp.where(rc.mask, ring_ids, -1).reshape(r * p),
        mask=rc.mask.reshape(r * p),
    )
