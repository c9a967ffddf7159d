"""Fixed-shape point-cloud containers.

The reference passes dynamically sized ``pcl::PointCloud`` objects between
stages, encoding ``ring + rel_time`` into the intensity channel
(PointProcessor.cc:414). On TPU every shape must be static, so clouds are
padded arrays with explicit validity masks and the ring/rel_time channels are
kept as separate arrays instead of being packed into a float.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class Cloud(NamedTuple):
    """A flat padded point cloud.

    xyz:      (N, 3) float
    rel_time: (N,)   float   sweep-relative time in [0, scan_period]
    ring:     (N,)   int32   ring index (or -1)
    mask:     (N,)   bool    validity
    """

    xyz: jnp.ndarray
    rel_time: jnp.ndarray
    ring: jnp.ndarray
    mask: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-2]

    def count(self) -> jnp.ndarray:
        return jnp.sum(self.mask.astype(jnp.int32), axis=-1)

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "Cloud":
        return Cloud(
            xyz=jnp.zeros((capacity, 3), dtype=dtype),
            rel_time=jnp.zeros((capacity,), dtype=dtype),
            ring=jnp.full((capacity,), -1, dtype=jnp.int32),
            mask=jnp.zeros((capacity,), dtype=bool),
        )

    @staticmethod
    def from_xyz(xyz: jnp.ndarray, rel_time=None, ring=None, mask=None) -> "Cloud":
        n = xyz.shape[-2]
        if rel_time is None:
            rel_time = jnp.zeros(xyz.shape[:-1], dtype=xyz.dtype)
        if ring is None:
            ring = jnp.full(xyz.shape[:-1], -1, dtype=jnp.int32)
        if mask is None:
            mask = jnp.ones(xyz.shape[:-1], dtype=bool)
        return Cloud(xyz, rel_time, ring, mask)

    def transform(self, pose) -> "Cloud":
        """Rigidly transform all points (mask/ring/rel_time unchanged)."""
        return self._replace(xyz=pose.apply(self.xyz))


class RingCloud(NamedTuple):
    """A sweep organized as per-ring rows, points compacted to the front.

    xyz:      (R, P, 3)
    rel_time: (R, P)
    mask:     (R, P)
    count:    (R,) int32  number of valid points per ring
    """

    xyz: jnp.ndarray
    rel_time: jnp.ndarray
    mask: jnp.ndarray
    count: jnp.ndarray

    @property
    def n_rings(self) -> int:
        return self.xyz.shape[-3]

    @property
    def points_per_ring(self) -> int:
        return self.xyz.shape[-2]


def concat_clouds(a: Cloud, b: Cloud) -> Cloud:
    return Cloud(
        xyz=jnp.concatenate([a.xyz, b.xyz], axis=0),
        rel_time=jnp.concatenate([a.rel_time, b.rel_time], axis=0),
        ring=jnp.concatenate([a.ring, b.ring], axis=0),
        mask=jnp.concatenate([a.mask, b.mask], axis=0),
    )


def crop_box_filter(xyz: jnp.ndarray, mask: jnp.ndarray,
                    box_min, box_max, rotation=None,
                    negative: bool = True) -> jnp.ndarray:
    """Axis-aligned crop-box self-filter; returns the updated mask.

    Parity: src/input_filters_node.cc:54-62 — the KAIST-rig vehicle
    self-filter rotates the sweep into a gravity-aligned frame, removes
    (``negative=True``) every point inside the box [box_min, box_max], and
    rotates back. Here the rotation is applied only to the containment
    test (no round-trip transform needed) and removal is a mask update —
    fixed shapes, no compaction.
    """
    p = xyz if rotation is None else xyz @ jnp.asarray(rotation, xyz.dtype).T
    lo = jnp.asarray(box_min, xyz.dtype)
    hi = jnp.asarray(box_max, xyz.dtype)
    inside = jnp.all((p >= lo) & (p <= hi), axis=-1)
    keep = ~inside if negative else inside
    return mask & keep


# KAIST Urban rig: rotation to the gravity-aligned filtering frame and the
# vehicle-body crop box (input_filters_node.cc:55-56,84-88).
KAIST_SELF_FILTER_ROTATION = (
    (-4.91913910e-01, 7.13989130e-01, -4.98237120e-01),
    (-5.01145813e-01, -7.00156621e-01, -5.08560301e-01),
    (-7.11950546e-01, -4.78439170e-04, 7.02229444e-01),
)
KAIST_SELF_FILTER_BOX = ((-10.0, -5.0, -1.7), (5.0, 7.0, 0.6))


def compact_cloud(c: Cloud, capacity: int) -> Cloud:
    """Pack valid points to the front and truncate/pad to ``capacity``.

    Deterministic (stable order) scatter by prefix-sum slot assignment — the
    TPU replacement for PCL's implicit dynamic push_back compaction.
    """
    slot = jnp.cumsum(c.mask.astype(jnp.int32)) - 1
    slot = jnp.where(c.mask, slot, capacity)  # invalid -> dropped
    slot = jnp.where(slot >= capacity, capacity, slot)  # overflow -> dropped

    out_xyz = jnp.zeros((capacity + 1, 3), dtype=c.xyz.dtype).at[slot].set(c.xyz, mode="drop")
    out_rt = jnp.zeros((capacity + 1,), dtype=c.rel_time.dtype).at[slot].set(c.rel_time, mode="drop")
    out_ring = jnp.full((capacity + 1,), -1, dtype=jnp.int32).at[slot].set(c.ring, mode="drop")
    out_mask = jnp.zeros((capacity + 1,), dtype=bool).at[slot].set(c.mask, mode="drop")
    return Cloud(out_xyz[:capacity], out_rt[:capacity], out_ring[:capacity], out_mask[:capacity])
