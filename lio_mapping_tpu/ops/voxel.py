"""Voxel-grid downsampling as a fixed-shape array program.

Replaces ``pcl::VoxelGrid`` (used throughout the reference:
PointProcessor.cc:738-748, Estimator.cc:1518-1519, PointMapping.cc:1014-1023)
with an exact sort-based unique+centroid reduction:

1. quantize points to integer voxel coords (floor(x / leaf), like PCL),
2. pack coords into one int32 key (10 bits/axis, origin-centred),
3. stable-sort keys, detect first-of-run, assign segment ids by prefix sum,
4. segment-mean positions (and aux channels) per voxel,
5. emit up to ``capacity`` voxel centroids, valid-masked.

Exact w.r.t. PCL for any scene within +-511 cells of the local origin
(+-102 m at 0.2 m leaf); out-of-range points are dropped like PCL's
bounding-box clip. ``wide=True`` switches to a 13-bit-per-axis TWO-key
packing (lexsorted) for reference-scale extents: +-4096 cells = +-819 m at
0.2 m leaf — enough to hold the reference's 21x21x11 x 50 m active cube
region (PointMapping.cc:77-83) in a single flat store.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .cloud import Cloud

_BITS = 10
_HALF = 1 << (_BITS - 1)  # 512
_SPAN = 1 << _BITS

_BITS_W = 13
_HALF_W = 1 << (_BITS_W - 1)  # 4096
_SPAN_W = 1 << _BITS_W

#: per-axis half-extent (in cells) of each packing
HALF_CELLS = _HALF
HALF_CELLS_WIDE = _HALF_W


def voxel_keys(xyz: jnp.ndarray, mask: jnp.ndarray, leaf: float) -> jnp.ndarray:
    """Packed int32 voxel key per point; invalid/out-of-range -> INT32 max."""
    v = jnp.floor(xyz / leaf).astype(jnp.int32) + _HALF
    in_range = jnp.all((v >= 0) & (v < _SPAN), axis=-1)
    key = (v[..., 0] * _SPAN + v[..., 1]) * _SPAN + v[..., 2]
    return jnp.where(mask & in_range, key, jnp.iinfo(jnp.int32).max)


def voxel_keys_wide(xyz: jnp.ndarray, mask: jnp.ndarray, leaf: float):
    """13-bit-per-axis packing as TWO int32 keys (a = x*span+y, b = z);
    lexsort by (a, b) is equivalent to sorting a single 39-bit key, with
    no int64 dependence (prod runs f32/x64-off)."""
    v = jnp.floor(xyz / leaf).astype(jnp.int32) + _HALF_W
    in_range = jnp.all((v >= 0) & (v < _SPAN_W), axis=-1)
    big = jnp.iinfo(jnp.int32).max
    ok = mask & in_range
    key_a = jnp.where(ok, v[..., 0] * _SPAN_W + v[..., 1], big)
    key_b = jnp.where(ok, v[..., 2], big)
    return key_a, key_b


def voxel_downsample(
    xyz: jnp.ndarray,
    mask: jnp.ndarray,
    leaf: float,
    capacity: int,
    aux: jnp.ndarray | None = None,
    wide: bool = False,
):
    """Centroid-downsample (N,3) points to <=capacity voxel centroids.

    Returns (out_xyz (C,3), out_mask (C,), out_aux (C,k) or None).
    ``aux`` channels are averaged alongside positions. ``wide`` selects the
    13-bit two-key packing (large extents; one extra sort pass).
    """
    n = xyz.shape[0]
    if wide:
        key_a, key_b = voxel_keys_wide(xyz, mask, leaf)
        order = jnp.lexsort((key_b, key_a))
        a_s, b_s = key_a[order], key_b[order]
        xyz_s = xyz[order]
        valid_s = a_s != jnp.iinfo(jnp.int32).max
        first = jnp.concatenate(
            [jnp.ones((1,), bool),
             (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])]) & valid_s
    else:
        key = voxel_keys(xyz, mask, leaf)
        order = jnp.argsort(key)
        key_s = key[order]
        xyz_s = xyz[order]
        valid_s = key_s != jnp.iinfo(jnp.int32).max
        first = jnp.concatenate(
            [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]) & valid_s
    seg = jnp.cumsum(first.astype(jnp.int32)) - 1  # segment id per point
    seg = jnp.where(valid_s, seg, capacity)  # invalid -> dropped bucket

    ones = valid_s.astype(xyz.dtype)
    sums = jnp.zeros((capacity + 1, 3), dtype=xyz.dtype).at[seg].add(xyz_s, mode="drop")
    cnts = jnp.zeros((capacity + 1,), dtype=xyz.dtype).at[seg].add(ones, mode="drop")
    out_mask = cnts[:capacity] > 0
    out_xyz = sums[:capacity] / jnp.maximum(cnts[:capacity], 1.0)[:, None]

    out_aux = None
    if aux is not None:
        aux_s = aux[order]
        aux_sums = jnp.zeros((capacity + 1,) + aux.shape[1:], dtype=aux.dtype).at[seg].add(
            jnp.where(valid_s.reshape((-1,) + (1,) * (aux.ndim - 1)), aux_s, 0), mode="drop")
        denom = jnp.maximum(cnts[:capacity], 1.0).reshape((-1,) + (1,) * (aux.ndim - 1))
        out_aux = aux_sums[:capacity] / denom

    return out_xyz, out_mask, out_aux


def voxel_downsample_cloud(c: Cloud, leaf: float, capacity: int) -> Cloud:
    """Voxel-downsample a Cloud; rel_time averaged, ring dropped (-1)."""
    out_xyz, out_mask, out_rt = voxel_downsample(c.xyz, c.mask, leaf, capacity, aux=c.rel_time)
    return Cloud(
        xyz=out_xyz,
        rel_time=out_rt,
        ring=jnp.full((capacity,), -1, dtype=jnp.int32),
        mask=out_mask,
    )
