"""LOAM curvature feature extraction as a batched masked array program.

Parity target: src/point_processor/PointProcessor.cc:542-783
(``PrepareRing`` / ``PrepareSubregion`` / ``MaskPickedInRing`` /
``ExtractFeaturePoints``).

Reference behavior reproduced with fixed shapes:
* occlusion masking: a >0.1 m^2 jump between consecutive points with a small
  depth-weighted lateral offset masks 6 points on the nearer side
  (PointProcessor.cc:552-573); the parallel-surface check masks single
  points whose both-side gaps exceed 0.0002 * range^2 (:576-582).
* curvature over +-5 neighbors: |sum(p_{i+-j}) - 10 p_i|^2 (:598-609).
* each ring is split into 8 subregions between index 5 and size-5
  (:670-675); per subregion pick <=2 sharp + <=20 less-sharp corners
  (curv > 0.1, descending) and <=4 flat points (curv < 0.1, ascending),
  with +-5-point non-max suppression that stops at >0.05 m^2 gaps
  (:624-645). Picking by repeated masked argmax/argmin is equivalent to the
  reference's sort-then-iterate because each pick only removes candidates.
* all non-corner subregion points are "less flat" candidates, voxel-grid
  downsampled at 0.2 m per ring (:727-751); their relative times are
  recomputed from centroid azimuth (:755-778).

The per-ring computation is vmapped over rings; the pick loop is a
``lax.scan`` over the (static) pick budget.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import FeatureConfig, SensorConfig
from .cloud import Cloud, RingCloud, compact_cloud, concat_clouds
from .voxel import voxel_downsample


class SweepFeatures(NamedTuple):
    corner_sharp: Cloud
    corner_less_sharp: Cloud
    surf_flat: Cloud
    surf_less_flat: Cloud


# Labels match the reference PointLabel enum (PointProcessor.h:97-102)
_CORNER_SHARP = 2
_CORNER_LESS_SHARP = 1
_SURFACE_LESS_FLAT = 0
_SURFACE_FLAT = -1


def _shift(a: jnp.ndarray, k: int, fill=0.0) -> jnp.ndarray:
    """a[i] -> a[i+k] with fill outside (1-D along axis 0)."""
    if k == 0:
        return a
    pad = jnp.full((abs(k),) + a.shape[1:], fill, dtype=a.dtype)
    if k > 0:
        return jnp.concatenate([a[k:], pad], axis=0)
    return jnp.concatenate([pad, a[: a.shape[0] - abs(k)]], axis=0)


def _occlusion_mask(xyz: jnp.ndarray, count: jnp.ndarray, ncr: int) -> jnp.ndarray:
    """PrepareRing (PointProcessor.cc:542-585) -> per-point picked-mask (P,)."""
    p = xyz.shape[0]
    idx = jnp.arange(p)
    depth = jnp.linalg.norm(xyz, axis=-1)
    sq = jnp.sum(xyz * xyz, axis=-1)

    nxt = _shift(xyz, 1)
    prv = _shift(xyz, -1)
    diff_next2 = jnp.sum((nxt - xyz) ** 2, axis=-1)
    diff_prev2 = jnp.sum((xyz - prv) ** 2, axis=-1)
    depth_next = _shift(depth[:, None], 1)[:, 0]

    # loop domain: i in [ncr, size - ncr)
    in_domain = (idx >= ncr) & (idx < count - ncr)

    ratio_near = depth_next / jnp.maximum(depth, 1e-12)  # depth > depth_next case
    wd_near = jnp.linalg.norm(nxt - xyz * ratio_near[:, None], axis=-1) / jnp.maximum(depth_next, 1e-12)
    ratio_far = depth / jnp.maximum(depth_next, 1e-12)
    wd_far = jnp.linalg.norm(xyz - nxt * ratio_far[:, None], axis=-1) / jnp.maximum(depth, 1e-12)

    jump = diff_next2 > 0.1
    event_near = in_domain & jump & (depth > depth_next) & (wd_near < 0.1)  # mask [i-ncr, i]
    event_far = in_domain & jump & (depth <= depth_next) & (wd_far < 0.1)   # mask [i+1, i+ncr+1]

    mask = jnp.zeros(p, dtype=bool)
    for k in range(0, ncr + 1):
        mask = mask | _shift(event_near, k, fill=False)  # mask[i-k] <- event_near[i]
    for k in range(1, ncr + 2):
        mask = mask | _shift(event_far, -k, fill=False)  # mask[i+k] <- event_far[i]

    parallel = (
        in_domain
        & ~(event_near | event_far)  # reference `continue` skips this check
        & (diff_next2 > 0.0002 * sq)
        & (diff_prev2 > 0.0002 * sq)
    )
    return mask | parallel


def _curvature(xyz: jnp.ndarray, ncr: int) -> jnp.ndarray:
    """|sum_{j=1..ncr}(p[i+j]+p[i-j]) - 2*ncr*p[i]|^2 (PointProcessor.cc:598-609)."""
    acc = -2.0 * ncr * xyz
    for j in range(1, ncr + 1):
        acc = acc + _shift(xyz, j) + _shift(xyz, -j)
    return jnp.sum(acc * acc, axis=-1)


def _nms_masks_batched(i: jnp.ndarray, ok: jnp.ndarray, adj_big: jnp.ndarray,
                       ncr: int) -> jnp.ndarray:
    """Vectorized MaskPickedInRing (PointProcessor.cc:624-645) for one pick
    per (ring, subregion): picks ``i`` (R, NS) gated by ``ok`` (R, NS) over
    per-ring gap flags ``adj_big`` (R, P). Returns the (R, P) union of the
    newly-masked positions (each pick + its <=ncr-neighbor runs, stopping at
    the first >0.05 m^2 gap)."""
    r, p = adj_big.shape
    idx = jnp.arange(p)
    pmax = p - 1

    def at(pos):  # gather adj_big at per-(ring, subregion) positions
        return jnp.take_along_axis(adj_big, jnp.clip(pos, 0, pmax), axis=1)

    oh = (idx[None, None, :] == i[..., None]) & ok[..., None]   # (R, NS, P)
    new = jnp.any(oh, axis=1)
    ok_f = ok
    ok_b = ok
    for k in range(1, ncr + 1):
        ok_f = ok_f & ~at(i + k - 1)
        pos_f = jnp.clip(i + k, 0, pmax)
        new = new | jnp.any(
            (idx[None, None, :] == pos_f[..., None]) & ok_f[..., None], axis=1)
        ok_b = ok_b & ~at(i - k)
        pos_b = jnp.clip(i - k, 0, pmax)
        new = new | jnp.any(
            (idx[None, None, :] == pos_b[..., None]) & ok_b[..., None], axis=1)
    return new


def _extract_labels(
    xyz: jnp.ndarray,      # (R, P, 3)
    rc_mask: jnp.ndarray,  # (R, P)
    count: jnp.ndarray,    # (R,)
    cfg: FeatureConfig,
):
    """Label assignment for the whole sweep. Returns (labels, in_region),
    both (R, P).

    TPU restructuring of the reference's per-(ring, subregion) greedy pick
    loops: all rings AND all subregions pick concurrently, so the serial
    depth is the pick budget (24) instead of subregions x budget (192).
    Within a subregion the greedy order is exactly the reference's; the only
    behavioral delta is NMS spill across subregion boundaries (+-ncr points),
    which in the reference lands before the next subregion starts and here
    lands one pick-step later."""
    r, p = rc_mask.shape
    ncr = cfg.num_curvature_regions
    ns = cfg.num_scan_subregions
    idx = jnp.arange(p)

    ring_long_enough = count > 2 * ncr + 1                       # (R,)

    picked = jax.vmap(lambda x, c: _occlusion_mask(x, c, ncr))(xyz, count)
    curv = jax.vmap(lambda x: _curvature(x, ncr))(xyz)           # (R, P)
    # gap to the next point; the last entry compares against zero-fill and
    # reads as a big gap, stopping NMS runs at the ring end (as in _shift)
    adj_big = jnp.sum((jnp.roll(xyz, -1, axis=1) - xyz) ** 2, axis=-1)
    adj_big = adj_big.at[:, -1].set(jnp.sum(xyz[:, -1] ** 2, axis=-1)) > 0.05

    # subregion bounds (PointProcessor.cc:672-675), (R, NS)
    j = jnp.arange(ns)
    n = count[:, None]
    sp = (ncr * (ns - j) + (n - ncr) * j) // ns
    ep = (ncr * (ns - 1 - j) + (n - ncr) * (j + 1)) // ns - 1
    region_ok = (ep > sp) & ring_long_enough[:, None]
    in_region = (
        (idx[None, None, :] >= sp[..., None])
        & (idx[None, None, :] <= ep[..., None])
        & region_ok[..., None]
        & rc_mask[:, None, :]
    )                                                            # (R, NS, P)
    in_any_region = jnp.any(in_region, axis=1)

    labels = jnp.zeros((r, p), dtype=jnp.int32)  # SURFACE_LESS_FLAT default

    # ---- corner picks: descending curvature, curv > th ----
    def corner_step(state, _):
        labels, picked, n_picked = state
        cand = in_region & ~picked[:, None, :] & (curv > cfg.surf_curv_th)[:, None, :]
        val = jnp.where(cand, curv[:, None, :], -jnp.inf)        # (R, NS, P)
        i = jnp.argmax(val, axis=-1)                             # (R, NS)
        ok = jnp.max(val, axis=-1) > -jnp.inf
        new_label = jnp.where(
            n_picked < cfg.max_corner_sharp, _CORNER_SHARP, _CORNER_LESS_SHARP)
        oh = (idx[None, None, :] == i[..., None]) & ok[..., None]
        contrib = jnp.max(
            jnp.where(oh, new_label[..., None], jnp.int32(0)), axis=1
        ).astype(jnp.int32)
        labels = jnp.where(jnp.any(oh, axis=1), contrib, labels)
        picked = picked | _nms_masks_batched(i, ok, adj_big, ncr)
        n_picked = n_picked + ok.astype(jnp.int32)
        return (labels, picked, n_picked), None

    (labels, picked, _), _ = jax.lax.scan(
        corner_step, (labels, picked, jnp.zeros((r, ns), jnp.int32)),
        None, length=cfg.max_corner_less_sharp)

    # ---- flat picks: ascending curvature, curv < th ----
    def flat_step(state, _):
        labels, picked = state
        cand = in_region & ~picked[:, None, :] & (curv < cfg.surf_curv_th)[:, None, :]
        val = jnp.where(cand, curv[:, None, :], jnp.inf)
        i = jnp.argmin(val, axis=-1)
        ok = jnp.min(val, axis=-1) < jnp.inf
        oh = (idx[None, None, :] == i[..., None]) & ok[..., None]
        labels = jnp.where(jnp.any(oh, axis=1), jnp.int32(_SURFACE_FLAT), labels)
        picked = picked | _nms_masks_batched(i, ok, adj_big, ncr)
        return (labels, picked), None

    (labels, picked), _ = jax.lax.scan(
        flat_step, (labels, picked), None, length=cfg.max_surf_flat)

    return labels, in_any_region


def extract_features(
    rc: RingCloud,
    start_ori: jnp.ndarray,
    cfg: FeatureConfig,
    sensor: SensorConfig,
) -> SweepFeatures:
    """Full-sweep feature extraction (ExtractFeaturePoints)."""
    r, p = rc.mask.shape

    labels, in_region = _extract_labels(rc.xyz, rc.mask, rc.count, cfg)

    ring_ids = jnp.broadcast_to(jnp.arange(r, dtype=jnp.int32)[:, None], (r, p))
    flat = Cloud(
        xyz=rc.xyz.reshape(r * p, 3),
        rel_time=rc.rel_time.reshape(r * p),
        ring=ring_ids.reshape(r * p),
        mask=rc.mask.reshape(r * p),
    )
    labels_f = labels.reshape(r * p)
    in_region_f = in_region.reshape(r * p)

    def select(cond, cap):
        return compact_cloud(flat._replace(mask=flat.mask & cond), cap)

    corner_sharp = select(labels_f == _CORNER_SHARP, cfg.corner_sharp_cap)
    corner_less_sharp = select(labels_f >= _CORNER_LESS_SHARP, cfg.corner_less_sharp_cap)
    surf_flat = select(labels_f == _SURFACE_FLAT, cfg.surf_flat_cap)

    # ---- less-flat: all non-corner subregion points, voxel filtered per ring ----
    lf_mask = (labels <= _SURFACE_LESS_FLAT) & in_region & rc.mask
    per_ring_cap = max(256, cfg.surf_less_flat_cap // r)

    def ring_voxel(x, m):
        ox, om, _ = voxel_downsample(x, m, cfg.less_flat_filter_size, per_ring_cap)
        return ox, om

    ds_xyz, ds_mask = jax.vmap(ring_voxel)(rc.xyz, lf_mask)
    ds_xyz = ds_xyz.reshape(r * per_ring_cap, 3)
    ds_mask = ds_mask.reshape(r * per_ring_cap)
    ds_ring = jnp.broadcast_to(
        jnp.arange(r, dtype=jnp.int32)[:, None], (r, per_ring_cap)).reshape(-1)

    # recompute rel_time from centroid azimuth (PointProcessor.cc:757-778)
    azi = 2.0 * jnp.pi - jnp.arctan2(ds_xyz[:, 1], ds_xyz[:, 0])
    azi = jnp.where(azi >= 2.0 * jnp.pi, azi - 2.0 * jnp.pi, azi)
    azi_rel = azi - start_ori
    azi_rel = jnp.where(azi_rel < 0, azi_rel + 2.0 * jnp.pi, azi_rel)
    ds_rt = (sensor.scan_period / (2.0 * jnp.pi)) * azi_rel

    surf_less_flat = compact_cloud(
        Cloud(ds_xyz, ds_rt, ds_ring, ds_mask), cfg.surf_less_flat_cap)

    return SweepFeatures(corner_sharp, corner_less_sharp, surf_flat, surf_less_flat)
