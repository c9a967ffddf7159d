"""Exact k-nearest-neighbor search as a tiled, MXU-friendly kernel.

Replaces ``pcl::KdTreeFLANN::nearestKSearch`` — the hot loop feeding every GN
iteration in the reference (PointOdometry.cc:345,444; PointMapping.cc:384,519;
Estimator.cc:1544-1549, SURVEY §2 concurrency table).

Design: pointer-chasing trees are hostile to TPUs; an exact tiled brute-force
search is not. Squared distances are computed as ``|q|^2 + |p|^2 - 2 q.p``
so the inner product rides the MXU; the database axis is tiled with a running
top-k merge so peak memory stays at (Q, TILE) regardless of map size.
A Pallas double-buffered variant lives in ``ops/pallas/knn_kernel.py``.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

BIG = jnp.inf


def _use_pallas() -> bool:
    if os.environ.get("LIO_DISABLE_PALLAS_KNN"):
        return False
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


@partial(jax.jit, static_argnames=("k", "tile", "prune_beyond", "force_tiled"))
def knn(
    queries: jnp.ndarray,
    q_mask: jnp.ndarray,
    db: jnp.ndarray,
    db_mask: jnp.ndarray,
    k: int = 5,
    tile: int = 2048,
    prune_beyond: float = None,
    force_tiled: bool = False,
):
    """Exact kNN: for each query, the k nearest valid db points.

    Returns (sq_dists (Q, k) ascending, idx (Q, k) int32). Invalid queries
    get +inf distances; if fewer than k valid db points exist, the tail is
    +inf / index 0.

    ``prune_beyond``: optional squared-distance match gate enabling AABB
    block pruning in the device kernel. Exact for every query whose true
    k-th neighbor lies within the gate; gate tests ``d[:, k-1] < gate``
    are decided exactly either way (see knn_pallas). Use when the caller
    discards matches beyond a radius (all LOAM association does).

    On TPU this dispatches to the Pallas kernel (ops/pallas/knn_kernel.py)
    which keeps the whole search in VMEM; the tiled jnp path below is the
    portable fallback (and the reference implementation for testing).
    """
    if _use_pallas() and k <= 8 and not force_tiled:
        from .pallas.knn_kernel import knn_pallas

        return knn_pallas(queries, q_mask, db, db_mask, k=k,
                          prune_beyond=prune_beyond)
    q = queries.shape[0]
    m = db.shape[0]
    dtype = queries.dtype

    m_pad = ((m + tile - 1) // tile) * tile
    pad = m_pad - m
    db_p = jnp.concatenate([db, jnp.zeros((pad, 3), dtype)], axis=0)
    dbm_p = jnp.concatenate([db_mask, jnp.zeros((pad,), bool)], axis=0)

    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)  # (Q, 1)

    n_tiles = m_pad // tile

    def body(t, carry):
        best_d, best_i = carry
        start = t * tile
        p_tile = jax.lax.dynamic_slice(db_p, (start, 0), (tile, 3))
        m_tile = jax.lax.dynamic_slice(dbm_p, (start,), (tile,))
        p_sq = jnp.sum(p_tile * p_tile, axis=-1)  # (T,)
        # (Q, T) squared distances via MXU matmul
        cross = jnp.matmul(queries, p_tile.T, precision=jax.lax.Precision.HIGHEST)
        d = q_sq + p_sq[None, :] - 2.0 * cross
        d = jnp.where(m_tile[None, :], jnp.maximum(d, 0.0), BIG)
        idx = start + jnp.arange(tile, dtype=jnp.int32)

        cat_d = jnp.concatenate([best_d, d], axis=1)  # (Q, k+T)
        cat_i = jnp.concatenate([best_i, jnp.broadcast_to(idx[None, :], (q, tile))], axis=1)
        neg_top, arg = jax.lax.top_k(-cat_d, k)
        new_d = -neg_top
        new_i = jnp.take_along_axis(cat_i, arg, axis=1)
        return new_d, new_i

    init_d = jnp.full((q, k), BIG, dtype=dtype)
    init_i = jnp.zeros((q, k), dtype=jnp.int32)
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, (init_d, init_i))

    best_d = jnp.where(q_mask[:, None], best_d, BIG)
    return best_d, best_i


def nearest(queries, q_mask, db, db_mask, tile: int = 2048):
    """1-NN convenience wrapper returning (sq_dist (Q,), idx (Q,))."""
    d, i = knn(queries, q_mask, db, db_mask, k=1, tile=tile)
    return d[:, 0], i[:, 0]


@partial(jax.jit, static_argnames=("mode", "tile"))
def ring_constrained_nearest(
    queries: jnp.ndarray,
    q_ring: jnp.ndarray,
    q_mask: jnp.ndarray,
    exclude_idx: jnp.ndarray,
    db: jnp.ndarray,
    db_ring: jnp.ndarray,
    db_mask: jnp.ndarray,
    mode: str,
    ring_window: float = 2.5,
    tile: int = 2048,
):
    """Nearest db point under a ring constraint relative to ``q_ring``.

    Replaces the reference's ring-ordered linear scans for the second/third
    correspondence points (PointOdometry.cc:353-380, 451-488):
    * mode="same":  nearest point in the SAME ring, excluding ``exclude_idx``
    * mode="other": nearest point in a DIFFERENT ring with
      |ring - q_ring| <= ring_window

    Returns (sq_dist (Q,), idx (Q,)).
    """
    q = queries.shape[0]
    m = db.shape[0]
    dtype = queries.dtype

    m_pad = ((m + tile - 1) // tile) * tile
    pad = m_pad - m
    db_p = jnp.concatenate([db, jnp.zeros((pad, 3), dtype)], axis=0)
    dbm_p = jnp.concatenate([db_mask, jnp.zeros((pad,), bool)], axis=0)
    dbr_p = jnp.concatenate([db_ring, jnp.full((pad,), -10_000, jnp.int32)], axis=0)

    q_sq = jnp.sum(queries * queries, axis=-1, keepdims=True)
    n_tiles = m_pad // tile

    def body(t, carry):
        best_d, best_i = carry
        start = t * tile
        p_tile = jax.lax.dynamic_slice(db_p, (start, 0), (tile, 3))
        m_tile = jax.lax.dynamic_slice(dbm_p, (start,), (tile,))
        r_tile = jax.lax.dynamic_slice(dbr_p, (start,), (tile,))
        idx = start + jnp.arange(tile, dtype=jnp.int32)

        p_sq = jnp.sum(p_tile * p_tile, axis=-1)
        d = q_sq + p_sq[None, :] - 2.0 * jnp.matmul(queries, p_tile.T, precision=jax.lax.Precision.HIGHEST)

        if mode == "same":
            ring_ok = r_tile[None, :] == q_ring[:, None]
            ring_ok = ring_ok & (idx[None, :] != exclude_idx[:, None])
        else:
            dr = jnp.abs(r_tile[None, :] - q_ring[:, None])
            ring_ok = (r_tile[None, :] != q_ring[:, None]) & (dr.astype(dtype) <= ring_window)

        ok = m_tile[None, :] & ring_ok
        d = jnp.where(ok, jnp.maximum(d, 0.0), BIG)

        tile_best = jnp.min(d, axis=1)
        tile_arg = idx[jnp.argmin(d, axis=1)]
        better = tile_best < best_d
        return jnp.where(better, tile_best, best_d), jnp.where(better, tile_arg, best_i)

    init = (jnp.full((q,), BIG, dtype=dtype), jnp.zeros((q,), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_tiles, body, init)
    best_d = jnp.where(q_mask, best_d, BIG)
    return best_d, best_i
