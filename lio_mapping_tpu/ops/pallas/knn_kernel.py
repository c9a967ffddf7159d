"""Pallas TPU kernel for exact k-nearest-neighbor search.

The jnp fallback in ops/knn.py materializes (Q, k+TILE) candidate arrays in
HBM and runs lax.top_k per tile — correct, but each GN iteration of every
stage calls it, and the HBM round-trips dominate. This kernel keeps the
whole search in VMEM:

* the database is pre-packed as dbT (4, M): xyz rows + a |p|^2 row (masked
  points carry +inf there, which poisons their distances) — one (4, M)
  array resident in VMEM for the entire kernel;
* each grid step processes a (BQ, 4) query block: distances to a (BQ, BM)
  chunk come from one MXU matmul, and the running top-k is maintained with
  k iterative masked-min passes (no sorting networks, no scatters);
* chunk results merge into (BQ, k) running bests held in VMEM scratch.

Tie semantics: equal distances collapse to one candidate (the reference's
KdTree returns both; duplicate map points are voxel-deduped upstream, so
exact ties only occur for padding). Exactness is otherwise bitwise against
the fallback (validated in tests/test_knn_kernel.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BQ = 256       # query block
BM = 2048      # db chunk per inner step
MAX_K = 8


def _knn_kernel(prune_ref, q_ref, db_ref, dist_ref, idx_ref, *, k: int,
                m_chunks: int):
    """One query block vs the whole VMEM-resident database.

    ``prune_ref`` (SMEM, (n_qblocks, m_chunks) int32, full array per block):
    1 where this query block can skip the chunk entirely (AABB lower bound
    above the caller's match gate — see ``knn_pallas``); the fori_loop body
    becomes a no-op there.
    """
    qb = pl.program_id(0)
    q = q_ref[...]                      # (BQ, 4): xyz + |q|^2
    qxyz = q[:, 0:3]
    q_sq = q[:, 3:4]

    def topk_passes(d, col, kk):
        """kk iterative masked-min passes -> ((BQ, kk) dists, idx) columns.

        Each pass retires exactly the one chosen column (by column id), so
        duplicate f32 distances survive as distinct candidates — a value
        floor (d > min) would drop ALL copies of a collided distance and
        pull in a worse neighbor (~1e-4 of queries at 16k db points).
        Columns are built by stacking (scatter does not lower in Pallas TC).
        """
        work = d
        cols_d, cols_i = [], []
        for _ in range(kk):
            mj = jnp.min(work, axis=1, keepdims=True)
            is_min = work == mj
            ij = jnp.min(jnp.where(is_min, col, jnp.iinfo(jnp.int32).max), axis=1)
            cols_d.append(mj)
            cols_i.append(ij[:, None])
            work = jnp.where(col == ij[:, None], jnp.inf, work)
        return jnp.concatenate(cols_d, axis=1), jnp.concatenate(cols_i, axis=1)

    best_d0 = jnp.full((BQ, k), jnp.inf, jnp.float32)
    best_i0 = jnp.zeros((BQ, k), jnp.int32)

    def chunk_work(c, best_d, best_i):
        db = db_ref[:, pl.ds(c * BM, BM)]      # (4, BM)
        p_sq = db[3:4, :]                       # (1, BM) — +inf for padding
        cross = jax.lax.dot_general(
            qxyz, db[0:3, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
        d = q_sq + p_sq - 2.0 * cross           # (BQ, BM)
        col = jax.lax.broadcasted_iota(jnp.int32, (BQ, BM), 1) + c * BM

        ck_d, ck_i = topk_passes(d, col, k)

        cat_d = jnp.concatenate([best_d, ck_d], axis=1)  # (BQ, 2k)
        cat_i = jnp.concatenate([best_i, ck_i], axis=1)
        return topk_passes(cat_d, cat_i, k)

    def chunk_step(c, carry):
        best_d, best_i = carry
        return jax.lax.cond(
            prune_ref[qb, c] == 0,
            lambda bd, bi: chunk_work(c, bd, bi),
            lambda bd, bi: (bd, bi),
            best_d, best_i)

    best_d, best_i = jax.lax.fori_loop(0, m_chunks, chunk_step, (best_d0, best_i0))
    pad = MAX_K - k
    dist_ref[...] = jnp.concatenate(
        [best_d, jnp.full((BQ, pad), jnp.inf, jnp.float32)], axis=1) if pad else best_d
    idx_ref[...] = jnp.concatenate(
        [best_i, jnp.zeros((BQ, pad), jnp.int32)], axis=1) if pad else best_i


def _aabb(pts, valid, n_blocks, bs):
    """Per-block axis-aligned bounds of the valid points: ((B,3) lo, (B,3) hi).
    Empty blocks give lo=+inf / hi=-inf (always pruned)."""
    lo = jnp.where(valid[:, None], pts, jnp.inf).reshape(n_blocks, bs, 3).min(1)
    hi = jnp.where(valid[:, None], pts, -jnp.inf).reshape(n_blocks, bs, 3).max(1)
    return lo, hi


@partial(jax.jit, static_argnames=("k", "prune_beyond"))
def knn_pallas(queries, q_mask, db, db_mask, k: int = 5,
               prune_beyond: float | None = None):
    """Exact kNN via the Pallas kernel. Same contract as ops.knn.knn.

    ``prune_beyond``: optional squared-distance match gate. Query-block x
    db-chunk pairs whose AABB lower bound exceeds the gate are skipped
    inside the kernel. Results remain EXACT for every query whose true k-th
    neighbor lies within the gate (a pruned chunk's points are all farther
    than the gate, hence farther than all true top-k); rows whose true k-th
    distance exceeds the gate report distances that also exceed it, so
    gate-style acceptance tests (`d[:, k-1] < gate`) are decided exactly.
    The voxel filter emits hash-sorted (spatially coherent) points, which
    is what makes the chunk bounds tight.
    """
    assert k <= MAX_K
    q_n = queries.shape[0]
    m_n = db.shape[0]
    dtype = jnp.float32

    q_pad = (-q_n) % BQ
    m_pad = (-m_n) % BM
    qxyz = jnp.concatenate([queries.astype(dtype), jnp.zeros((q_pad, 3), dtype)], axis=0)
    q_sq = jnp.sum(qxyz * qxyz, axis=-1, keepdims=True)
    q4 = jnp.concatenate([qxyz, q_sq], axis=1)                      # (Qp, 4)

    db_x = jnp.concatenate([db.astype(dtype), jnp.zeros((m_pad, 3), dtype)], axis=0)
    p_sq = jnp.sum(db_x * db_x, axis=-1)
    mask_full = jnp.concatenate([db_mask, jnp.zeros((m_pad,), bool)], axis=0)
    p_sq = jnp.where(mask_full, p_sq, jnp.inf)
    dbt = jnp.concatenate([db_x.T, p_sq[None, :]], axis=0)          # (4, Mp)

    qp = q4.shape[0]
    mp = dbt.shape[1]
    n_qb = qp // BQ
    n_ch = mp // BM
    grid = (n_qb,)

    if prune_beyond is not None:
        qm_full = jnp.concatenate([q_mask, jnp.zeros((q_pad,), bool)], axis=0)
        q_lo, q_hi = _aabb(qxyz, qm_full, n_qb, BQ)
        c_lo, c_hi = _aabb(db_x, mask_full, n_ch, BM)
        gap = jnp.maximum(
            0.0,
            jnp.maximum(q_lo[:, None, :] - c_hi[None, :, :],
                        c_lo[None, :, :] - q_hi[:, None, :]))
        lb = jnp.sum(gap * gap, axis=-1)               # (n_qb, n_ch)
        # inf - inf = nan for empty blocks: treat as prunable
        prune = jnp.where(jnp.isnan(lb), True, lb > prune_beyond)
        prune = prune.astype(jnp.int32)
    else:
        prune = jnp.zeros((n_qb, n_ch), jnp.int32)

    dist, idx = pl.pallas_call(
        partial(_knn_kernel, k=k, m_chunks=n_ch),
        grid=grid,
        in_specs=[
            pl.BlockSpec((n_qb, n_ch), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((BQ, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((BQ, MAX_K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BQ, MAX_K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((qp, MAX_K), jnp.float32),
            jax.ShapeDtypeStruct((qp, MAX_K), jnp.int32),
        ],
    )(prune, q4, dbt)

    dist = dist[:q_n, :k]
    idx = jnp.clip(idx[:q_n, :k], 0, max(m_n - 1, 0))
    dist = jnp.where(q_mask[:, None], dist, jnp.inf)
    return dist, idx
