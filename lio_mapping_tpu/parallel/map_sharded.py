"""Map-sharded distributed KNN: each device owns a block of the map.

The replicated-map path (parallel/distributed.py) broadcasts the local map
to every device — fine while the map is small. This module implements the
other half of SURVEY §7 phase 9 ("distributed KNN: each host owns blocks"):
the map lives sharded across the mesh and never materializes on one device.

Design (scaling-book ring pattern, not a reference translation — the
reference's KdTreeFLANN is single-host, SURVEY §2 concurrency table):

* queries are sharded over the mesh axis (each device associates its own
  query shard), and the map is sharded into D equal blocks;
* a D-step ring: at step t, device r holds map block (r - t) mod D; it
  merges that block's exact top-k into its running best and passes the
  block to device r+1 with ``ppermute`` — compute and ICI transfer overlap,
  and per-device peak memory stays at one block;
* the running best carries the neighbor COORDINATES alongside (dist, idx),
  so downstream plane/line fits never need a global-map gather — after the
  ring, association is fully device-local.

Exactness: every block's candidates enter the same top-k merge the
single-device kernel uses, so the result equals ``ops.knn.knn`` on the
concatenated map up to distance ties (validated in tests/test_sharded.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import knn as KNN

AXIS = "data"


def ring_knn(
    queries: jnp.ndarray,     # (Qd, 3) this device's query shard
    q_mask: jnp.ndarray,      # (Qd,)
    db_block: jnp.ndarray,    # (Md, 3) this device's map block
    db_mask: jnp.ndarray,     # (Md,)
    k: int = 5,
    axis: str = AXIS,
    prune_beyond: float | None = None,
):
    """Exact k-NN of the local query shard against the GLOBAL sharded map.

    Call inside ``shard_map`` with ``queries``/``db_block`` sharded over
    ``axis``. Returns (sq_dists (Qd, k) ascending, global_idx (Qd, k),
    neighbors (Qd, k, 3)) — global indices address the concatenated map in
    mesh-axis order.
    """
    n_dev = jax.lax.axis_size(axis)
    rank = jax.lax.axis_index(axis)
    q_n = queries.shape[0]
    m_d = db_block.shape[0]
    dtype = queries.dtype

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def merge(best, cand):
        bd, bi, bx = best
        cd, ci, cx = cand
        cat_d = jnp.concatenate([bd, cd], axis=1)            # (Q, 2k)
        cat_i = jnp.concatenate([bi, ci], axis=1)
        cat_x = jnp.concatenate([bx, cx], axis=1)
        neg, arg = jax.lax.top_k(-cat_d, k)
        take = lambda a: jnp.take_along_axis(a, arg, axis=1)
        return -neg, take(cat_i), jnp.take_along_axis(
            cat_x, arg[..., None], axis=1)

    def step(t, carry):
        best, blk_xyz, blk_mask = carry
        owner = (rank - t) % n_dev
        d, i_local = KNN.knn(queries, q_mask, blk_xyz, blk_mask, k=k,
                             prune_beyond=prune_beyond)
        cand = (d, i_local + owner * m_d, blk_xyz[i_local])
        best = merge(best, cand)
        # rotate the block forward for the next step (the last rotation
        # returns blocks to their owners — free pipelining, no tail case)
        blk_xyz = jax.lax.ppermute(blk_xyz, axis, perm)
        blk_mask = jax.lax.ppermute(blk_mask, axis, perm)
        return best, blk_xyz, blk_mask

    best0 = (jnp.full((q_n, k), jnp.inf, dtype),
             jnp.zeros((q_n, k), jnp.int32),
             jnp.zeros((q_n, k, 3), dtype))
    best, _, _ = jax.lax.fori_loop(
        0, n_dev, step, (best0, db_block, db_mask))
    return best
