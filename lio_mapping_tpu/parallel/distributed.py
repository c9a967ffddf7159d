"""Reduced multi-chip window-BA step (association + solve + marginalize).

One ``shard_map``-wrapped program over a 1-D device mesh ("data" axis):

1. feature association — each device transforms ITS shard of every frame's
   stack into the pivot frame, runs exact KNN against the (replicated,
   small) local map, fits planes (ops/fits);
2. sharded window BA (parallel/sharded_ba) — partial Hessians psum-reduced;
3. sharded pivot marginalization (ops/solver.marginalize_pivot with
   psum_axis) producing the new factored prior.

This module is the ISOLATED BA core used by tools/bench_scaling.py (clean
kernel-level scaling numbers without the front end). The FULL distributed
estimator step — deskew, corner rows, newest-frame mini-GN, gates,
extrinsic + prior, yaw gauge — is parallel/lio_dist.make_sharded_lio_step;
that is what ``__graft_entry__.dryrun_multichip`` and the pipeline's
``--mesh`` mode run.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import LioConfig
from ..ops import knn as KNN
from ..ops import marginalization as MG
from ..ops import solver as SV
from ..ops.fits import plane_fit
from ..utils import quaternion as quat
from . import sharded_ba as SB

AXIS = SB.AXIS


def _associate_local(
    map_xyz, map_mask, stack_xyz, stack_mask, rel_q, rel_t, cfg: LioConfig,
):
    """Per-device feature association for one frame's stack shard
    (mirrors models/estimator._calculate_features)."""
    e = cfg.estimator
    point_sel = quat.rotate(rel_q[None, :], stack_xyz) + rel_t[None, :]
    sq_d, idx = KNN.knn(point_sel, stack_mask, map_xyz, map_mask, k=5, prune_beyond=e.min_match_sq_dis)
    nn_ok = sq_d[:, 4] < e.min_match_sq_dis
    w, d, plane_ok = plane_fit(map_xyz[idx], nn_ok, e.min_plane_dis)
    pd2 = jnp.sum(w * point_sel, axis=-1) + d
    rng = jnp.sqrt(jnp.maximum(jnp.linalg.norm(point_sel, axis=-1), 1e-12))
    s = 1.0 - 0.9 * jnp.abs(pd2) / rng
    ok = stack_mask & nn_ok & plane_ok & (s > 0.1)
    coeff = jnp.concatenate([s[:, None] * w, (s * d)[:, None]], axis=-1)
    return coeff, ok


def distributed_window_step(
    x0: SV.OptStates,
    pres,
    g_vec,
    map_xyz, map_mask,            # local map, replicated
    stacks_xyz, stacks_mask,      # (S, F_local, ...) sharded on F
    rel_q, rel_t,                 # (S+1, ...) frame->pivot transforms
    prior: MG.PriorState,
    cfg: LioConfig,
):
    """Device-local body of the sharded window step (run under shard_map)."""
    e = cfg.estimator
    s = e.opt_window_size

    coeffs, oks = [], []
    for i in range(s):
        c_i, ok_i = _associate_local(
            map_xyz, map_mask, stacks_xyz[i], stacks_mask[i],
            rel_q[i + 1], rel_t[i + 1], cfg)
        coeffs.append(c_i)
        oks.append(ok_i)
    planes_local = SV.PlaneFactors(
        point=stacks_xyz, coeff=jnp.stack(coeffs), mask=jnp.stack(oks))

    x_opt, cost = SB.solve_window_sharded(
        x0, pres, g_vec, planes_local, prior, None,
        s=s, max_iterations=e.max_solver_iterations,
        cauchy_scale=e.cauchy_loss_scale,
        opt_extrinsic=jnp.asarray(False),
        use_marg=prior.valid)

    new_prior = SV.marginalize_pivot(
        x_opt, jax.tree.map(lambda a: a[0], pres), g_vec, planes_local, prior,
        s=s, cauchy_scale=e.cauchy_loss_scale, psum_axis=AXIS)

    return x_opt, new_prior, cost


def make_distributed_step(mesh: Mesh, cfg: LioConfig):
    """jit-compiled shard_map wrapper of ``distributed_window_step``."""

    fn = jax.shard_map(
        lambda x0, pres, g_vec, mx, mm, sx, sm, rq, rt, prior:
            distributed_window_step(
                x0, pres, g_vec, mx, mm, sx, sm, rq, rt, prior, cfg),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P(None, AXIS), P(None, AXIS), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Map-sharded variant: the local map itself is sharded over the mesh
# ---------------------------------------------------------------------------


def _associate_local_mapsharded(
    db_block, db_block_mask, stack_xyz, stack_mask, rel_q, rel_t,
    cfg: LioConfig,
):
    """Association with the map sharded: ring-KNN carries the neighbor
    coordinates, so the plane fit stays device-local (no global gather)."""
    from .map_sharded import ring_knn

    e = cfg.estimator
    point_sel = quat.rotate(rel_q[None, :], stack_xyz) + rel_t[None, :]
    sq_d, _, neighbors = ring_knn(
        point_sel, stack_mask, db_block, db_block_mask, k=5,
        prune_beyond=e.min_match_sq_dis)
    nn_ok = sq_d[:, 4] < e.min_match_sq_dis
    w, d, plane_ok = plane_fit(neighbors, nn_ok, e.min_plane_dis)
    pd2 = jnp.sum(w * point_sel, axis=-1) + d
    rng = jnp.sqrt(jnp.maximum(jnp.linalg.norm(point_sel, axis=-1), 1e-12))
    s = 1.0 - 0.9 * jnp.abs(pd2) / rng
    ok = stack_mask & nn_ok & plane_ok & (s > 0.1)
    coeff = jnp.concatenate([s[:, None] * w, (s * d)[:, None]], axis=-1)
    return coeff, ok


def distributed_window_step_mapsharded(
    x0: SV.OptStates,
    pres,
    g_vec,
    map_xyz_block, map_mask_block,  # (M_local, ...) sharded map block
    stacks_xyz, stacks_mask,        # (S, F_local, ...) sharded on F
    rel_q, rel_t,
    prior: MG.PriorState,
    cfg: LioConfig,
):
    """Device-local body with BOTH the feature axis and the map sharded.

    Scales past the replicated-map variant when the local map no longer
    fits (or no longer should be broadcast) per device: map blocks ride the
    ICI ring exactly once per association round.
    """
    e = cfg.estimator
    s = e.opt_window_size

    coeffs, oks = [], []
    for i in range(s):
        c_i, ok_i = _associate_local_mapsharded(
            map_xyz_block, map_mask_block, stacks_xyz[i], stacks_mask[i],
            rel_q[i + 1], rel_t[i + 1], cfg)
        coeffs.append(c_i)
        oks.append(ok_i)
    planes_local = SV.PlaneFactors(
        point=stacks_xyz, coeff=jnp.stack(coeffs), mask=jnp.stack(oks))

    x_opt, cost = SB.solve_window_sharded(
        x0, pres, g_vec, planes_local, prior, None,
        s=s, max_iterations=e.max_solver_iterations,
        cauchy_scale=e.cauchy_loss_scale,
        opt_extrinsic=jnp.asarray(False),
        use_marg=prior.valid)

    new_prior = SV.marginalize_pivot(
        x_opt, jax.tree.map(lambda a: a[0], pres), g_vec, planes_local, prior,
        s=s, cauchy_scale=e.cauchy_loss_scale, psum_axis=AXIS)

    return x_opt, new_prior, cost


def make_distributed_step_mapsharded(mesh: Mesh, cfg: LioConfig):
    """jit-compiled shard_map wrapper of the map-sharded window step."""

    fn = jax.shard_map(
        lambda x0, pres, g_vec, mx, mm, sx, sm, rq, rt, prior:
            distributed_window_step_mapsharded(
                x0, pres, g_vec, mx, mm, sx, sm, rq, rt, prior, cfg),
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P(AXIS),
                  P(None, AXIS), P(None, AXIS), P(), P(), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
