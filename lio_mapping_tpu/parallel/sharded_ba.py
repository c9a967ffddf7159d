"""Distributed sliding-window bundle adjustment (net-new capability).

The reference is single-host (SURVEY §2 concurrency table); this module is
the BASELINE config-5 scale-out: plane-feature residuals (the dominant
factor count — thousands per frame) are sharded across a device mesh, each
device assembles its partial Gauss-Newton system on its feature shard, and
the (D x D, D ~ 126) normal equations are reduced with a single ``psum``
over the mesh — the Schur-complement-style collective reduction of
BASELINE.json's north star. The IMU/prior/extrinsic factors are cheap and
evaluated replicated; the LM solve itself is replicated (a 126x126 Cholesky
per iteration is negligible next to the feature fan-in).

Feature association (the KNN + plane-fit front half) shards the same way:
queries split across devices, the local map replicated (it is ~100 KB-10 MB
— broadcast once per sweep over ICI).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import factors as FA
from ..ops import marginalization as MG
from ..ops import solver as SV
from ..utils import quaternion as quat

AXIS = "data"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis,))


def _local_plane_system(x: SV.OptStates, planes: SV.PlaneFactors, s: int,
                        cauchy_scale: float, dim: int):
    """Partial (H, g, cost) from this device's feature shard."""
    dtype = x.p.dtype
    pose_off, sb_off, ex_off, _ = SV._layout(s)
    h = jnp.zeros((dim, dim), dtype)
    g = jnp.zeros((dim,), dtype)
    cost = jnp.zeros((), dtype)

    for i in range(s):
        def one_feat(pt, co):
            return FA.pivot_point_plane_factor(
                pt, co, x.p[0], x.q[0], x.p[i + 1], x.q[i + 1], x.ex_p, x.ex_q)

        res_i, (j_piv, j_i, j_ex) = jax.vmap(one_feat)(planes.point[i], planes.coeff[i])
        r_scale, j_scale = FA.cauchy_scaling(res_i * res_i, cauchy_scale)
        wm = (planes.mask[i].astype(dtype) * j_scale)[:, None]
        res_w = planes.mask[i].astype(dtype) * r_scale * res_i

        jp = j_piv * wm
        ji = j_i * wm
        je = j_ex * wm
        blocks = [(pose_off, jp), (pose_off + 6 * (i + 1), ji), (ex_off, je)]
        for (o1, j1) in blocks:
            for (o2, j2) in blocks:
                h = h.at[o1:o1 + 6, o2:o2 + 6].add(j1.T @ j2)
            g = g.at[o1:o1 + 6].add(j1.T @ res_w)
        cost = cost + 0.5 * jnp.sum(res_w * res_w)
    return h, g, cost


def _replicated_system(x: SV.OptStates, pres, g_vec, prior: MG.PriorState,
                       ex_prior, s: int, dim: int):
    """H/g/cost of the non-sharded factor groups (imu, marg prior, ex prior)."""
    dtype = x.p.dtype
    groups = SV._evaluate(
        x, pres, g_vec, SV.PlaneFactors(
            point=jnp.zeros((s, 1, 3), dtype),
            coeff=jnp.zeros((s, 1, 4), dtype),
            mask=jnp.zeros((s, 1), bool)),
        prior, ex_prior, {"cauchy_scale": 1.0}, s)
    del groups["plane"]  # handled sharded
    h = jnp.zeros((dim, dim), dtype)
    g = jnp.zeros((dim,), dtype)
    cost = jnp.zeros((), dtype)
    for (j, r, w) in groups.values():
        jw = j * w[:, None]
        h = h + jw.T @ j
        g = g + jw.T @ r
        cost = cost + 0.5 * jnp.sum(w * r * r)
    return h, g, cost


def solve_window_sharded(
    x0: SV.OptStates,
    pres,
    g_vec: jnp.ndarray,
    planes_local: SV.PlaneFactors,
    prior: MG.PriorState,
    ex_prior,
    *,
    s: int,
    max_iterations: int = 10,
    cauchy_scale: float = 1.0,
    opt_extrinsic,
    use_marg,
    axis: str = AXIS,
):
    """LM over the window with the plane-feature axis sharded over ``axis``.

    Call inside ``shard_map``: ``planes_local`` is this device's shard; all
    other inputs are replicated. Device-local partial Hessians are reduced
    with ``psum`` — numerically identical (up to summation order) to the
    single-device ``solver.solve_window``.
    """
    dtype = x0.p.dtype
    pose_off, sb_off, ex_off, dim = SV._layout(s)

    free = jnp.ones((dim,), dtype)
    free = free.at[ex_off:ex_off + 6].set(
        jnp.where(opt_extrinsic, 1.0, 0.0) * jnp.ones(6, dtype))
    prior_used = prior._replace(valid=prior.valid & use_marg)

    def system(x):
        h_p, g_p, c_p = _local_plane_system(x, planes_local, s, cauchy_scale, dim)
        h_p = jax.lax.psum(h_p, axis)
        g_p = jax.lax.psum(g_p, axis)
        c_p = jax.lax.psum(c_p, axis)
        h_r, g_r, c_r = _replicated_system(x, pres, g_vec, prior_used, ex_prior, s, dim)
        return h_p + h_r, g_p + g_r, c_p + c_r

    def cost_of(x):
        _, _, c = system(x)
        return c

    def lm_step(carry, _):
        x, lam, cost = carry
        h, g, _ = system(x)
        m = free
        h_m = (h * m[None, :]) * m[:, None] + jnp.diag(1.0 - m)
        g_m = g * m
        damped = h_m + lam * jnp.diag(jnp.maximum(jnp.diag(h_m), 1e-6))
        dx = -jnp.linalg.solve(damped, g_m)
        x_new = SV._retract(x, dx * m, s)
        new_cost = cost_of(x_new)
        accept = new_cost < cost
        x = jax.tree.map(lambda a, b: jnp.where(accept, a, b), x_new, x)
        lam = jnp.where(accept, jnp.maximum(lam * 0.5, 1e-8), lam * 4.0)
        cost = jnp.where(accept, new_cost, cost)
        return (x, lam, cost), None

    cost0 = cost_of(x0)
    (x_fin, _, cost_fin), _ = jax.lax.scan(
        lm_step, (x0, jnp.asarray(1e-4, dtype), cost0), None, length=max_iterations)
    return x_fin, cost_fin
