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

Since round 3 the sharded LM loop IS the single-device one:
``ops.solver.solve_window`` takes ``psum_axis`` and reduces the plane
contributions inside ``assemble_normal_equations`` — N+1 evaluations per
accepted step with ftol early exit, identical carry structure, no
duplicated (and slower) distributed variant. ``solve_window_sharded`` is
kept as the shard_map-facing name.

The FULL distributed estimator step (association + gates + marginalization
included) lives in parallel/lio_dist.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..ops import marginalization as MG
from ..ops import solver as SV

AXIS = "data"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    if devices is None:
        devices = jax.devices()
    import numpy as np

    return Mesh(np.array(devices), (axis,))


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
    planes_extra_local: SV.PlaneFactors = None,
):
    """LM over the window with the plane-feature axis sharded over ``axis``.

    Call inside ``shard_map``: ``planes_local`` (and optionally
    ``planes_extra_local``) is this device's shard; all other inputs are
    replicated. Device-local partial Hessians reduce with ``psum`` —
    numerically identical (up to summation order) to the single-device
    ``solver.solve_window``, and literally the same loop (psum_axis).
    Returns (x_opt, final total cost).
    """
    x_fin, diag = SV.solve_window(
        x0, pres, g_vec, planes_local, prior, ex_prior,
        s=s, max_iterations=max_iterations, cauchy_scale=cauchy_scale,
        opt_extrinsic=opt_extrinsic, use_marg=use_marg,
        planes_extra=planes_extra_local, psum_axis=axis)
    cost = diag.cost_marg + diag.cost_imu + diag.cost_plane
    return x_fin, cost
