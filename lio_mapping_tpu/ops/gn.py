"""Shared 6-DoF Gauss-Newton machinery with degeneracy projection.

Parity target: the normal-equation solve + eigenvalue degeneracy guard used
identically in PointOdometry.cc:539-615, PointMapping.cc:614-714 and
Estimator.cc:1262-1339 (CalculateLaserOdom).

Deviation from the reference (intentional, documented): the reference's
Eigen port zeroes *rows* of the eigenvector matrix (``mat_V2(i,j)=0`` with
column-eigenvector V), which degenerates to zeroing leading state
components; we implement the mathematically intended projection
``P = V diag(mask) V^T`` that removes the actual near-null eigen-directions
(same threshold, same "scan ascending eigenvalues, stop at first above
threshold" rule).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class GNState(NamedTuple):
    proj: jnp.ndarray          # (6,6) degeneracy projection matrix
    is_degenerate: jnp.ndarray  # bool


def degeneracy_projection(ata: jnp.ndarray, eigen_th: float) -> GNState:
    """Compute the degenerate-direction projector from A^T A (iter 0 only)."""
    vals, vecs = jnp.linalg.eigh(ata)  # ascending
    # scan ascending; stop at the first eigenvalue >= threshold
    below = vals < eigen_th
    keep_small = jnp.cumprod(below.astype(jnp.int32)) == 1  # leading run of small
    mask = ~keep_small
    proj = (vecs * mask[None, :].astype(ata.dtype)) @ vecs.T
    return GNState(proj=proj, is_degenerate=jnp.any(keep_small))


def solve_normal_equations(
    jac: jnp.ndarray,
    rhs: jnp.ndarray,
    w: jnp.ndarray,
    state: GNState | None,
    eigen_th: float,
):
    """Solve (J^T J) x = J^T b with masked rows and degeneracy projection.

    jac: (N, 6); rhs: (N,) already-negated residual target (mat_B);
    w: (N,) row validity in {0,1}. ``state`` None => first iteration
    (compute the projector), else reuse.
    Returns (x (6,), new_state).
    """
    jw = jac * w[:, None]
    ata = jw.T @ jac  # (6,6) — rides the MXU for large N
    atb = jw.T @ rhs
    x = jnp.linalg.solve(ata + 1e-12 * jnp.eye(6, dtype=ata.dtype), atb)

    if state is None:
        state = degeneracy_projection(ata, eigen_th)
    x = jnp.where(state.is_degenerate, state.proj @ x, x)
    x = jnp.where(jnp.isfinite(x), x, 0.0)
    return x, state
