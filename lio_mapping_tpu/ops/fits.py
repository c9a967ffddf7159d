"""Batched geometric fits: 5-NN plane fits and line (edge) fits.

Parity targets:
* surf plane fit ``A x = -1`` + unit-normalization + 0.2 m planarity
  validation: PointMapping.cc:514-606 / Estimator.cc:1014-1056.
* corner line fit: 5-NN centroid + covariance eigendecomposition, accept if
  largest eigenvalue > 3x middle: PointMapping.cc:381-510.

All fits are vmapped closed-form solves — thousands run per sweep in one
fused XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def plane_fit(neighbors: jnp.ndarray, valid: jnp.ndarray, min_plane_dis: float):
    """Fit plane (w, d): w.p + d = 0, |w| = 1 through k neighbor points.

    neighbors: (..., K, 3); valid: (...,) bool (all K must be real points).
    Returns (w (...,3), d (...,), ok (...,)).

    Solves A x = -1 by normal equations (least squares, equals the
    reference's colPivHouseholderQr for full-rank A), then normalizes, then
    checks every neighbor is within ``min_plane_dis`` of the plane.
    """
    a = neighbors
    ata = jnp.einsum("...ki,...kj->...ij", a, a)
    atb = -jnp.sum(a, axis=-2)
    # Guard singular systems: add tiny jitter, invalid results filtered by ok.
    eye = jnp.eye(3, dtype=a.dtype) * 1e-8
    x = jnp.linalg.solve(ata + eye, atb[..., None])[..., 0]

    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    w = x / jnp.maximum(norm, 1e-12)
    d = 1.0 / jnp.maximum(norm[..., 0], 1e-12)

    dist = jnp.abs(jnp.einsum("...ki,...i->...k", a, w) + d[..., None])
    planar = jnp.all(dist <= min_plane_dis, axis=-1)
    ok = valid & planar & jnp.isfinite(d) & (norm[..., 0] > 1e-8)
    return w, d, ok


def eig3x3_descending(m: jnp.ndarray):
    """Symmetric 3x3 eigendecomposition, eigenvalues ascending (jnp.eigh)."""
    vals, vecs = jnp.linalg.eigh(m)
    return vals, vecs


def line_fit(neighbors: jnp.ndarray, valid: jnp.ndarray):
    """Fit an edge line through K neighbors (corner association).

    Returns (centroid (...,3), direction (...,3) unit, ok (...,)) with
    ok true when lambda_max > 3 * lambda_mid (PointMapping.cc:423).
    """
    k = neighbors.shape[-2]
    c = jnp.mean(neighbors, axis=-2)
    dev = neighbors - c[..., None, :]
    cov = jnp.einsum("...ki,...kj->...ij", dev, dev) / k
    vals, vecs = jnp.linalg.eigh(cov)  # ascending
    direction = vecs[..., :, 2]
    ok = valid & (vals[..., 2] > 3.0 * vals[..., 1])
    return c, direction, ok


def point_to_line_residual(p: jnp.ndarray, centroid: jnp.ndarray, direction: jnp.ndarray):
    """Distance + unit direction toward the line through (centroid, direction).

    Reproduces the reference's two-virtual-point construction
    (PointMapping.cc:425-473): X1 = c + 0.1 u, X2 = c - 0.1 u,
    ld2 = |(p-X1)x(p-X2)| / |X1-X2| and the normal is
    ((X1-X2) x ((p-X1)x(p-X2))).normalized().
    """
    x1 = centroid + 0.1 * direction
    x2 = centroid - 0.1 * direction
    a_vec = jnp.cross(p - x1, p - x2)
    l12 = jnp.linalg.norm(x1 - x2, axis=-1)
    ld2 = jnp.linalg.norm(a_vec, axis=-1) / jnp.maximum(l12, 1e-12)
    n = jnp.cross(x1 - x2, a_vec)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
    return ld2, n
