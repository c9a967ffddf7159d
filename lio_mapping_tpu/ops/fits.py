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


def solve3x3(m: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 solve (Cramer/adjugate).

    TPU note: LAPACK-style batched solves lower to expensive custom calls;
    the adjugate form is pure VPU arithmetic (~2x faster and fuses).
    """
    c00 = m[..., 1, 1] * m[..., 2, 2] - m[..., 1, 2] * m[..., 2, 1]
    c01 = m[..., 1, 2] * m[..., 2, 0] - m[..., 1, 0] * m[..., 2, 2]
    c02 = m[..., 1, 0] * m[..., 2, 1] - m[..., 1, 1] * m[..., 2, 0]
    det = m[..., 0, 0] * c00 + m[..., 0, 1] * c01 + m[..., 0, 2] * c02
    c10 = m[..., 0, 2] * m[..., 2, 1] - m[..., 0, 1] * m[..., 2, 2]
    c11 = m[..., 0, 0] * m[..., 2, 2] - m[..., 0, 2] * m[..., 2, 0]
    c12 = m[..., 0, 1] * m[..., 2, 0] - m[..., 0, 0] * m[..., 2, 1]
    c20 = m[..., 0, 1] * m[..., 1, 2] - m[..., 0, 2] * m[..., 1, 1]
    c21 = m[..., 0, 2] * m[..., 1, 0] - m[..., 0, 0] * m[..., 1, 2]
    c22 = m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-30, det, 1.0)
    x0 = (c00 * b[..., 0] + c10 * b[..., 1] + c20 * b[..., 2]) * inv_det
    x1 = (c01 * b[..., 0] + c11 * b[..., 1] + c21 * b[..., 2]) * inv_det
    x2 = (c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


def sym_eig3x3(m: jnp.ndarray):
    """Batched closed-form symmetric 3x3 eigendecomposition.

    Eigenvalues by the trigonometric method (ascending order), eigenvectors
    by cross products of rows of (A - lambda I). Pure elementwise math —
    ~100x cheaper than the batched ``jnp.linalg.eigh`` custom call on TPU.
    For (near-)repeated eigenvalues the vectors degrade gracefully; callers
    gate on eigenvalue separation (the LOAM line test) anyway.
    """
    dtype = m.dtype
    q = jnp.trace(m, axis1=-2, axis2=-1) / 3.0
    eye = jnp.eye(3, dtype=dtype)
    a_q = m - q[..., None, None] * eye
    p2 = jnp.sum(a_q * a_q, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    detb = (
        a_q[..., 0, 0] * (a_q[..., 1, 1] * a_q[..., 2, 2] - a_q[..., 1, 2] * a_q[..., 2, 1])
        - a_q[..., 0, 1] * (a_q[..., 1, 0] * a_q[..., 2, 2] - a_q[..., 1, 2] * a_q[..., 2, 0])
        + a_q[..., 0, 2] * (a_q[..., 1, 0] * a_q[..., 2, 1] - a_q[..., 1, 1] * a_q[..., 2, 0])
    )
    r = jnp.clip(detb / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l2 = q + 2.0 * p * jnp.cos(phi)                       # largest
    l0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    l1 = 3.0 * q - l0 - l2
    vals = jnp.stack([l0, l1, l2], axis=-1)  # ascending

    def eigvec(lam):
        am = m - lam[..., None, None] * eye
        # cross products of row pairs; pick the largest
        c0 = jnp.cross(am[..., 0, :], am[..., 1, :])
        c1 = jnp.cross(am[..., 0, :], am[..., 2, :])
        c2 = jnp.cross(am[..., 1, :], am[..., 2, :])
        n0 = jnp.sum(c0 * c0, axis=-1)
        n1 = jnp.sum(c1 * c1, axis=-1)
        n2 = jnp.sum(c2 * c2, axis=-1)
        best = jnp.argmax(jnp.stack([n0, n1, n2], axis=-1), axis=-1)
        c = jnp.stack([c0, c1, c2], axis=-2)
        v = jnp.take_along_axis(c, best[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)

    vecs = jnp.stack([eigvec(l0), eigvec(l1), eigvec(l2)], axis=-1)  # columns
    return vals, vecs


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
    x = solve3x3(ata + eye, atb)

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
    vals, vecs = sym_eig3x3(cov)  # ascending, closed form
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
