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

# Contraction einsums here have tiny dims (K=5, 3) but still lower to MXU
# dot_generals, which default to bf16 passes on TPU: a ~1e-2 relative
# error in a neighbor covariance flips line/plane directions and turned
# the use_corner closed loop from 0.19 m (CPU f32) to 1.57 m ATE on
# device. Full-f32 contraction costs nothing at these shapes (VPU-bound).
_HI = jax.lax.Precision.HIGHEST


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

    def apply_adjugate(r0, r1, r2):
        y0 = (c00 * r0 + c10 * r1 + c20 * r2) * inv_det
        y1 = (c01 * r0 + c11 * r1 + c21 * r2) * inv_det
        y2 = (c02 * r0 + c12 * r1 + c22 * r2) * inv_det
        return jnp.stack([y0, y1, y2], axis=-1)

    x = apply_adjugate(b[..., 0], b[..., 1], b[..., 2])
    # One step of iterative refinement: in f32 the raw adjugate solve loses
    # ~half the mantissa on the ill-conditioned normal equations of
    # near-coplanar neighborhoods; the residual correction recovers it for
    # a handful of extra VPU flops (still no LAPACK custom call).
    r = b - jnp.einsum("...ij,...j->...i", m, x, precision=_HI)
    return x + apply_adjugate(r[..., 0], r[..., 1], r[..., 2])


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


def lstsq_k3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Batched least-squares solve of (..., K, 3) @ x = (..., K,).

    Modified Gram-Schmidt QR + 3x3 back substitution — pure VPU
    arithmetic (no LAPACK custom call), and unlike the normal-equation
    route it does not square the condition number, which matters in f32
    for near-coplanar neighborhoods far from the origin.
    """
    eps = jnp.asarray(1e-30, a.dtype)
    a0, a1, a2 = a[..., 0], a[..., 1], a[..., 2]        # columns (..., K)

    r00 = jnp.sqrt(jnp.maximum(jnp.sum(a0 * a0, -1), eps))
    q0 = a0 / r00[..., None]
    r01 = jnp.sum(q0 * a1, -1)
    v1 = a1 - r01[..., None] * q0
    r11 = jnp.sqrt(jnp.maximum(jnp.sum(v1 * v1, -1), eps))
    q1 = v1 / r11[..., None]
    r02 = jnp.sum(q0 * a2, -1)
    r12 = jnp.sum(q1 * a2, -1)
    v2 = a2 - r02[..., None] * q0 - r12[..., None] * q1
    r22 = jnp.sqrt(jnp.maximum(jnp.sum(v2 * v2, -1), eps))
    q2 = v2 / r22[..., None]

    c0 = jnp.sum(q0 * b, -1)
    c1 = jnp.sum(q1 * b, -1)
    c2 = jnp.sum(q2 * b, -1)
    x2 = c2 / r22
    x1 = (c1 - r12 * x2) / r11
    x0 = (c0 - r01 * x1 - r02 * x2) / r00
    return jnp.stack([x0, x1, x2], axis=-1)


def plane_fit(neighbors: jnp.ndarray, valid: jnp.ndarray, min_plane_dis: float):
    """Fit plane (w, d): w.p + d = 0, |w| = 1 through k neighbor points.

    neighbors: (..., K, 3); valid: (...,) bool (all K must be real points).
    Returns (w (...,3), d (...,), ok (...,)).

    Solves the reference's algebraic system ``A x = -1``
    (PointMapping.cc:514-606, colPivHouseholderQr there) via in-kernel MGS
    QR on the raw K x 3 matrix — the normal-equation/Cramer route squares
    the condition number and loses the normal direction in f32 for
    neighborhoods far from the origin (~80 deg p99 error at 6 m; QR: 0.02).
    Then normalizes and checks every neighbor is within ``min_plane_dis``
    of the plane, as the reference does.
    """
    a = neighbors
    ones = jnp.ones(a.shape[:-1], a.dtype)
    x = lstsq_k3(a, -ones)

    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    w = x / jnp.maximum(norm, 1e-12)
    d = 1.0 / jnp.maximum(norm[..., 0], 1e-12)

    dist = jnp.abs(jnp.einsum("...ki,...i->...k", a, w, precision=_HI) + d[..., None])
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
    cov = jnp.einsum("...ki,...kj->...ij", dev, dev, precision=_HI) / k
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
