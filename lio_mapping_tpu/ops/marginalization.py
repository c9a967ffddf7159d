"""Schur-complement marginalization as dense fixed-shape linear algebra.

Parity target: src/factor/MarginalizationFactor.cc (VINS-Mono style).

The reference assembles the Gauss-Newton system over {previous prior, IMU
factor pivot->pivot+1, all pivot-involving plane factors} with 4 pthreads
(ThreadsConstructA, :157-269), Schur-eliminates the pivot pose+speedbias
(m=15), and refactorizes the remaining information into a whitened linear
prior via eigendecomposition (:275-302). Here the whole thing is a handful
of dense matmuls + two ``eigh`` calls inside one jit — the "4-thread
Hessian assembly" is a single MXU contraction.

Canonical layouts (S = opt_window_size):
* full vector (marg time):   [pose_0 (6) | sb_0 (9) | keep...]      m = 15
* keep vector (prior cols):  [pose_1..S (6 ea) | sb_1..S (9 ea) | ex (6)]
  n = 15 S + 6 — and after the slide these same physical states live in
  slots 0..S-1, which is exactly the reference's addr-shift
  (Estimator.cc:2230-2238).

``PriorState`` stores the factored prior (linearized jacobian/residual) and
the linearization values x0 of the kept blocks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat

EPS = 1e-8  # MarginalizationFactor.h:109


class PriorState(NamedTuple):
    """Marginalization prior over [pose_0..S-1 | sb_0..S-1 | ex].

    lin_jac: (n, n); lin_res: (n,);
    x0_q: (S, 4); x0_p: (S, 3); x0_sb: (S, 9); x0_ex_q: (4,); x0_ex_p: (3,)
    valid: () bool — false until the first marginalization.
    """

    lin_jac: jnp.ndarray
    lin_res: jnp.ndarray
    x0_q: jnp.ndarray
    x0_p: jnp.ndarray
    x0_sb: jnp.ndarray
    x0_ex_q: jnp.ndarray
    x0_ex_p: jnp.ndarray
    valid: jnp.ndarray

    @staticmethod
    def empty(opt_window_size: int, dtype=jnp.float32) -> "PriorState":
        s = opt_window_size
        n = 15 * s + 6
        return PriorState(
            lin_jac=jnp.zeros((n, n), dtype),
            lin_res=jnp.zeros((n,), dtype),
            x0_q=jnp.tile(quat.identity(dtype), (s, 1)),
            x0_p=jnp.zeros((s, 3), dtype),
            x0_sb=jnp.zeros((s, 9), dtype),
            x0_ex_q=quat.identity(dtype),
            x0_ex_p=jnp.zeros((3,), dtype),
            valid=jnp.asarray(False),
        )


def local_diff_pose(p, q, p0, q0):
    """Quaternion-aware local difference (MarginalizationFactor.cc:360-371)."""
    dq = quat.qmul(quat.conjugate(quat.normalize(q0)), quat.normalize(q))
    dtheta = 2.0 * dq[..., 1:4]
    dtheta = jnp.where(dq[..., 0:1] < 0, -dtheta, dtheta)
    return jnp.concatenate([p - p0, dtheta], axis=-1)


def prior_dx(prior: PriorState, qs, ps, sbs, ex_q, ex_p) -> jnp.ndarray:
    """Stack local differences of current kept states vs x0.

    qs/ps/sbs: current states in prior slots 0..S-1 (i.e. window frames
    pivot..window-1 *after* evaluation-time remapping); ex: extrinsic.
    """
    s = prior.x0_q.shape[0]
    d_pose = jax.vmap(local_diff_pose)(ps, qs, prior.x0_p, prior.x0_q)  # (S, 6)
    d_sb = sbs - prior.x0_sb  # (S, 9)
    d_ex = local_diff_pose(ex_p, ex_q, prior.x0_ex_p, prior.x0_ex_q)  # (6,)
    return jnp.concatenate([d_pose.reshape(6 * s), d_sb.reshape(9 * s), d_ex])


def prior_residual(prior: PriorState, qs, ps, sbs, ex_q, ex_p):
    """Replay the factored prior: r = r0 + J dx (MarginalizationFactor.cc:373-374)."""
    dx = prior_dx(prior, qs, ps, sbs, ex_q, ex_p)
    r = prior.lin_res + prior.lin_jac @ dx
    return jnp.where(prior.valid, r, jnp.zeros_like(r))


def _rel_tol(dtype) -> float:
    """Eigenvalue cut as a fraction of the largest eigenvalue.

    The reference's ABSOLUTE 1e-8 threshold (MarginalizationFactor.h:109)
    is meaningful in f64 where eigh noise is ~|A|*1e-15; in f32 the noise
    floor is ~|A|*1e-7 — with information norms reaching 1e6-1e8, pure
    noise eigenvalues pass an absolute 1e-8 gate and inject bogus prior
    directions whose bias compounds every sweep (measured: the ENTIRE 5x
    f32-vs-f64 closed-loop ATE gap came from this). A dtype-relative cut
    rejects them."""
    return float(jnp.finfo(dtype).eps) * 100.0


def _equilibrated_eigh(a: jnp.ndarray):
    """eigh of D^-1 A D^-1 (Jacobi scaling, diag -> 1): compresses the
    eigenvalue range across the p/theta/v/bias unit scales so f32 eigh
    resolves the small eigenvalues. Returns (vals, vecs, d) with
    A = D (V diag(vals) V^T) D."""
    a = 0.5 * (a + a.T)
    d = jnp.sqrt(jnp.clip(jnp.diag(a), 1e-12, None))
    a_s = a / d[:, None] / d[None, :]
    a_s = 0.5 * (a_s + a_s.T)
    vals, vecs = jnp.linalg.eigh(a_s)
    return vals, vecs, d


def psd_pinv(a: jnp.ndarray, eps: float = EPS):
    """Eigenvalue-thresholded pseudo-inverse (MarginalizationFactor.cc:280-282),
    computed on the Jacobi-equilibrated matrix with a dtype-relative cut."""
    vals, vecs, d = _equilibrated_eigh(a)
    cut = jnp.maximum(jnp.max(vals) * _rel_tol(a.dtype), eps)
    inv_vals = jnp.where(vals > cut, 1.0 / jnp.where(vals > cut, vals, 1.0), 0.0)
    pinv_s = (vecs * inv_vals[None, :]) @ vecs.T
    # pinv(A) = D^-1 pinv(A') D^-1
    return pinv_s / d[:, None] / d[None, :]


def schur_marginalize(a: jnp.ndarray, b: jnp.ndarray, m: int):
    """Marginalize the leading m states: (A', b') over the trailing block."""
    amm_inv = psd_pinv(a[:m, :m])
    arm = a[m:, :m]
    a_new = a[m:, m:] - arm @ amm_inv @ a[:m, m:]
    b_new = b[m:] - arm @ amm_inv @ b[:m]
    return a_new, b_new


def factorize_prior(a: jnp.ndarray, b: jnp.ndarray):
    """(A, b) -> whitened (lin_jac, lin_res) via eigendecomposition sqrt
    (MarginalizationFactor.cc:293-302).

    Kept REFERENCE-EXACT (absolute threshold, unscaled): an equilibrated
    variant with a relative cut is consistent as a factorization
    (J^T J = A, J^T r = b to ~1e-7 relative in f32) but changes |r|^2 —
    which feeds the convergence gates and the LM ftol — and measurably
    destabilizes the closed loop. The f32 fragility lives in the SCHUR
    pseudo-inverse (psd_pinv above), which is where the equilibration
    goes."""
    a = 0.5 * (a + a.T)
    vals, vecs = jnp.linalg.eigh(a)
    keep = vals > EPS
    s = jnp.where(keep, vals, 0.0)
    s_inv = jnp.where(keep, 1.0 / jnp.where(keep, vals, 1.0), 0.0)
    lin_jac = jnp.sqrt(s)[:, None] * vecs.T
    lin_res = jnp.sqrt(s_inv)[:, None] * vecs.T @ b
    return lin_jac, lin_res
