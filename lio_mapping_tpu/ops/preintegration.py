"""IMU midpoint preintegration as a ``lax.scan``.

Parity target: include/imu_processor/IntegrationBase.h:127-209 (VINS-Mono
style midpoint integration, with lio-mapping's exact discrete F (15x15) and
V (15x18) matrices — including its -0.1667 dp/dbg third-order term at
IntegrationBase.h:173 and the 0.5 position-noise entries at :189,:192).

State order [p, theta, v, ba, bg] (O_P/O_R/O_V/O_BA/O_BG,
IntegrationBase.h:56-62); 18-dim noise [acc_n0, gyr_n0, acc_n1, gyr_n1,
acc_w, gyr_w]. ``Repropagate`` (IntegrationBase.h:110-125) is a re-scan of
the buffered samples with new linearization biases — samples are stored as
fixed-capacity arrays with dt=0 padding (a dt=0 midpoint step is an exact
no-op, so padding needs no masking).

``evaluate`` is the 15-dim residual of IntegrationBase::Evaluate
(IntegrationBase.h:309-357) with bias-corrected deltas.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import quaternion as quat

# State order offsets (IntegrationBase.h:56-62)
O_P, O_R, O_V, O_BA, O_BG = 0, 3, 6, 9, 12


class ImuSamples(NamedTuple):
    """Fixed-capacity per-frame IMU buffer (dt=0 rows are padding).

    acc0/gyr0 are the sample at the *start* of the interval (the reference's
    ``linearized_acc_/linearized_gyr_``); rows are the successive samples.
    """

    acc0: jnp.ndarray  # (3,)
    gyr0: jnp.ndarray  # (3,)
    dt: jnp.ndarray    # (M,)
    acc: jnp.ndarray   # (M, 3)
    gyr: jnp.ndarray   # (M, 3)

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "ImuSamples":
        return ImuSamples(
            acc0=jnp.zeros(3, dtype), gyr0=jnp.zeros(3, dtype),
            dt=jnp.zeros(capacity, dtype),
            acc=jnp.zeros((capacity, 3), dtype), gyr=jnp.zeros((capacity, 3), dtype),
        )


def pack_samples_np(dts, accs, gyrs, acc0, gyr0, capacity: int):
    """Host-side packing of one frame's IMU batch into ONE (M+1, 7) array.

    Row 0 = [0, acc0, gyr0]; rows 1..M = [dt, acc, gyr] (dt=0 padding).
    One packed array = one host->device transfer per sweep instead of
    five — on a tunneled TPU each transfer serializes with compute on the
    device queue, so transfer count is wall-clock (measured ~0.12 ms each).
    """
    import numpy as np

    n = len(dts)
    assert n <= capacity, f"too many IMU samples per frame: {n} > {capacity}"
    out = np.zeros((capacity + 1, 7), np.float32)
    out[0, 1:4] = acc0
    out[0, 4:7] = gyr0
    out[1:n + 1, 0] = dts
    out[1:n + 1, 1:4] = accs
    out[1:n + 1, 4:7] = gyrs
    return out


def merge_packed_np(buffers, capacity: int):
    """Host-side merge of consecutive packed (M+1, 7) buffers into one.

    The LIO path consumes clouds every ``io_ratio``-th sweep
    (PointOdometry.cc:725-729); the skipped sweeps' IMU accumulates into
    the next consumed frame's preintegration interval (the reference's
    ``tmp_pre_integration_`` keeps integrating between compact frames).
    Row 0 (acc0/gyr0) comes from the FIRST buffer; dt>0 rows concatenate
    in order.
    """
    import numpy as np

    buffers = [np.asarray(b, np.float32) for b in buffers]
    out = np.zeros((capacity + 1, 7), np.float32)
    out[0] = buffers[0][0]
    n = 0
    for b in buffers:
        rows = b[1:][b[1:, 0] > 0]
        assert n + len(rows) <= capacity, \
            f"merged IMU samples exceed capacity: {n + len(rows)} > {capacity}"
        out[1 + n:1 + n + len(rows)] = rows
        n += len(rows)
    return out


def unpack_samples(packed) -> "ImuSamples":
    """Inverse of :func:`pack_samples_np` (works on device, inside jit)."""
    return ImuSamples(
        acc0=packed[0, 1:4], gyr0=packed[0, 4:7],
        dt=packed[1:, 0], acc=packed[1:, 1:4], gyr=packed[1:, 4:7])


class Preintegration(NamedTuple):
    delta_p: jnp.ndarray       # (3,)
    delta_q: jnp.ndarray       # (4,) wxyz
    delta_v: jnp.ndarray       # (3,)
    jacobian: jnp.ndarray      # (15, 15) d(delta)/d(state0, biases)
    covariance: jnp.ndarray    # (15, 15)
    sum_dt: jnp.ndarray        # ()
    linearized_ba: jnp.ndarray  # (3,)
    linearized_bg: jnp.ndarray  # (3,)

    @staticmethod
    def identity(dtype=jnp.float32) -> "Preintegration":
        return Preintegration(
            delta_p=jnp.zeros(3, dtype),
            delta_q=quat.identity(dtype),
            delta_v=jnp.zeros(3, dtype),
            jacobian=jnp.eye(15, dtype=dtype),
            covariance=jnp.zeros((15, 15), dtype=dtype),
            sum_dt=jnp.zeros((), dtype),
            linearized_ba=jnp.zeros(3, dtype),
            linearized_bg=jnp.zeros(3, dtype),
        )


def noise_matrix(acc_n: float, gyr_n: float, acc_w: float, gyr_w: float, dtype=jnp.float32):
    """18x18 continuous noise diag (IntegrationBase.h:94-100)."""
    d = jnp.asarray(
        [acc_n**2] * 3 + [gyr_n**2] * 3 + [acc_n**2] * 3 + [gyr_n**2] * 3
        + [acc_w**2] * 3 + [gyr_w**2] * 3, dtype=dtype)
    return jnp.diag(d)


def midpoint_step(state: Preintegration, dt, acc0, gyr0, acc1, gyr1, noise18):
    """One midpoint integration step (IntegrationBase.h:127-209)."""
    dtype = state.delta_p.dtype
    ba = state.linearized_ba
    bg = state.linearized_bg

    un_acc_0 = quat.rotate(state.delta_q, acc0 - ba)
    un_gyr = 0.5 * (gyr0 + gyr1) - bg
    dq_new = quat.qmul(state.delta_q, quat.delta_q(un_gyr * dt))
    un_acc_1 = quat.rotate(dq_new, acc1 - ba)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)
    dp_new = state.delta_p + state.delta_v * dt + 0.5 * un_acc * dt * dt
    dv_new = state.delta_v + un_acc * dt

    # --- discrete F (15x15) and V (15x18), reference layout exactly ---
    r_w_x = quat.skew(un_gyr)
    r_a_0_x = quat.skew(acc0 - ba)
    r_a_1_x = quat.skew(acc1 - ba)
    rot0 = quat.to_matrix(state.delta_q)
    rot1 = quat.to_matrix(quat.normalize(dq_new))
    eye3 = jnp.eye(3, dtype=dtype)

    f = jnp.zeros((15, 15), dtype=dtype)
    f = f.at[O_P:O_P + 3, O_P:O_P + 3].set(eye3)
    f = f.at[O_P:O_P + 3, O_R:O_R + 3].set(
        -0.25 * rot0 @ r_a_0_x * dt * dt
        + -0.25 * rot1 @ r_a_1_x @ (eye3 - r_w_x * dt) * dt * dt)
    f = f.at[O_P:O_P + 3, O_V:O_V + 3].set(eye3 * dt)
    f = f.at[O_P:O_P + 3, O_BA:O_BA + 3].set(-0.25 * (rot0 + rot1) * dt * dt)
    # NOTE: reference uses -0.1667 (third-order), not -0.25 (IntegrationBase.h:173)
    f = f.at[O_P:O_P + 3, O_BG:O_BG + 3].set(-0.1667 * rot1 @ r_a_1_x * dt * dt * -dt)
    f = f.at[O_R:O_R + 3, O_R:O_R + 3].set(eye3 - r_w_x * dt)
    f = f.at[O_R:O_R + 3, O_BG:O_BG + 3].set(-eye3 * dt)
    f = f.at[O_V:O_V + 3, O_R:O_R + 3].set(
        -0.5 * rot0 @ r_a_0_x * dt
        + -0.5 * rot1 @ r_a_1_x @ (eye3 - r_w_x * dt) * dt)
    f = f.at[O_V:O_V + 3, O_V:O_V + 3].set(eye3)
    f = f.at[O_V:O_V + 3, O_BA:O_BA + 3].set(-0.5 * (rot0 + rot1) * dt)
    f = f.at[O_V:O_V + 3, O_BG:O_BG + 3].set(-0.5 * rot1 @ r_a_1_x * dt * -dt)
    f = f.at[O_BA:O_BA + 3, O_BA:O_BA + 3].set(eye3)
    f = f.at[O_BG:O_BG + 3, O_BG:O_BG + 3].set(eye3)

    v = jnp.zeros((15, 18), dtype=dtype)
    v = v.at[O_P:O_P + 3, 0:3].set(0.5 * rot0 * dt * dt)
    v = v.at[O_P:O_P + 3, 3:6].set(0.25 * -rot1 @ r_a_1_x * dt * dt * 0.5 * dt)
    v = v.at[O_P:O_P + 3, 6:9].set(0.5 * rot1 * dt * dt)
    v = v.at[O_P:O_P + 3, 9:12].set(0.25 * -rot1 @ r_a_1_x * dt * dt * 0.5 * dt)
    v = v.at[O_R:O_R + 3, 3:6].set(0.5 * eye3 * dt)
    v = v.at[O_R:O_R + 3, 9:12].set(0.5 * eye3 * dt)
    v = v.at[O_V:O_V + 3, 0:3].set(0.5 * rot0 * dt)
    v = v.at[O_V:O_V + 3, 3:6].set(0.5 * -rot1 @ r_a_1_x * dt * 0.5 * dt)
    v = v.at[O_V:O_V + 3, 6:9].set(0.5 * rot1 * dt)
    v = v.at[O_V:O_V + 3, 9:12].set(0.5 * -rot1 @ r_a_1_x * dt * 0.5 * dt)
    v = v.at[O_BA:O_BA + 3, 12:15].set(eye3 * dt)
    v = v.at[O_BG:O_BG + 3, 15:18].set(eye3 * dt)

    return Preintegration(
        delta_p=dp_new,
        delta_q=quat.normalize(dq_new),
        delta_v=dv_new,
        jacobian=f @ state.jacobian,
        covariance=f @ state.covariance @ f.T + v @ noise18 @ v.T,
        sum_dt=state.sum_dt + dt,
        linearized_ba=ba,
        linearized_bg=bg,
    )


@jax.jit
def integrate_sequential(samples: ImuSamples, ba, bg, noise18) -> Preintegration:
    """Reference-shaped sequential integration (Propagate loop).

    One ``lax.scan`` step per IMU sample — the literal transcription of the
    reference recursion, kept as the ground truth the batched ``integrate``
    is tested against. O(M) sequential depth: latency-bound on TPU.
    """
    dtype = samples.acc.dtype
    init = Preintegration.identity(dtype)._replace(linearized_ba=ba, linearized_bg=bg)

    def step(carry, inp):
        state, acc_prev, gyr_prev = carry
        dt, acc1, gyr1 = inp
        new_state = midpoint_step(state, dt, acc_prev, gyr_prev, acc1, gyr1, noise18)
        # dt == 0 padding: midpoint step is exactly a no-op for the deltas,
        # but keep prev sample unchanged so padding can't shift acc0/gyr0.
        is_pad = dt == 0
        acc_next = jnp.where(is_pad, acc_prev, acc1)
        gyr_next = jnp.where(is_pad, gyr_prev, gyr1)
        return (new_state, acc_next, gyr_next), None

    (final, _, _), _ = jax.lax.scan(
        step, (init, samples.acc0, samples.gyr0),
        (samples.dt, samples.acc, samples.gyr))
    return final


def _step_matrices(dt, rot0, rot1, un_gyr, a0, a1, noise18, dtype):
    """Discrete F (15x15) / V N V^T (15x15) for one midpoint step, from the
    precomputed entry/exit rotations (IntegrationBase.h:150-200 layout)."""
    eye3 = jnp.eye(3, dtype=dtype)
    r_w_x = quat.skew(un_gyr)
    r_a_0_x = quat.skew(a0)
    r_a_1_x = quat.skew(a1)

    f = jnp.zeros((15, 15), dtype=dtype)
    f = f.at[O_P:O_P + 3, O_P:O_P + 3].set(eye3)
    f = f.at[O_P:O_P + 3, O_R:O_R + 3].set(
        -0.25 * rot0 @ r_a_0_x * dt * dt
        + -0.25 * rot1 @ r_a_1_x @ (eye3 - r_w_x * dt) * dt * dt)
    f = f.at[O_P:O_P + 3, O_V:O_V + 3].set(eye3 * dt)
    f = f.at[O_P:O_P + 3, O_BA:O_BA + 3].set(-0.25 * (rot0 + rot1) * dt * dt)
    # NOTE: reference uses -0.1667 (third-order), not -0.25 (IntegrationBase.h:173)
    f = f.at[O_P:O_P + 3, O_BG:O_BG + 3].set(-0.1667 * rot1 @ r_a_1_x * dt * dt * -dt)
    f = f.at[O_R:O_R + 3, O_R:O_R + 3].set(eye3 - r_w_x * dt)
    f = f.at[O_R:O_R + 3, O_BG:O_BG + 3].set(-eye3 * dt)
    f = f.at[O_V:O_V + 3, O_R:O_R + 3].set(
        -0.5 * rot0 @ r_a_0_x * dt
        + -0.5 * rot1 @ r_a_1_x @ (eye3 - r_w_x * dt) * dt)
    f = f.at[O_V:O_V + 3, O_V:O_V + 3].set(eye3)
    f = f.at[O_V:O_V + 3, O_BA:O_BA + 3].set(-0.5 * (rot0 + rot1) * dt)
    f = f.at[O_V:O_V + 3, O_BG:O_BG + 3].set(-0.5 * rot1 @ r_a_1_x * dt * -dt)
    f = f.at[O_BA:O_BA + 3, O_BA:O_BA + 3].set(eye3)
    f = f.at[O_BG:O_BG + 3, O_BG:O_BG + 3].set(eye3)

    v = jnp.zeros((15, 18), dtype=dtype)
    v = v.at[O_P:O_P + 3, 0:3].set(0.5 * rot0 * dt * dt)
    v = v.at[O_P:O_P + 3, 3:6].set(0.25 * -rot1 @ r_a_1_x * dt * dt * 0.5 * dt)
    v = v.at[O_P:O_P + 3, 6:9].set(0.5 * rot1 * dt * dt)
    v = v.at[O_P:O_P + 3, 9:12].set(0.25 * -rot1 @ r_a_1_x * dt * dt * 0.5 * dt)
    v = v.at[O_R:O_R + 3, 3:6].set(0.5 * eye3 * dt)
    v = v.at[O_R:O_R + 3, 9:12].set(0.5 * eye3 * dt)
    v = v.at[O_V:O_V + 3, 0:3].set(0.5 * rot0 * dt)
    v = v.at[O_V:O_V + 3, 3:6].set(0.5 * -rot1 @ r_a_1_x * dt * 0.5 * dt)
    v = v.at[O_V:O_V + 3, 6:9].set(0.5 * rot1 * dt)
    v = v.at[O_V:O_V + 3, 9:12].set(0.5 * -rot1 @ r_a_1_x * dt * 0.5 * dt)
    v = v.at[O_BA:O_BA + 3, 12:15].set(eye3 * dt)
    v = v.at[O_BG:O_BG + 3, 15:18].set(eye3 * dt)

    g = v @ noise18 @ v.T  # per-step injected noise, 15x15
    return f, g


@partial(jax.jit, static_argnames=("with_prefixes",))
def integrate(samples: ImuSamples, ba, bg, noise18, with_prefixes: bool = False):
    """Batched/log-depth integration of a full buffer (Propagate/Repropagate).

    Mathematically identical to ``integrate_sequential`` (same midpoint
    recursion, IntegrationBase.h:127-209) but restructured for TPU latency:
    the recursion is a composition of associative pieces, so the M-step
    sequential scan (M kernel-dispatches of 15x15 matmuls — pure latency)
    becomes

    * quaternion chain  dq_0 (x) ... (x) dq_k  -> ``lax.associative_scan``,
    * delta_v / delta_p -> (exclusive) cumulative sums,
    * bias Jacobian     F_{M-1} ... F_0        -> associative matrix scan,
    * covariance        sum_k  Phi_{k+1..} (V_k N V_k^T) Phi_{k+1..}^T
      with the suffix transports Phi from a reverse associative scan,
      contracted as one batched einsum.

    All heavy math is batched over the M samples; the only sequential
    structure left is the log(M)-depth scan tree. Results match the
    sequential version to float rounding (reassociation only).

    ``with_prefixes``: additionally return ``PrefixStates`` — the per-sample
    prefix deltas (delta_q/p/v after each sample, plus cumulative dt). The
    prefixes fall out of the associative scans already computed here; the
    estimator uses them to read off the body state at ``t_end -
    scan_period`` for IMU-predicted deskew (the reference's
    ``imu_stampedtransforms`` lookup, Estimator.cc:628-698) — exact even
    when the preintegration interval spans ``io_ratio`` sweeps.
    """
    dtype = samples.acc.dtype
    m = samples.dt.shape[0]
    dt = samples.dt
    valid = dt != 0

    # previous sample per step: forward-fill the last valid sample
    # (pads keep the previous sample, mirroring the scan's carry)
    idx = jnp.arange(m, dtype=jnp.int32)
    last_valid = jnp.where(valid, idx, jnp.int32(-1))
    prev_idx = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32),
         jax.lax.cummax(last_valid)[:-1]])
    acc_all = jnp.concatenate([samples.acc0[None, :], samples.acc], axis=0)
    gyr_all = jnp.concatenate([samples.gyr0[None, :], samples.gyr], axis=0)
    acc_prev = acc_all[prev_idx + 1]
    gyr_prev = gyr_all[prev_idx + 1]

    # --- quaternion chain (delta_q prefix products) ---
    un_gyr = 0.5 * (gyr_prev + samples.gyr) - bg[None, :]
    dqs = quat.delta_q(un_gyr * dt[:, None])
    cum_q = jax.lax.associative_scan(quat.qmul, dqs)
    cum_q = quat.normalize(cum_q)
    q_entry = jnp.concatenate([quat.identity(dtype)[None, :], cum_q[:-1]], axis=0)

    # --- accelerations in the start frame ---
    a0 = acc_prev - ba[None, :]
    a1 = samples.acc - ba[None, :]
    un_acc_0 = quat.rotate(q_entry, a0)
    # the reference rotates un_acc_1 by the *pre-normalization* product
    # q_entry (x) dq (midpoint_step: dq_new before normalize) — reproduce
    # that quirk exactly so batched == sequential to rounding
    un_acc_1 = quat.rotate(quat.qmul(q_entry, dqs), a1)
    un_acc = 0.5 * (un_acc_0 + un_acc_1)

    # --- delta_v / delta_p as cumulative sums ---
    dv_steps = un_acc * dt[:, None]
    dv_incl = jnp.cumsum(dv_steps, axis=0)
    v_entry = dv_incl - dv_steps  # exclusive cumsum: delta_v at step entry
    delta_v = dv_incl[-1]
    dp_steps = v_entry * dt[:, None] + 0.5 * un_acc * (dt * dt)[:, None]
    dp_incl = jnp.cumsum(dp_steps, axis=0)
    delta_p = dp_incl[-1]

    # --- per-step F / injected noise, batched ---
    rot0 = jax.vmap(quat.to_matrix)(q_entry)
    rot1 = jax.vmap(quat.to_matrix)(cum_q)
    fs, gs = jax.vmap(
        lambda d, r0, r1, w, x0, x1: _step_matrices(d, r0, r1, w, x0, x1, noise18, dtype)
    )(dt, rot0, rot1, un_gyr, a0, a1)

    # --- bias Jacobian: left product F_{M-1} ... F_0 ---
    prefix = jax.lax.associative_scan(lambda a, b: jnp.matmul(b, a), fs)
    jacobian = prefix[-1]

    # --- covariance: suffix-transported noise sum ---
    # suffix[k] = F_{M-1} ... F_k ; transport of step k's noise is suffix[k+1].
    # (with reverse=True the combine sees (earlier, later) in flipped order,
    # so descending composition is a @ b here, not b @ a)
    suffix = jax.lax.associative_scan(lambda a, b: jnp.matmul(a, b), fs, reverse=True)
    phi = jnp.concatenate([suffix[1:], jnp.eye(15, dtype=dtype)[None]], axis=0)
    covariance = jnp.einsum("kij,kjl,kml->im", phi, gs, phi)

    pre = Preintegration(
        delta_p=delta_p,
        delta_q=cum_q[-1],
        delta_v=delta_v,
        jacobian=jacobian,
        covariance=covariance,
        sum_dt=jnp.sum(dt),
        linearized_ba=ba,
        linearized_bg=bg,
    )
    if not with_prefixes:
        return pre
    return pre, PrefixStates(
        delta_q=cum_q, delta_p=dp_incl, delta_v=dv_incl,
        cum_dt=jnp.cumsum(dt))


def integrate_mean(samples: ImuSamples, ba, bg) -> Preintegration:
    """Mean-only midpoint integration: delta_q / delta_p / delta_v without
    the 15x15 bias-Jacobian / covariance propagation.

    For the IMU-predicted pose published on skipped-cadence sweeps
    (the reference's /predict_laser_odom, Estimator.cc:744-758) only the
    mean deltas feed :func:`apply_deltas`; dragging the (M,15,15) F/V
    scans through the program costs ~2.4 ms of device time per sweep for
    outputs nobody reads. Same mean recursion as :func:`integrate`
    (identical to float rounding); ``jacobian`` is identity (so bias
    corrections degrade gracefully if it ever flows into evaluate) but
    ``covariance`` is zeros and MUST NOT be consumed downstream.
    """
    dtype = samples.acc.dtype
    m = samples.dt.shape[0]
    dt = samples.dt
    valid = dt != 0

    idx = jnp.arange(m, dtype=jnp.int32)
    last_valid = jnp.where(valid, idx, jnp.int32(-1))
    prev_idx = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32),
         jax.lax.cummax(last_valid)[:-1]])
    acc_all = jnp.concatenate([samples.acc0[None, :], samples.acc], axis=0)
    gyr_all = jnp.concatenate([samples.gyr0[None, :], samples.gyr], axis=0)
    acc_prev = acc_all[prev_idx + 1]
    gyr_prev = gyr_all[prev_idx + 1]

    un_gyr = 0.5 * (gyr_prev + samples.gyr) - bg[None, :]
    dqs = quat.delta_q(un_gyr * dt[:, None])
    cum_q = jax.lax.associative_scan(quat.qmul, dqs)
    cum_q = quat.normalize(cum_q)
    q_entry = jnp.concatenate([quat.identity(dtype)[None, :], cum_q[:-1]], axis=0)

    a0 = acc_prev - ba[None, :]
    a1 = samples.acc - ba[None, :]
    un_acc = 0.5 * (quat.rotate(q_entry, a0)
                    + quat.rotate(quat.qmul(q_entry, dqs), a1))

    dv_steps = un_acc * dt[:, None]
    dv_incl = jnp.cumsum(dv_steps, axis=0)
    v_entry = dv_incl - dv_steps
    delta_v = dv_incl[-1]
    dp_steps = v_entry * dt[:, None] + 0.5 * un_acc * (dt * dt)[:, None]
    delta_p = jnp.sum(dp_steps, axis=0)

    return Preintegration(
        delta_p=delta_p,
        delta_q=cum_q[-1],
        delta_v=delta_v,
        jacobian=jnp.eye(15, dtype=dtype),
        covariance=jnp.zeros((15, 15), dtype),
        sum_dt=jnp.sum(dt),
        linearized_ba=ba,
        linearized_bg=bg,
    )


class PrefixStates(NamedTuple):
    """Per-sample prefix deltas from :func:`integrate` (padding rows repeat
    the last real sample's values — cum_dt is constant over padding)."""

    delta_q: jnp.ndarray  # (M, 4)
    delta_p: jnp.ndarray  # (M, 3)
    delta_v: jnp.ndarray  # (M, 3)
    cum_dt: jnp.ndarray   # (M,)


def state_at_offset(prefixes: PrefixStates, t_offset, q0, p0, v0, g_vec):
    """World state at the first sample time >= ``t_offset`` into the
    interval (nearest-after sample; IMU-rate quantization, like the
    reference's stamped-transform lookup, Estimator.cc:628-640)."""
    dtype = p0.dtype
    k = jnp.argmax(prefixes.cum_dt >= t_offset)
    at_start = t_offset <= 0  # interval start exactly (io_ratio == 1 case)
    t = jnp.where(at_start, jnp.zeros((), dtype), prefixes.cum_dt[k])
    dq = jnp.where(at_start, quat.identity(dtype), prefixes.delta_q[k])
    dp = jnp.where(at_start, jnp.zeros(3, dtype), prefixes.delta_p[k])
    dv = jnp.where(at_start, jnp.zeros(3, dtype), prefixes.delta_v[k])
    q = quat.normalize(quat.qmul(q0, dq))
    v = v0 + g_vec * t + quat.rotate(q0, dv)
    p = p0 + v0 * t + 0.5 * g_vec * t * t + quat.rotate(q0, dp)
    return q, p, v


def noise_matrix_euler(acc_n: float, gyr_n: float, acc_w: float, gyr_w: float,
                       dtype=jnp.float32):
    """12x12 noise diag for the Euler scheme (IntegrationBase.h:260-265)."""
    d = jnp.asarray(
        [acc_n**2] * 3 + [gyr_n**2] * 3 + [acc_w**2] * 3 + [gyr_w**2] * 3,
        dtype=dtype)
    return jnp.diag(d)


def euler_step(state: Preintegration, dt, acc1, gyr1, noise12):
    """One first-order Euler integration step — the reference's alternative
    scheme (IntegrationBase.h:211-276): endpoint-sample integration with
    continuous-time A (15x15) / U (15x12) discretized as F = I + dt A,
    V = dt U. Kept for scheme-parity; the main path uses ``midpoint_step``.

    Matches the reference quirk of NOT normalizing the accumulated
    quaternion per step (the midpoint scheme does)."""
    dtype = state.delta_p.dtype
    ba = state.linearized_ba
    bg = state.linearized_bg
    eye3 = jnp.eye(3, dtype=dtype)

    a_b = acc1 - ba
    acc_r = quat.rotate(state.delta_q, a_b)
    dp_new = state.delta_p + state.delta_v * dt + 0.5 * acc_r * dt * dt
    dv_new = state.delta_v + acc_r * dt
    omg = (gyr1 - bg) * dt / 2
    # unnormalized first-order quaternion increment (1, omg), [w,x,y,z]
    dr = jnp.concatenate([jnp.ones((1,), dtype), omg])
    dq_new = quat.qmul(state.delta_q, dr)

    r_w_x = quat.skew(gyr1 - bg)
    r_a_x = quat.skew(a_b)
    rot = quat.to_matrix(state.delta_q)

    a = jnp.zeros((15, 15), dtype)
    a = a.at[O_P:O_P + 3, O_R:O_R + 3].set(-0.5 * rot @ r_a_x * dt)
    a = a.at[O_P:O_P + 3, O_V:O_V + 3].set(eye3)
    a = a.at[O_P:O_P + 3, O_BA:O_BA + 3].set(-0.5 * rot * dt)
    a = a.at[O_R:O_R + 3, O_R:O_R + 3].set(-r_w_x)
    a = a.at[O_R:O_R + 3, O_BG:O_BG + 3].set(-eye3)
    a = a.at[O_V:O_V + 3, O_R:O_R + 3].set(-rot @ r_a_x)
    a = a.at[O_V:O_V + 3, O_BA:O_BA + 3].set(-rot)

    u = jnp.zeros((15, 12), dtype)
    u = u.at[O_P:O_P + 3, 0:3].set(0.5 * rot * dt)
    u = u.at[O_R:O_R + 3, 3:6].set(eye3)
    u = u.at[O_V:O_V + 3, 0:3].set(rot)
    u = u.at[O_BA:O_BA + 3, 6:9].set(eye3)
    u = u.at[O_BG:O_BG + 3, 9:12].set(eye3)

    f = jnp.eye(15, dtype=dtype) + dt * a
    v = dt * u
    return Preintegration(
        delta_p=dp_new,
        delta_q=dq_new,
        delta_v=dv_new,
        jacobian=f @ state.jacobian,
        covariance=f @ state.covariance @ f.T + v @ noise12 @ v.T,
        sum_dt=state.sum_dt + dt,
        linearized_ba=ba,
        linearized_bg=bg,
    )


@jax.jit
def integrate_euler(samples: ImuSamples, ba, bg, noise12) -> Preintegration:
    """Full-buffer first-order Euler integration (alternative scheme).

    dt=0 padding rows are exact no-ops here too (F = I, V = 0)."""
    dtype = samples.acc.dtype
    init = Preintegration.identity(dtype)._replace(linearized_ba=ba, linearized_bg=bg)

    def step(state, x):
        dt, acc1, gyr1 = x
        return euler_step(state, dt, acc1, gyr1, noise12), None

    final, _ = jax.lax.scan(step, init, (samples.dt, samples.acc, samples.gyr))
    return final._replace(delta_q=quat.normalize(final.delta_q))


def apply_deltas(pre: Preintegration, q0, p0, v0, g_vec):
    """World-state propagation from the preintegrated deltas.

    Exactly the midpoint world propagation (Estimator.cc:387-394): with
    R_k = R_0 dR_k the world midpoint acceleration is R_0 * (body midpoint)
    + g_vec, and the constant g_vec integrates analytically (the
    cross-terms telescope to 0.5 g T^2). Replaces a second sequential IMU
    scan in the per-sweep step.
    """
    t = pre.sum_dt
    q = quat.normalize(quat.qmul(q0, pre.delta_q))
    v = v0 + g_vec * t + quat.rotate(q0, pre.delta_v)
    p = p0 + v0 * t + 0.5 * g_vec * t * t + quat.rotate(q0, pre.delta_p)
    return q, p, v


def evaluate(
    pre: Preintegration,
    g_vec: jnp.ndarray,
    p_i, q_i, v_i, ba_i, bg_i,
    p_j, q_j, v_j, ba_j, bg_j,
) -> jnp.ndarray:
    """15-dim preintegration residual (IntegrationBase.h:309-357)."""
    dp_dba = pre.jacobian[O_P:O_P + 3, O_BA:O_BA + 3]
    dp_dbg = pre.jacobian[O_P:O_P + 3, O_BG:O_BG + 3]
    dq_dbg = pre.jacobian[O_R:O_R + 3, O_BG:O_BG + 3]
    dv_dba = pre.jacobian[O_V:O_V + 3, O_BA:O_BA + 3]
    dv_dbg = pre.jacobian[O_V:O_V + 3, O_BG:O_BG + 3]

    dba = ba_i - pre.linearized_ba
    dbg = bg_i - pre.linearized_bg

    corrected_delta_q = quat.qmul(pre.delta_q, quat.delta_q(dq_dbg @ dbg))
    corrected_delta_v = pre.delta_v + dv_dba @ dba + dv_dbg @ dbg
    corrected_delta_p = pre.delta_p + dp_dba @ dba + dp_dbg @ dbg

    qi_inv = quat.conjugate(quat.normalize(q_i))
    sum_dt = pre.sum_dt

    r_p = quat.rotate(qi_inv, -0.5 * g_vec * sum_dt * sum_dt + p_j - p_i - v_i * sum_dt) - corrected_delta_p
    r_q = 2.0 * quat.qmul(quat.conjugate(quat.normalize(corrected_delta_q)),
                          quat.qmul(qi_inv, quat.normalize(q_j)))[1:4]
    r_v = quat.rotate(qi_inv, -g_vec * sum_dt + v_j - v_i) - corrected_delta_v
    r_ba = ba_j - ba_i
    r_bg = bg_j - bg_i
    return jnp.concatenate([r_p, r_q, r_v, r_ba, r_bg])
