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
def integrate(samples: ImuSamples, ba, bg, noise18) -> Preintegration:
    """Integrate a full buffer (Propagate loop / Repropagate)."""
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
