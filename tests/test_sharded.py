"""Distributed-BA equivalence tests (8-device virtual CPU mesh).

The reference has no distributed mode; the TPU build's net-new multi-chip
path must match the single-device solver (SURVEY §4: shard-vs-single-host
equivalence).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from lio_mapping_tpu.ops import marginalization as MG
from lio_mapping_tpu.ops import solver as SV
from lio_mapping_tpu.parallel import sharded_ba as SB

from tests.test_solver import _make_window_problem

G = 9.805


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
class TestShardedBA:
    def test_matches_single_device(self):
        s = 3
        x_gt, pres, planes = _make_window_problem(s=s, f=96, noise=0.01, seed=7)
        rng = np.random.default_rng(1)
        from lio_mapping_tpu.utils import quaternion as quat

        dq = jnp.asarray(rng.normal(0, 0.01, (s + 1, 3))).at[0].set(0.0)
        x0 = x_gt._replace(q=quat.normalize(quat.qmul(x_gt.q, quat.exp(dq))))
        prior = MG.PriorState.empty(s, jnp.float64)
        g_vec = jnp.asarray([0.0, 0.0, -G])

        x_ref, _ = SV.solve_window(
            x0, pres, g_vec, planes, prior, None,
            s=s, max_iterations=6,
            opt_extrinsic=jnp.asarray(False), use_marg=jnp.asarray(False))

        mesh = SB.make_mesh()
        n_dev = len(jax.devices())

        @jax.jit
        def run(x0, pres, planes, prior):
            fn = shard_map(
                lambda x0_, pres_, pl_, pr_: SB.solve_window_sharded(
                    x0_, pres_, g_vec, pl_, pr_, None,
                    s=s, max_iterations=6,
                    opt_extrinsic=jnp.asarray(False), use_marg=jnp.asarray(False)),
                mesh=mesh,
                in_specs=(P(), P(), P(None, SB.AXIS), P()),
                out_specs=P(),
                check_vma=False,
            )
            return fn(x0, pres, planes, prior)

        x_sh, cost_sh = run(x0, pres, planes, prior)

        np.testing.assert_allclose(np.asarray(x_sh.p), np.asarray(x_ref.p), atol=1e-6)
        dq_err = np.abs(np.sum(np.asarray(x_sh.q) * np.asarray(x_ref.q), axis=-1))
        np.testing.assert_allclose(dq_err, 1.0, atol=1e-9)
        np.testing.assert_allclose(np.asarray(x_sh.sb), np.asarray(x_ref.sb), atol=1e-6)
