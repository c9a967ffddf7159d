"""Map-sharded ring-KNN equivalence (8-device virtual CPU mesh).

Net-new distributed capability (SURVEY §7 phase 9): the map lives sharded
across the mesh; the ring pass must reproduce the single-device exact KNN
over the concatenated map.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lio_mapping_tpu.ops import knn as KNN
from lio_mapping_tpu.parallel import map_sharded as MS
from lio_mapping_tpu.parallel import sharded_ba as SB


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
class TestRingKnn:
    def _run(self, q_n=256, m_n=2048, k=5, prune=None, seed=0):
        rng = np.random.default_rng(seed)
        n_dev = len(jax.devices())
        queries = jnp.asarray(rng.normal(size=(q_n, 3)) * 4.0)
        q_mask = jnp.asarray(rng.random(q_n) > 0.05)
        db = jnp.asarray(rng.normal(size=(m_n, 3)) * 4.0)
        db_mask = jnp.asarray(rng.random(m_n) > 0.1)

        mesh = SB.make_mesh()

        fn = shard_map(
            lambda q, qm, d, dm: MS.ring_knn(q, qm, d, dm, k=k,
                                             prune_beyond=prune),
            mesh=mesh,
            in_specs=(P(MS.AXIS), P(MS.AXIS), P(MS.AXIS), P(MS.AXIS)),
            out_specs=(P(MS.AXIS), P(MS.AXIS), P(MS.AXIS)),
            check_vma=False,
        )
        d_sh, i_sh, x_sh = jax.jit(fn)(queries, q_mask, db, db_mask)
        d_ref, i_ref = KNN.knn(queries, q_mask, db, db_mask, k=k)
        return (np.asarray(d_sh), np.asarray(i_sh), np.asarray(x_sh),
                np.asarray(d_ref), np.asarray(i_ref), np.asarray(db),
                np.asarray(q_mask))

    def test_matches_single_device(self):
        d_sh, i_sh, x_sh, d_ref, i_ref, db, q_mask = self._run()
        np.testing.assert_allclose(d_sh, d_ref, atol=1e-10)
        # indices may differ only where distances tie; check via distances
        # and that carried coordinates match the indexed db points
        finite = np.isfinite(d_sh)
        np.testing.assert_allclose(
            x_sh[finite], db[i_sh[finite]], atol=0)

    def test_with_prune_gate(self):
        gate = 1.0
        d_sh, i_sh, x_sh, d_ref, i_ref, db, q_mask = self._run(prune=gate)
        # exact wherever the true 5th neighbor is inside the gate; gate
        # tests d[:, k-1] < gate decided identically either way
        inside = d_ref[:, -1] < gate
        np.testing.assert_allclose(d_sh[inside], d_ref[inside], atol=1e-10)
        np.testing.assert_array_equal(d_sh[:, -1] < gate, d_ref[:, -1] < gate)

    def test_masked_all_invalid_block(self):
        # one device's whole block masked out must not poison results
        rng = np.random.default_rng(3)
        n_dev = len(jax.devices())
        m_n = 64 * n_dev
        queries = jnp.asarray(rng.normal(size=(8 * n_dev, 3)))
        q_mask = jnp.ones((8 * n_dev,), bool)
        db = jnp.asarray(rng.normal(size=(m_n, 3)))
        db_mask = np.ones((m_n,), bool)
        db_mask[:64] = False  # device 0's entire block invalid
        db_mask = jnp.asarray(db_mask)

        mesh = SB.make_mesh()
        fn = shard_map(
            lambda q, qm, d, dm: MS.ring_knn(q, qm, d, dm, k=5),
            mesh=mesh,
            in_specs=(P(MS.AXIS),) * 4,
            out_specs=(P(MS.AXIS),) * 3,
            check_vma=False,
        )
        d_sh, i_sh, _ = jax.jit(fn)(queries, q_mask, db, db_mask)
        d_ref, _ = KNN.knn(queries, q_mask, db, db_mask, k=5)
        np.testing.assert_allclose(np.asarray(d_sh), np.asarray(d_ref),
                                   atol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs a multi-device mesh")
def test_mapsharded_step_matches_replicated():
    """Full distributed window step: sharded map vs replicated map."""
    import dataclasses

    from jax.sharding import Mesh

    from lio_mapping_tpu.config import LioConfig
    from lio_mapping_tpu.ops import marginalization as MG
    from lio_mapping_tpu.ops import preintegration as PI
    from lio_mapping_tpu.ops import solver as SV
    from lio_mapping_tpu.parallel import distributed as DIST
    from lio_mapping_tpu.utils import quaternion as quat

    base = LioConfig.indoor()
    est = dataclasses.replace(
        base.estimator, window_size=5, opt_window_size=3,
        estimate_extrinsic=0, opt_extrinsic=False,
        extrinsic_translation=(0.0, 0.0, 0.0),
        surf_stack_cap=256, local_map_filtered_cap=1024,
        max_solver_iterations=4)
    cfg = dataclasses.replace(base, estimator=est)
    e = cfg.estimator
    s = e.opt_window_size
    dtype = jnp.float64

    n_dev = len(jax.devices())
    mesh = Mesh(np.array(jax.devices()), (DIST.AXIS,))
    rng = np.random.default_rng(5)
    f_total = 32 * n_dev
    map_n = 128 * n_dev

    x0 = SV.OptStates(
        q=jnp.tile(quat.identity(dtype), (s + 1, 1)),
        p=jnp.asarray(rng.normal(0, 0.05, (s + 1, 3)), dtype),
        sb=jnp.zeros((s + 1, 9), dtype),
        ex_q=quat.identity(dtype), ex_p=jnp.zeros(3, dtype))
    pres = jax.tree.map(
        lambda a: jnp.broadcast_to(a, (s,) + a.shape),
        PI.Preintegration.identity(dtype)._replace(
            covariance=jnp.eye(15, dtype=dtype) * 1e-4,
            sum_dt=jnp.asarray(0.1, dtype)))
    g_vec = jnp.asarray([0.0, 0.0, -9.805], dtype)
    map_xyz = jnp.asarray(rng.uniform(-5, 5, (map_n, 3)), dtype)
    map_mask = jnp.ones((map_n,), bool)
    stacks_xyz = jnp.asarray(rng.uniform(-5, 5, (s, f_total, 3)), dtype)
    stacks_mask = jnp.ones((s, f_total), bool)
    rel_q = jnp.tile(quat.identity(dtype), (s + 1, 1))
    rel_t = jnp.asarray(rng.normal(0, 0.05, (s + 1, 3)), dtype)
    prior = MG.PriorState.empty(s, dtype)

    step_rep = DIST.make_distributed_step(mesh, cfg)
    step_ms = DIST.make_distributed_step_mapsharded(mesh, cfg)
    args = (x0, pres, g_vec, map_xyz, map_mask, stacks_xyz, stacks_mask,
            rel_q, rel_t, prior)
    x_rep, prior_rep, cost_rep = step_rep(*args)
    x_ms, prior_ms, cost_ms = step_ms(*args)

    np.testing.assert_allclose(np.asarray(x_ms.p), np.asarray(x_rep.p),
                               atol=1e-8)
    np.testing.assert_allclose(float(cost_ms), float(cost_rep), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(prior_ms.lin_res),
                               np.asarray(prior_rep.lin_res), atol=1e-7)
