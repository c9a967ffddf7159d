"""Pallas KNN kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from lio_mapping_tpu.ops import knn as KNN


def brute_force(q, qm, db, dm, k):
    d = np.sum((q[:, None, :] - db[None, :, :]) ** 2, axis=-1)
    d[:, ~dm] = np.inf
    idx = np.argsort(d, axis=1)[:, :k]
    dist = np.take_along_axis(d, idx, axis=1)
    dist[~qm] = np.inf
    return dist, idx


class TestJnpKnn:
    def test_matches_brute_force(self, rng):
        q = rng.normal(size=(97, 3)).astype(np.float32)
        db = rng.normal(size=(513, 3)).astype(np.float32)
        qm = rng.random(97) > 0.1
        dm = rng.random(513) > 0.1
        want_d, want_i = brute_force(q, qm, db, dm, 5)
        got_d, got_i = KNN.knn(jnp.asarray(q), jnp.asarray(qm),
                               jnp.asarray(db), jnp.asarray(dm), k=5, tile=128)
        np.testing.assert_allclose(np.asarray(got_d)[qm], want_d[qm], atol=1e-4)
        # indices can differ on exact ties; verify via distances
        d_from_idx = np.sum((q[:, None] - db[np.asarray(got_i)]) ** 2, axis=-1)
        np.testing.assert_allclose(d_from_idx[qm], want_d[qm], atol=1e-4)


class TestPallasKnnInterpret:
    def test_matches_fallback(self, rng):
        from jax.experimental.pallas import tpu as pltpu
        from lio_mapping_tpu.ops.pallas import knn_kernel as PK

        q = rng.normal(size=(300, 3)).astype(np.float32) * 3
        db = rng.normal(size=(2500, 3)).astype(np.float32) * 3
        qm = np.ones(300, bool)
        dm = rng.random(2500) > 0.05

        ref_d, ref_i = KNN.knn(jnp.asarray(q), jnp.asarray(qm),
                               jnp.asarray(db), jnp.asarray(dm), k=5)

        with pltpu.force_tpu_interpret_mode():
            got_d, got_i = PK.knn_pallas(
                jnp.asarray(q), jnp.asarray(qm), jnp.asarray(db), jnp.asarray(dm), k=5)

        np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d), atol=1e-3)
        # verify indices by distance equivalence (tie-robust)
        d_from_idx = np.sum((q[:, None] - db[np.asarray(got_i)]) ** 2, axis=-1)
        np.testing.assert_allclose(d_from_idx, np.asarray(ref_d), atol=1e-3)


class TestPallasKnnPruned:
    def test_gated_exactness(self, rng):
        """AABB chunk pruning: rows whose true 5th-NN is within the gate
        must be bitwise-identical to the unpruned search; rows beyond the
        gate must still test beyond it."""
        from jax.experimental.pallas import tpu as pltpu
        from lio_mapping_tpu.ops.pallas import knn_kernel as PK

        gate = 1.0
        # clustered db so chunk AABBs actually prune
        centers = rng.normal(size=(8, 3)).astype(np.float32) * 20
        db = (centers[rng.integers(0, 8, 5000)]
              + rng.normal(size=(5000, 3)).astype(np.float32) * 0.5)
        order = np.argsort(db[:, 0], kind="stable")  # spatially coherent
        db = db[order].astype(np.float32)
        dm = rng.random(5000) > 0.05
        q = (centers[rng.integers(0, 8, 600)]
             + rng.normal(size=(600, 3)).astype(np.float32) * 0.7).astype(np.float32)
        qm = np.ones(600, bool)

        ref_d, ref_i = KNN.knn(jnp.asarray(q), jnp.asarray(qm),
                               jnp.asarray(db), jnp.asarray(dm), k=5)
        with pltpu.force_tpu_interpret_mode():
            got_d, got_i = PK.knn_pallas(
                jnp.asarray(q), jnp.asarray(qm), jnp.asarray(db),
                jnp.asarray(dm), k=5, prune_beyond=gate)

        ref_d, got_d = np.asarray(ref_d), np.asarray(got_d)
        within = ref_d[:, 4] < gate
        assert within.any() and (~within).any()
        np.testing.assert_allclose(got_d[within], ref_d[within], atol=1e-4)
        # gate decisions agree everywhere
        np.testing.assert_array_equal(got_d[:, 4] < gate, within)
        # pruned-path indices pick the same neighbors (tie-robust: compare
        # exact f64 distances of the chosen points)
        q64, db64 = q.astype(np.float64), db.astype(np.float64)
        d_got = np.sum((q64[:, None] - db64[np.asarray(got_i)]) ** 2, axis=-1)
        d_ref = np.sum((q64[:, None] - db64[np.asarray(ref_i)]) ** 2, axis=-1)
        np.testing.assert_allclose(d_got[within], d_ref[within], atol=1e-9)
