"""Tests for ring projection, voxel downsampling and LOAM feature extraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lio_mapping_tpu.config import FeatureConfig, SensorConfig
from lio_mapping_tpu.io import synthetic
from lio_mapping_tpu.ops import features as F
from lio_mapping_tpu.ops import ring as R
from lio_mapping_tpu.ops import voxel as V
from lio_mapping_tpu.ops.cloud import Cloud, compact_cloud


@pytest.fixture(scope="module")
def sweep():
    traj = synthetic.Trajectory()
    xyz, mask = synthetic.simulate_sweep(traj, 0.0, n_azimuth=720)
    return xyz, mask


@pytest.fixture(scope="module")
def ring_cloud(sweep):
    xyz, mask = sweep
    sensor = SensorConfig.vlp16()
    rc, _ = R.project_to_rings(
        jnp.asarray(xyz), jnp.asarray(mask),
        n_rings=sensor.n_rings,
        lower_bound_deg=sensor.lower_bound_deg,
        upper_bound_deg=sensor.upper_bound_deg,
        max_points_per_ring=sensor.max_points_per_ring,
        scan_period=sensor.scan_period,
    )
    return rc


class TestRingProjection:
    def test_ring_assignment_matches_elevation(self, ring_cloud):
        rc = ring_cloud
        xyz = np.asarray(rc.xyz)
        mask = np.asarray(rc.mask)
        for r in range(16):
            pts = xyz[r][mask[r]]
            if len(pts) == 0:
                continue
            ele = np.rad2deg(np.arctan2(pts[:, 2], np.linalg.norm(pts[:, :2], axis=-1)))
            expected = -15.0 + 2.0 * r
            np.testing.assert_allclose(ele, expected, atol=0.9)

    def test_counts_match_mask(self, ring_cloud):
        rc = ring_cloud
        np.testing.assert_array_equal(
            np.asarray(rc.count), np.asarray(rc.mask).sum(axis=1))

    def test_rel_time_monotone_within_ring(self, ring_cloud):
        rc = ring_cloud
        rt = np.asarray(rc.rel_time)
        mask = np.asarray(rc.mask)
        for r in range(16):
            t = rt[r][mask[r]]
            assert t.min() >= 0.0 and t.max() <= 0.1 + 1e-6
            # scan order preserved: times increase along the row
            assert np.all(np.diff(t) > -1e-6)

    def test_azimuth_order_preserved(self, sweep, ring_cloud):
        """Points in a ring keep firing order (stable binning)."""
        xyz, mask = sweep
        rc = ring_cloud
        r0 = np.asarray(rc.xyz[8][rc.mask[8]])
        azi = (2 * np.pi - np.arctan2(r0[:, 1], r0[:, 0])) % (2 * np.pi)
        azi_rel = (azi - azi[0]) % (2 * np.pi)
        assert np.all(np.diff(azi_rel) > -1e-3)


class TestVoxel:
    def test_centroids_and_counts(self, rng):
        pts = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
        leaf = 0.5
        out_xyz, out_mask, _ = V.voxel_downsample(jnp.asarray(pts), jnp.ones(500, bool), leaf, 1024)
        got = np.asarray(out_xyz)[np.asarray(out_mask)]
        # numpy reference
        keys = np.floor(pts / leaf).astype(np.int64)
        uniq, inv = np.unique(keys, axis=0, return_inverse=True)
        want = np.stack([pts[inv == i].mean(axis=0) for i in range(len(uniq))])
        assert got.shape[0] == want.shape[0]
        got_sorted = got[np.lexsort(got.T)]
        want_sorted = want[np.lexsort(want.T)]
        np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-5)

    def test_capacity_truncation(self, rng):
        pts = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
        out_xyz, out_mask, _ = V.voxel_downsample(jnp.asarray(pts), jnp.ones(500, bool), 0.1, 16)
        assert np.asarray(out_mask).sum() <= 16

    def test_masked_points_ignored(self, rng):
        pts = rng.uniform(-3, 3, size=(100, 3)).astype(np.float32)
        mask = np.zeros(100, bool)
        mask[:10] = True
        _, out_mask, _ = V.voxel_downsample(jnp.asarray(pts), jnp.asarray(mask), 0.01, 256)
        assert np.asarray(out_mask).sum() == 10


class TestCompact:
    def test_compact_preserves_order(self, rng):
        xyz = rng.normal(size=(20, 3)).astype(np.float32)
        mask = rng.random(20) > 0.5
        c = Cloud.from_xyz(jnp.asarray(xyz), mask=jnp.asarray(mask))
        out = compact_cloud(c, 16)
        want = xyz[mask][:16]
        got = np.asarray(out.xyz)[np.asarray(out.mask)]
        np.testing.assert_allclose(got, want, atol=0)


class TestFeatures:
    @pytest.fixture(scope="class")
    def feats(self):
        # static sensor: geometry assertions need an unskewed sweep
        traj = synthetic.Trajectory(
            pos_amp=np.zeros(3), yaw_amp=0.0, pitch_amp=0.0, roll_amp=0.0)
        xyz, mask = synthetic.simulate_sweep(traj, 0.0, n_azimuth=720)
        sensor = SensorConfig.vlp16()
        rc, _ = R.project_to_rings(
            jnp.asarray(xyz), jnp.asarray(mask),
            n_rings=sensor.n_rings,
            lower_bound_deg=sensor.lower_bound_deg,
            upper_bound_deg=sensor.upper_bound_deg,
            max_points_per_ring=sensor.max_points_per_ring,
            scan_period=sensor.scan_period,
        )
        cfg = FeatureConfig()
        start_ori = jnp.asarray(0.0, dtype=jnp.float32)
        extract = jax.jit(
            lambda rc: F.extract_features(rc, start_ori, cfg, sensor))
        return extract(rc)

    def test_counts_reasonable(self, feats):
        ns, nl, nf, nlf = (int(c.count()) for c in feats)
        # 16 rings x 8 subregions with caps 2/20/4
        assert 16 <= ns <= 16 * 8 * 2
        assert ns <= nl <= 16 * 8 * 20
        assert 32 <= nf <= 16 * 8 * 4
        assert nlf > 500

    def test_sharp_subset_of_less_sharp(self, feats):
        sharp = np.asarray(feats.corner_sharp.xyz)[np.asarray(feats.corner_sharp.mask)]
        less = np.asarray(feats.corner_less_sharp.xyz)[np.asarray(feats.corner_less_sharp.mask)]
        less_set = {tuple(p) for p in np.round(less, 5)}
        for p in np.round(sharp, 5):
            assert tuple(p) in less_set

    def test_corners_near_edges(self, feats):
        """In the box world, sharp corners should lie near vertical edges
        (wall-wall or pillar edges), i.e., near known x/y edge lines."""
        room, obstacles = synthetic.default_world()
        edges = []
        for b in [room] + obstacles:
            for x in b.bounds[:, 0]:
                for y in b.bounds[:, 1]:
                    edges.append((x, y))
        edges = np.array(edges)
        sharp = np.asarray(feats.corner_sharp.xyz)[np.asarray(feats.corner_sharp.mask)]
        d = np.min(
            np.linalg.norm(sharp[:, None, :2] - edges[None, :, :], axis=-1), axis=1)
        # sensor at origin-ish; most corners on edges (allow a few strays from
        # occlusion boundaries)
        assert np.median(d) < 0.25

    def test_flats_on_planes(self, feats):
        """Flat points must lie on one of the world planes."""
        room, obstacles = synthetic.default_world()
        planes = []
        for b in [room] + obstacles:
            planes += list(b.bounds[:, 0]) + list(b.bounds[:, 1]) + list(b.bounds[:, 2])
        flat = np.asarray(feats.surf_flat.xyz)[np.asarray(feats.surf_flat.mask)]
        # distance to nearest axis-aligned plane value in each coordinate
        dx = np.min(np.abs(flat[:, None, 0] - np.array(planes)[None]), axis=1)
        dy = np.min(np.abs(flat[:, None, 1] - np.array(planes)[None]), axis=1)
        dz = np.min(np.abs(flat[:, None, 2] - np.array(planes)[None]), axis=1)
        d = np.minimum(np.minimum(dx, dy), dz)
        assert np.quantile(d, 0.9) < 0.05

    def test_curvature_matches_direct_loop(self, ring_cloud):
        rc = ring_cloud
        r = 8
        xyz = np.asarray(rc.xyz[r], dtype=np.float64)
        n = int(rc.count[r])
        got = np.asarray(F._curvature(jnp.asarray(rc.xyz[r]), 5))
        for i in [7, 50, n - 7]:
            diff = -10.0 * xyz[i]
            for j in range(1, 6):
                diff = diff + xyz[i + j] + xyz[i - j]
            want = float(diff @ diff)
            np.testing.assert_allclose(got[i], want, rtol=2e-3)


class TestStartOriTracker:
    """infer_start_ori mode (PointProcessor.cc:348-389)."""

    def _smooth_seq(self, n, start=0.1, step=0.02):
        return [start + step * i for i in range(n)]

    def test_passthrough_before_buffer_full(self):
        from lio_mapping_tpu.models.point_processor import StartOriTracker

        tr = StartOriTracker(rad_diff=0.2)
        for v in self._smooth_seq(9):
            assert tr.update(v) == v

    def test_outlier_replaced_by_extrapolation(self):
        from lio_mapping_tpu.models.point_processor import StartOriTracker

        tr = StartOriTracker(rad_diff=0.2)
        seq = self._smooth_seq(10)
        for v in seq:
            tr.update(v)
        # raw jumps by 1.5 rad; inferred continues at the buffered rate.
        # the jump also breaks the raw-stream consistency gate, so no reset.
        out = tr.update(seq[-1] + 1.5)
        expect = seq[-1] + 0.02
        assert abs(out - expect) < 1e-9

    def test_consistent_raw_stream_resets(self):
        from lio_mapping_tpu.models.point_processor import StartOriTracker

        tr = StartOriTracker(rad_diff=0.2)
        for v in self._smooth_seq(10):
            tr.update(v)
        # next raw value follows the same rate -> within rad_diff anyway,
        # and the consistency gate keeps tracking raw exactly
        out = tr.update(0.1 + 0.02 * 10)
        assert out == 0.1 + 0.02 * 10

    def test_override_reaches_rel_time(self, sweep):
        import jax.numpy as jnp

        from lio_mapping_tpu.config import LioConfig
        from lio_mapping_tpu.models.point_processor import process_sweep

        xyz, mask = sweep
        cfg = LioConfig.indoor()
        f0 = process_sweep(jnp.asarray(xyz, jnp.float32), jnp.asarray(mask), cfg)
        f1 = process_sweep(jnp.asarray(xyz, jnp.float32), jnp.asarray(mask), cfg,
                           jnp.asarray(1.234, jnp.float32))
        m = np.asarray(f1.surf_less_flat.mask)
        assert m.any()
        # shifting start_ori changes the recomputed relative times
        assert not np.allclose(
            np.asarray(f0.surf_less_flat.rel_time)[m],
            np.asarray(f1.surf_less_flat.rel_time)[m])


class TestUnevenRings:
    """sensor_type 320: per-point ring annotation (processor_node.cc:72-74)."""

    def test_ring_ids_respected(self, sweep):
        xyz, mask = sweep
        n = xyz.shape[0]
        rng = np.random.default_rng(3)
        ring_ids = rng.integers(0, 32, size=n).astype(np.int32)
        rc, _ = R.project_to_rings(
            jnp.asarray(xyz, jnp.float32), jnp.asarray(mask),
            n_rings=32, lower_bound_deg=-25.0, upper_bound_deg=15.0,
            max_points_per_ring=2304, scan_period=0.1,
            ring_ids=jnp.asarray(ring_ids))
        # every assigned point must be in the annotated ring: reconstruct
        # per-ring membership by matching coordinates
        got = np.asarray(rc.xyz)
        msk = np.asarray(rc.mask)
        for r in [0, 7, 31]:
            pts_r = got[r][msk[r]]
            want = xyz[mask & (ring_ids == r)]
            assert pts_r.shape[0] == min(want.shape[0], 2304)
            # scan order within the ring is preserved
            np.testing.assert_allclose(
                pts_r, want[: pts_r.shape[0]].astype(np.float32), rtol=1e-6)

    def test_process_sweep_uneven_profile(self, sweep):
        import dataclasses

        from lio_mapping_tpu.config import LioConfig, SensorConfig
        from lio_mapping_tpu.models.point_processor import process_sweep

        xyz, mask = sweep
        cfg = dataclasses.replace(
            LioConfig.indoor(), sensor=SensorConfig.by_type(320))
        # derive consistent ring annotations from elevation so features
        # still make geometric sense
        el = np.degrees(np.arctan2(xyz[:, 2], np.linalg.norm(xyz[:, :2], axis=1)))
        ring_ids = np.clip(((el + 25.0) * (31 / 40.0) + 0.5).astype(np.int32), 0, 31)
        feats = process_sweep(
            jnp.asarray(xyz, jnp.float32), jnp.asarray(mask), cfg,
            None, jnp.asarray(ring_ids))
        assert bool(np.asarray(feats.surf_less_flat.mask).any())
