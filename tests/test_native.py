"""Native host-runtime tests (sequence log, voxel map archive, measurement queue)."""

import numpy as np
import pytest

native = pytest.importorskip("lio_mapping_tpu.native")


@pytest.fixture(scope="module")
def lib():
    try:
        native.build()
    except Exception as e:  # pragma: no cover - toolchain missing
        pytest.skip(f"native toolchain unavailable: {e}")
    return native


class TestSequenceLog:
    def test_roundtrip(self, lib, tmp_path, rng):
        path = str(tmp_path / "seq.liol")
        log = lib.SequenceLog(path, write=True)
        pts = rng.normal(size=(256, 3)).astype(np.float32)
        rel = np.linspace(0, 0.1, 256).astype(np.float32)
        log.write_imu(0.05, np.array([0.1, 0.2, 9.8]), np.array([0.0, 0.0, 0.1]))
        log.write_sweep(0.1, pts, rel)
        log.write_imu(0.15, np.ones(3), np.ones(3))
        log.close()

        items = list(lib.SequenceLog(path))
        assert [it[0] for it in items] == ["imu", "sweep", "imu"]
        np.testing.assert_allclose(items[1][2], pts)
        np.testing.assert_allclose(items[1][3], rel)
        np.testing.assert_allclose(items[0][2], [0.1, 0.2, 9.8], atol=1e-6)


    def test_ring_roundtrip(self, lib, tmp_path, rng):
        """v2 container: optional per-point ring channel (the reference's
        PointXYZIR annotation, point_types.h:37-44) round-trips; ringless
        sweeps in the same file stay ringless."""
        path = str(tmp_path / "ring.liol")
        log = lib.SequenceLog(path, write=True)
        pts = rng.normal(size=(64, 3)).astype(np.float32)
        ring = (np.arange(64) % 16).astype(np.uint16)
        log.write_sweep(0.1, pts, None, ring=ring)
        log.write_sweep(0.2, pts)
        log.close()

        items = list(lib.SequenceLog(path))
        assert [it[0] for it in items] == ["sweep", "sweep"]
        np.testing.assert_array_equal(items[0][4], ring)
        np.testing.assert_allclose(items[0][2], pts)
        assert items[1][4] is None

    def test_v1_backcompat(self, lib, tmp_path):
        """v1 .liol files (no per-sweep flags byte) still read."""
        import struct

        path = str(tmp_path / "v1.liol")
        pts = np.arange(12, dtype=np.float32).reshape(4, 3)
        buf = np.zeros((4, 4), np.float32)
        buf[:, :3] = pts
        with open(path, "wb") as f:
            f.write(b"LIOL")
            f.write(struct.pack("<I", 1))
            f.write(b"S")
            f.write(struct.pack("<d", 0.1))
            f.write(struct.pack("<I", 4))
            f.write(buf.tobytes())
            f.write(b"I")
            f.write(struct.pack("<d", 0.15))
            f.write(np.ones(3, np.float32).tobytes())
            f.write(np.zeros(3, np.float32).tobytes())
        items = list(lib.SequenceLog(path))
        assert [it[0] for it in items] == ["sweep", "imu"]
        np.testing.assert_allclose(items[0][2], pts)
        assert items[0][4] is None


class TestGlobalVoxelMap:
    def test_centroids(self, lib):
        m = lib.GlobalVoxelMap(1.0)
        pts = np.array([[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [5.0, 5.0, 5.0]], np.float32)
        m.insert(pts)
        assert len(m) == 2
        out = m.extract()
        out = out[np.argsort(out[:, 0])]
        np.testing.assert_allclose(out[0], [0.2, 0.2, 0.2], atol=1e-6)
        np.testing.assert_allclose(out[1], [5.0, 5.0, 5.0], atol=1e-6)

    def test_pcd_export(self, lib, tmp_path, rng):
        m = lib.GlobalVoxelMap(0.5)
        m.insert(rng.normal(size=(100, 3)).astype(np.float32))
        path = str(tmp_path / "map.pcd")
        m.save_pcd(path)
        header = open(path, "rb").read(200).decode("latin1")
        assert "PCD" in header and "DATA binary" in header


class TestMeasurementQueue:
    def test_pairing_rule(self, lib):
        """Pairs all IMU < stamp+delay plus one after (MeasurementManager.cc:54-108)."""
        q = lib.MeasurementQueue(msg_time_delay=0.05)
        for i in range(40):
            q.push_imu(i * 0.01, np.zeros(3), np.zeros(3))
        q.push_sweep(0.1, 1)
        got = q.next_pair()
        assert got is not None
        t, sid, imu_t, acc, gyr = got
        assert sid == 1
        # stamp + delay = 0.15; samples up to 0.15 plus one lookahead
        assert imu_t[-1] >= 0.15 - 1e-9
        assert imu_t[0] < 0.15
        assert len(imu_t) in (16, 17)

    def test_out_of_order_rejected(self, lib):
        q = lib.MeasurementQueue()
        assert q.push_imu(1.0, np.zeros(3), np.zeros(3))
        assert not q.push_imu(0.5, np.zeros(3), np.zeros(3))

    def test_incomplete_pair_waits(self, lib):
        q = lib.MeasurementQueue()
        q.push_sweep(1.0, 2)
        q.push_imu(0.5, np.zeros(3), np.zeros(3))
        assert q.next_pair() is None  # no IMU beyond the sweep stamp yet
