"""ctypes bindings for the native host runtime (liomap_native.cc).

The library is built on first use with g++ (no external deps) and cached in
the package directory. See src/liomap_native.cc for what each component
replaces in the reference.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SRC = _DIR / "src" / "liomap_native.cc"
_SO = _DIR / "liomap_native.so"

_lib = None


def build(force: bool = False) -> Path:
    """Compile the native library if needed; returns the .so path."""
    if _SO.exists() and not force and _SO.stat().st_mtime >= _SRC.stat().st_mtime:
        return _SO
    cmd = [
        "g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
        str(_SRC), "-o", str(_SO),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _SO


def lib() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        so = build()
        l = ctypes.CDLL(str(so))
        # signatures
        l.lio_log_open.restype = ctypes.c_void_p
        l.lio_log_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        l.lio_log_write_sweep.restype = ctypes.c_int
        l.lio_log_write_sweep.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.POINTER(ctypes.c_float), ctypes.c_uint32]
        l.lio_log_write_sweep2.restype = ctypes.c_int
        l.lio_log_write_sweep2.argtypes = [
            ctypes.c_void_p, ctypes.c_double, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_uint32]
        l.lio_log_write_imu.restype = ctypes.c_int
        l.lio_log_write_imu.argtypes = [
            ctypes.c_void_p, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        l.lio_log_next.restype = ctypes.c_int
        l.lio_log_next.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        l.lio_log_read_sweep_data.restype = ctypes.c_int
        l.lio_log_read_sweep_data.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint32]
        l.lio_log_sweep_has_ring.restype = ctypes.c_int
        l.lio_log_sweep_has_ring.argtypes = [ctypes.c_void_p]
        l.lio_log_read_sweep_ring.restype = ctypes.c_int
        l.lio_log_read_sweep_ring.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint16), ctypes.c_uint32]
        l.lio_log_close.argtypes = [ctypes.c_void_p]

        l.lio_map_create.restype = ctypes.c_void_p
        l.lio_map_create.argtypes = [ctypes.c_double]
        l.lio_map_insert.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint32]
        l.lio_map_size.restype = ctypes.c_uint64
        l.lio_map_size.argtypes = [ctypes.c_void_p]
        l.lio_map_extract.restype = ctypes.c_uint64
        l.lio_map_extract.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_uint64]
        l.lio_map_save_pcd.restype = ctypes.c_int
        l.lio_map_save_pcd.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        l.lio_map_free.argtypes = [ctypes.c_void_p]

        l.lio_mq_create.restype = ctypes.c_void_p
        l.lio_mq_create.argtypes = [ctypes.c_double]
        l.lio_mq_push_imu.restype = ctypes.c_int
        l.lio_mq_push_imu.argtypes = [
            ctypes.c_void_p, ctypes.c_double,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float)]
        l.lio_mq_push_sweep.restype = ctypes.c_int
        l.lio_mq_push_sweep.argtypes = [ctypes.c_void_p, ctypes.c_double, ctypes.c_int64]
        l.lio_mq_next_pair.restype = ctypes.c_int
        l.lio_mq_next_pair.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        l.lio_mq_free.argtypes = [ctypes.c_void_p]
        _lib = l
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class SequenceLog:
    """Binary sweep+IMU container (the rosbag replacement).

    Container v2 (liomap_native.cc) carries an optional per-point ring
    channel for ring-annotated rigs (the reference's PointXYZIR /
    sensor_type 320 mode, point_types.h:37-44); v1 files read fine.
    Iteration yields ("sweep", t, xyz, rel_time, ring_or_None) and
    ("imu", t, acc, gyr)."""

    def __init__(self, path: str, write: bool = False):
        self._l = lib()
        self._h = self._l.lio_log_open(path.encode(), 1 if write else 0)
        if not self._h:
            raise IOError(f"cannot open {path}")

    def write_sweep(self, t: float, xyz: np.ndarray,
                    rel_time: np.ndarray | None = None,
                    ring: np.ndarray | None = None):
        n = len(xyz)
        buf = np.zeros((n, 4), np.float32)
        buf[:, :3] = xyz
        if rel_time is not None:
            buf[:, 3] = rel_time
        buf = np.ascontiguousarray(buf)
        if ring is None:
            self._l.lio_log_write_sweep(self._h, float(t), _fptr(buf), n)
        else:
            r = np.ascontiguousarray(ring, np.uint16)
            assert len(r) == n, (len(r), n)
            self._l.lio_log_write_sweep2(
                self._h, float(t), _fptr(buf),
                r.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n)

    def write_imu(self, t: float, acc: np.ndarray, gyr: np.ndarray):
        a = np.ascontiguousarray(acc, np.float32)
        g = np.ascontiguousarray(gyr, np.float32)
        self._l.lio_log_write_imu(self._h, float(t), _fptr(a), _fptr(g))

    def __iter__(self):
        while True:
            t = ctypes.c_double()
            n = ctypes.c_uint32()
            acc = np.zeros(3, np.float32)
            gyr = np.zeros(3, np.float32)
            tag = self._l.lio_log_next(
                self._h, ctypes.byref(t), ctypes.byref(n), _fptr(acc), _fptr(gyr))
            if tag == 0:
                return
            if tag < 0:
                raise IOError("corrupt log")
            if tag == ord("S"):
                buf = np.zeros((n.value, 4), np.float32)
                self._l.lio_log_read_sweep_data(self._h, _fptr(buf), n.value)
                ring = None
                if self._l.lio_log_sweep_has_ring(self._h):
                    ring = np.zeros(n.value, np.uint16)
                    self._l.lio_log_read_sweep_ring(
                        self._h,
                        ring.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                        n.value)
                yield ("sweep", t.value, buf[:, :3].copy(), buf[:, 3].copy(),
                       ring)
            else:
                yield ("imu", t.value, acc, gyr)

    def close(self):
        if self._h:
            self._l.lio_log_close(self._h)
            self._h = None


class GlobalVoxelMap:
    """Unbounded host-side voxel-centroid map (full-map archive + export)."""

    def __init__(self, leaf: float = 0.4):
        self._l = lib()
        self._h = self._l.lio_map_create(leaf)

    def insert(self, xyz: np.ndarray):
        pts = np.ascontiguousarray(xyz, np.float32)
        self._l.lio_map_insert(self._h, _fptr(pts), len(pts))

    def __len__(self):
        return int(self._l.lio_map_size(self._h))

    def extract(self) -> np.ndarray:
        n = len(self)
        out = np.zeros((n, 3), np.float32)
        got = self._l.lio_map_extract(self._h, _fptr(out), n)
        return out[:got]

    def save_pcd(self, path: str):
        if self._l.lio_map_save_pcd(self._h, path.encode()) != 0:
            raise IOError(f"cannot write {path}")

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.lio_map_free(self._h)
            self._h = None


class MeasurementQueue:
    """Timestamp pairing of IMU + sweeps (MeasurementManager equivalent)."""

    def __init__(self, msg_time_delay: float = 0.0, max_imu_per_pair: int = 512):
        self._l = lib()
        self._h = self._l.lio_mq_create(msg_time_delay)
        self._cap = max_imu_per_pair

    def push_imu(self, t: float, acc, gyr) -> bool:
        a = np.ascontiguousarray(acc, np.float32)
        g = np.ascontiguousarray(gyr, np.float32)
        return self._l.lio_mq_push_imu(self._h, float(t), _fptr(a), _fptr(g)) == 0

    def push_sweep(self, t: float, sweep_id: int):
        self._l.lio_mq_push_sweep(self._h, float(t), sweep_id)

    def next_pair(self):
        """Returns (sweep_t, sweep_id, imu_t (n,), acc (n,3), gyr (n,3)) or None."""
        t = ctypes.c_double()
        sid = ctypes.c_int64()
        imu_t = np.zeros(self._cap, np.float64)
        acc = np.zeros((self._cap, 3), np.float32)
        gyr = np.zeros((self._cap, 3), np.float32)
        n = self._l.lio_mq_next_pair(
            self._h, ctypes.byref(t), ctypes.byref(sid),
            imu_t.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            _fptr(acc), _fptr(gyr), self._cap)
        if n < 0:
            return None
        return t.value, sid.value, imu_t[:n].copy(), acc[:n].copy(), gyr[:n].copy()

    def __del__(self):
        if getattr(self, "_h", None):
            self._l.lio_mq_free(self._h)
            self._h = None
