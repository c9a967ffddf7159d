"""Full LIO pipeline orchestration (host side).

The reference runs its stages as ROS nodes + threads (estimator_node.cc);
here a thin host loop feeds jitted device programs:

    raw sweep --process_sweep--> features --odometry_step--> laser odom
        --(NOT_INITED: fill window, ImuInitializer)--> INITED
        --lio_step--> tightly-coupled window odometry

During NOT_INITED the estimator mirrors Estimator::ProcessLaserOdom's
bootstrap path (Estimator.cc:492-618): every ``init_window_factor``-th
frame is pushed with its scan-to-scan odometry pose and preintegration;
once the window is full, extrinsic rotation calibration + ImuInitializer
run, states are aligned to gravity with yaw zeroed (:905-947), and
preintegrations are repropagated with the estimated gyro bias.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LioConfig
from ..ops import preintegration as PI
from ..ops import voxel as VX
from ..ops.cloud import Cloud
from ..utils import quaternion as quat
from ..utils.se3 import Pose
from . import estimator as EST
from . import initializer as INIT
from . import mapping as MAP
from . import odometry as ODO
from .point_processor import StartOriTracker, process_sweep, raw_start_ori


def _feats_from_xyzw(xyzw, start_ori, cfg):
    """Packed (N,4|5) cloud -> features. Column 4 (present iff
    ``cfg.sensor.uneven``) carries the per-point ring annotation — the
    reference's PointXYZIR mode (processor_node.cc:68-74) rides the same
    single H2D transfer as the points."""
    ring_ids = xyzw[:, 4].astype(jnp.int32) if cfg.sensor.uneven else None
    return process_sweep(xyzw[:, 0:3], xyzw[:, 3] > 0.5, cfg, start_ori,
                         ring_ids)


class PrefetchedCloud:
    """A sweep whose packed (N,4) cloud is already in flight to the device.

    Produced by :meth:`LioPipeline.prefetch_cloud`; pass to
    :meth:`LioPipeline.process` in place of ``(xyz, mask)``. On a tunneled
    accelerator, transferring the cloud while the PREVIOUS step is still
    in flight hides the host->device round trip entirely (measured 3-5 ms
    per consumed sweep); transferring it at dispatch time serializes with
    the queue.
    """

    __slots__ = ("xyzw", "raw_ori")

    def __init__(self, xyzw, raw_ori):
        self.xyzw = xyzw          # committed (N, 4) device array
        self.raw_ori = raw_ori    # host float from raw_start_ori, or None


class LioPipeline:
    """Sweep-by-sweep LIO: feed (sweep, imu batch) pairs, get poses out.

    ``mesh``: optional 1-D ``jax.sharding.Mesh`` — the per-sweep estimator
    program runs DISTRIBUTED over it (parallel/lio_dist: association rows
    rank-sliced, normal equations psum-reduced), with the host loop and
    every output unchanged. ``map_shard`` additionally shards the local
    map (ppermute-ring association).
    """

    def __init__(self, cfg: LioConfig, dtype=jnp.float32, mesh=None,
                 map_shard: bool = False, ingest_shard: bool = False,
                 host_predict: bool = False):
        self.cfg = cfg
        self.dtype = dtype
        self.mesh = mesh
        # sharded ingest (SURVEY §7 phase 9): each process/device transfers
        # only its row slice of the packed cloud; the program all_gathers
        # over ICI/DCN (far cheaper than every host pushing the full sweep)
        self.ingest_shard = bool(ingest_shard) and mesh is not None
        self._multiproc = mesh is not None and jax.process_count() > 1
        # host-side IMU prediction for skipped-cadence sweeps: the
        # /predict_laser_odom pose is ~50 midpoint steps of scalar math.
        # Computing it on host removes the predict program (and its
        # executable switch) from the device queue entirely — but reading
        # the last consumed step's state BLOCKS on that step, exposing the
        # tunnel round trip. Measured on the attached chip: a LATENCY
        # DISASTER for the no-readback streaming loop (bench: 114 -> 37
        # f/s), a pure win for consumers that read every pose back anyway
        # (the CLI host loop — the snap is already on host by the time the
        # skipped sweep arrives). Default OFF; cli.run turns it on.
        # Device fallback: mesh mode, or before the first consumed step.
        self.host_predict = bool(host_predict) and mesh is None
        self._snap = None  # device refs of the last consumed step's state
        self.odom_state = ODO.init_state(cfg, dtype)
        self.est_state = EST.init_state(cfg, dtype)
        self.stage = "NOT_INITED"
        self.frame_count = 0

        # io_ratio cadence (PointOdometry.cc:725-729 / `odom_io` yaml): the
        # estimator consumes clouds every io_ratio-th sweep; skipped
        # sweeps' IMU accumulates into the next consumed interval
        self._io_ratio = max(1, cfg.estimator.odom_io)
        self._pending: List[np.ndarray] = []  # packed IMU since last consume
        self._compact_count = 0  # consumed (compact) frames seen

        # init-window accumulation (host lists)
        self._init_odom_poses: List[Pose] = []
        self._init_samples: List[PI.ImuSamples] = []
        self._init_stacks: List[tuple] = []

        self._start_ori_tracker = (
            StartOriTracker(cfg.sensor.rad_diff)
            if cfg.sensor.infer_start_ori else None)
        e = cfg.estimator
        self._noise18 = PI.noise_matrix(
            e.imu.acc_n, e.imu.gyr_n, e.imu.acc_w, e.imu.gyr_w, dtype)

        # ONE executable per sweep: the front end (ring projection +
        # feature extraction) is fused INTO the same jitted program as the
        # downstream stage. Dispatching two different executables per sweep
        # costs ~4.6 ms each on a tunneled TPU (measured: executable switch
        # overhead, independent of any data dependency) — fusing them makes
        # the per-sweep path a single program dispatch.
        def front_odo(ostate, xyzw, start_ori, enabled):
            feats = _feats_from_xyzw(xyzw, start_ori, cfg)
            new_state, odo_out = ODO.odometry_step(ostate, feats, cfg, enabled)
            return new_state, odo_out

        self._front_odo = jax.jit(front_odo)

        def front_lio_body(est_state, xyzw, start_ori, packed, axis=None):
            feats = _feats_from_xyzw(xyzw, start_ori, cfg)
            samples = PI.unpack_samples(packed.astype(dtype))
            corner = feats.corner_less_sharp if cfg.estimator.use_corner else None
            new_state, out = EST.lio_step_impl(
                est_state, feats.surf_less_flat, samples, cfg, corner,
                axis=axis, map_shard=map_shard)
            out = dict(out)
            out["corner_cloud"] = feats.corner_less_sharp
            out["surf_cloud"] = feats.surf_less_flat
            return new_state, out

        if mesh is None:
            self._front_lio = jax.jit(front_lio_body)
        else:
            # the SAME single-executable per-sweep program, shard_map-ed
            # over the mesh: front end replicated (cheap), association +
            # solve + marginalization distributed (parallel/lio_dist)
            from jax.sharding import PartitionSpec as P

            from ..parallel import lio_dist

            lio_dist.check_caps(cfg, mesh.devices.size)
            if self.ingest_shard:
                # cloud arrives row-sharded; reassemble on-device (tiled
                # all_gather preserves row order) before the front end
                def body(est_state, xyzw, start_ori, packed):
                    xyzw = jax.lax.all_gather(
                        xyzw, lio_dist.AXIS, axis=0, tiled=True)
                    return front_lio_body(est_state, xyzw, start_ori,
                                          packed, axis=lio_dist.AXIS)

                in_specs = (P(), P(lio_dist.AXIS), P(), P())
            else:
                body = partial(front_lio_body, axis=lio_dist.AXIS)
                in_specs = (P(), P(), P(), P())
            fn = jax.shard_map(
                body, mesh=mesh, in_specs=in_specs,
                out_specs=(P(), P()), check_vma=False)
            self._front_lio = jax.jit(fn)

        # IMU-predicted pose for sweeps between estimator consumes (the
        # reference's /predict_laser_odom, Estimator.cc:744-758)
        w = cfg.estimator.window_size

        def predict(est_state, packed):
            samples = PI.unpack_samples(packed.astype(dtype))
            # mean-only: the published prediction never reads the bias
            # Jacobian / covariance, and the (M,15,15) scans cost ~2.4 ms
            # of device queue per skipped sweep
            pre = PI.integrate_mean(samples, est_state.bas[w],
                                    est_state.bgs[w])
            q, p, _ = PI.apply_deltas(
                pre, est_state.qs[w], est_state.ps[w], est_state.vs[w],
                est_state.g_vec)
            return EST.laser_pose(q, p, est_state.q_lb, est_state.t_lb)

        self._predict = jax.jit(predict)

    # ------------------------------------------------------------------
    def _merge_pending(self) -> np.ndarray:
        """Merge accumulated packed IMU buffers into one host buffer
        (device transfer happens at dispatch inside the jitted program)."""
        m = self.cfg.estimator.imu.max_imu_per_frame
        if not self._pending:
            return np.zeros((m + 1, 7), np.float32)
        if len(self._pending) == 1:
            return self._pending[0]
        return PI.merge_packed_np(self._pending, m)

    # ------------------------------------------------------------------
    def make_samples(self, dts, accs, gyrs, acc0, gyr0) -> np.ndarray:
        """Pack host IMU arrays into ONE padded (M+1, 7) HOST buffer.

        Kept on host until the consuming program dispatch (jit moves it in
        one transfer): reading a device array back per sweep would BLOCK
        on the single device queue behind the in-flight step and destroy
        the async pipeline (measured 60 -> 22 f/s on a tunneled v5e).
        """
        m = self.cfg.estimator.imu.max_imu_per_frame
        return PI.pack_samples_np(dts, accs, gyrs, acc0, gyr0, m)

    # ------------------------------------------------------------------
    @staticmethod
    def _host_predict_pose(snap: dict, packed: np.ndarray) -> Pose:
        """Numpy mirror of the device predict program (midpoint IMU
        propagation from the last consumed step's state + laser_pose,
        Estimator.cc:387-394 / :1391-1394). ``snap`` values may be device
        arrays (async copies already in flight) or numpy."""
        from scipy.spatial.transform import Rotation

        q = np.asarray(snap["q"], np.float64)
        p = np.asarray(snap["p"], np.float64)
        v = np.asarray(snap["v"], np.float64)
        ba = np.asarray(snap["ba"], np.float64)
        bg = np.asarray(snap["bg"], np.float64)
        g = np.asarray(snap["g"], np.float64)
        q_lb = np.asarray(snap["ex_q"], np.float64)
        t_lb = np.asarray(snap["ex_p"], np.float64)

        rot = Rotation.from_quat(np.roll(q, -1))
        acc_prev = np.asarray(packed[0, 1:4], np.float64)
        gyr_prev = np.asarray(packed[0, 4:7], np.float64)
        for k in range(1, packed.shape[0]):
            dt = float(packed[k, 0])
            if dt == 0.0:
                continue
            acc = np.asarray(packed[k, 1:4], np.float64)
            gyr = np.asarray(packed[k, 4:7], np.float64)
            un_acc0 = rot.apply(acc_prev - ba) + g
            un_gyr = 0.5 * (gyr_prev + gyr) - bg
            rot_new = rot * Rotation.from_rotvec(un_gyr * dt)
            un_acc = 0.5 * (un_acc0 + (rot_new.apply(acc - ba) + g))
            p = p + dt * v + 0.5 * dt * dt * un_acc
            v = v + dt * un_acc
            rot = rot_new
            acc_prev, gyr_prev = acc, gyr

        # laser pose: R_l = R_b R_lb^-1, p_l = p_b - R_l t_lb
        rot_l = rot * Rotation.from_quat(np.roll(q_lb, -1)).inv()
        p_l = p - rot_l.apply(t_lb)
        return Pose(np.roll(rot_l.as_quat(), 1).astype(np.float32),
                    p_l.astype(np.float32))

    def _update_snap(self, out: dict):
        """Cache the consumed step's state outputs for host prediction and
        start their D2H copies (they complete while the device moves on)."""
        snap = {"q": out["body_pose"].q, "p": out["body_pose"].t,
                "v": out["velocity"], "ba": out["ba"], "bg": out["bg"],
                "ex_q": out["ex_q"], "ex_p": out["ex_p"],
                "g": self.est_state.g_vec}
        for a in snap.values():
            try:
                a.copy_to_host_async()
            except AttributeError:
                pass
        self._snap = snap

    # ------------------------------------------------------------------
    def _is_compact(self, frame_count: int) -> bool:
        """io_ratio cadence: does the sweep numbered ``frame_count``
        (1-based, i.e. post-increment) consume its cloud? The single
        source of truth for the `odom_io` decimation
        (PointOdometry.cc:725-729) — used by both :meth:`process` and
        :meth:`will_consume`."""
        io = self._io_ratio
        return io < 2 or (frame_count % io == 1)

    def will_consume(self, offset: int = 1) -> bool:
        """Will the sweep ``offset`` calls from now consume its cloud?

        Deterministic from the io_ratio cadence: skipped sweeps on the
        INITED deskew path never transfer their cloud. Callers use this to
        decide whether :meth:`prefetch_cloud` is worth the transfer (a
        conservative ``True`` only costs one wasted H2D).
        """
        e = self.cfg.estimator
        if self.stage != "INITED" or not (e.enable_deskew or e.cutoff_deskew):
            return True
        return self._is_compact(self.frame_count + offset)

    def _check_ring(self, ring):
        """The uneven (ring-annotated) profile REQUIRES per-point rings —
        elevation binning is meaningless for unevenly-spaced lasers
        (processor_node.cc:68-74). Fail loudly instead of producing a
        silently wrong ring projection."""
        if self.cfg.sensor.uneven and ring is None:
            raise ValueError(
                "config has sensor.uneven=True (ring-annotated rig) but no "
                "per-point ring IDs were supplied — record the bag with the "
                "driver's `ring` PointField (convert-bag carries it into "
                "the .liol v2 log) or use an elevation-binned profile")

    def prefetch_cloud(self, xyz, mask, ring=None) -> PrefetchedCloud:
        """Start the H2D transfer of a FUTURE sweep's packed cloud now.

        Call right after dispatching the current sweep's :meth:`process`
        so the transfer rides the tunnel while the device is busy; pass
        the returned handle to :meth:`process` in place of ``(xyz, mask)``.
        """
        self._check_ring(ring)
        raw = (raw_start_ori(xyz, mask)
               if self._start_ori_tracker is not None else None)
        if self.dtype == jnp.float32 and isinstance(xyz, np.ndarray):
            buf = self._pack_xyzw_np(xyz, mask, ring)
            dev = self._commit_cloud(buf) if self.mesh is not None \
                else jax.device_put(buf)
        else:
            dev = self._pack_xyzw(xyz, mask, self.dtype, ring)
            if self.mesh is not None:
                dev = self._commit_cloud(np.asarray(dev))
        return PrefetchedCloud(dev, raw)

    def _commit_cloud(self, buf: np.ndarray):
        """Host (N, 4) packed cloud -> mesh-committed device array.

        Replicated by default; with ``ingest_shard`` the rows are sharded
        over the mesh axis (each process transfers only its slice —
        multihost.shard_rows semantics) and the program reassembles them
        with a tiled all_gather. Rows pad to a mesh-size multiple with
        mask 0 (a no-op through the masked front end)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel import lio_dist

        if not self.ingest_shard:
            if self._multiproc:
                from ..parallel import multihost as MH

                return MH.replicate(buf, self.mesh)
            return jax.device_put(buf, NamedSharding(self.mesh, P()))
        d = self.mesh.devices.size
        pad = (-buf.shape[0]) % d
        if pad:
            buf = np.concatenate(
                [buf, np.zeros((pad, buf.shape[1]), buf.dtype)], axis=0)
        if self._multiproc:
            from ..parallel import multihost as MH

            return MH.shard_rows(buf, self.mesh, lio_dist.AXIS)
        return jax.device_put(
            buf, NamedSharding(self.mesh, P(lio_dist.AXIS)))

    # ------------------------------------------------------------------
    @staticmethod
    def _pack_xyzw_np(xyz, mask, ring=None) -> np.ndarray:
        """Host (N,3)+(N,)[+(N,) ring] -> packed f32 (N,4|5) buffer."""
        w = 5 if ring is not None else 4
        out = np.empty((len(xyz), w), np.float32)
        out[:, 0:3] = xyz
        out[:, 3] = np.asarray(mask, np.float32)
        if ring is not None:
            out[:, 4] = np.asarray(ring, np.float32)
        return out

    @staticmethod
    def _pack_xyzw(xyz, mask, dtype, ring=None):
        """(N,3) points + (N,) mask [+ (N,) ring] -> one (N,4|5) array =
        one transfer (ring rides as a float column, col 4)."""
        if isinstance(xyz, np.ndarray):
            return jnp.asarray(
                LioPipeline._pack_xyzw_np(xyz, mask, ring), dtype)
        cols = [xyz.astype(dtype), mask.astype(dtype)[:, None]]
        if ring is not None:
            cols.append(jnp.asarray(ring).astype(dtype)[:, None])
        return jnp.concatenate(cols, axis=1)

    def process(self, xyz: np.ndarray, mask: np.ndarray,
                samples: Optional[jnp.ndarray],
                ring_ids: Optional[np.ndarray] = None) -> dict:
        """Process one sweep (+ its IMU interval). Returns pose outputs.

        ``samples`` is the packed (M+1, 7) buffer from :meth:`make_samples`.
        ``ring_ids`` is the optional (N,) per-point ring annotation
        (consumed only when ``cfg.sensor.uneven``; required then).

        The estimator consumes every ``io_ratio``-th sweep (`odom_io`
        yaml; PointOdometry publishes /compact_data at that cadence,
        PointOdometry.cc:725-729). Skipped sweeps' IMU accumulates into
        the next consumed preintegration interval (the reference's
        ``tmp_pre_integration_``), and their output pose is the
        IMU-propagated prediction (/predict_laser_odom).
        """
        cfg = self.cfg
        pf = None
        if isinstance(xyz, PrefetchedCloud):
            pf, xyz, mask = xyz, None, None
        else:
            self._check_ring(ring_ids)
        start_ori = None
        if self._start_ori_tracker is not None:
            raw = pf.raw_ori if pf is not None else raw_start_ori(xyz, mask)
            start_ori = jnp.asarray(
                self._start_ori_tracker.update(raw), self.dtype)
        self.frame_count += 1
        if samples is not None:
            # host np buffer from make_samples; tolerate device arrays from
            # direct callers (one readback — avoid in hot loops)
            self._pending.append(np.asarray(samples, np.float32))
        is_compact = self._is_compact(self.frame_count)
        if is_compact:
            self._compact_count += 1

        # once INITED with IMU deskew, the scan-to-scan stage is switched
        # off (the reference's /enable_odom call, Estimator.cc:551-559):
        # its pose is unused and clouds pass through raw — skip it entirely.
        deskew_mode = cfg.estimator.enable_deskew or cfg.estimator.cutoff_deskew
        if self.stage == "INITED" and deskew_mode:
            if not is_compact:
                # skipped sweep: its cloud is never consumed — do NOT pack
                # or transfer it (on a tunneled chip the H2D transfer of a
                # 64-beam sweep costs more than the whole estimator step)
                merged = self._merge_pending()
                if self.host_predict and self._snap is not None:
                    lp = self._host_predict_pose(self._snap, merged)
                else:
                    lp = self._predict(self.est_state, merged)
                return {"stage": self.stage, "laser_pose": lp,
                        "predicted": True}
            merged = self._merge_pending()
            self._pending = []
            if pf is not None:
                xyzw = pf.xyzw
            elif self.mesh is not None:
                np_dtype = np.dtype(jnp.zeros((), self.dtype).dtype)
                w = 5 if ring_ids is not None else 4
                buf = np.empty((len(xyz), w), np_dtype)
                buf[:, 0:3] = np.asarray(xyz)[:, 0:3]
                buf[:, 3] = np.asarray(mask, np_dtype)
                if ring_ids is not None:
                    buf[:, 4] = np.asarray(ring_ids, np_dtype)
                xyzw = self._commit_cloud(buf)
            else:
                xyzw = self._pack_xyzw(xyz, mask, self.dtype, ring_ids)
            if self._multiproc:
                from ..parallel import multihost as MH

                merged, start_ori = MH.replicate((merged, start_ori),
                                                 self.mesh) \
                    if start_ori is not None \
                    else (MH.replicate(merged, self.mesh), None)
            self.est_state, out = self._front_lio(
                self.est_state, xyzw, start_ori, merged)
            if self.host_predict:
                self._update_snap(out)
            out["stage"] = self.stage
            return out
        xyzw = (pf.xyzw if pf is not None
                else self._pack_xyzw(xyz, mask, self.dtype, ring_ids))

        self.odom_state, odo_out = self._front_odo(
            self.odom_state, xyzw, start_ori, jnp.asarray(True))

        if self.stage == "NOT_INITED":
            # line 437: every init_window_factor-th COMPACT frame is pushed
            # (laser_odom_recv_count_ counts received compact frames)
            if (samples is not None and is_compact
                    and self._compact_count % cfg.estimator.init_window_factor == 0):
                merged = self._merge_pending()
                self._pending = []
                self._push_init_frame(odo_out, PI.unpack_samples(merged))
                if len(self._init_odom_poses) == cfg.estimator.window_size + 1:
                    if self._try_initialize():
                        self.stage = "INITED"
                    else:
                        # slide: drop oldest init frame
                        self._init_odom_poses.pop(0)
                        self._init_samples.pop(0)
                        self._init_stacks.pop(0)
            # note: on the frame where initialization succeeds this returns
            # stage == "INITED" with the scan-to-scan pose (the estimator
            # first solves on the NEXT frame, Estimator.cc:614-618)
            return {
                "stage": self.stage,
                "laser_pose": odo_out["pose"],
                "corner_cloud": odo_out["corner_cloud"],
                "surf_cloud": odo_out["surf_cloud"],
            }

        # ---- INITED (no-deskew variant: clouds come from the odometry) ----
        if not is_compact:
            return {"stage": self.stage, "laser_pose": odo_out["pose"],
                    "predicted": True,
                    "corner_cloud": odo_out["corner_cloud"],
                    "surf_cloud": odo_out["surf_cloud"]}
        merged = self._merge_pending()
        self._pending = []
        self.est_state, out = EST.lio_step(
            self.est_state, odo_out["surf_cloud"],
            PI.unpack_samples(merged.astype(self.dtype)), cfg,
            odo_out["corner_cloud"] if cfg.estimator.use_corner else None)
        out["stage"] = self.stage
        out["corner_cloud"] = odo_out["corner_cloud"]
        out["surf_cloud"] = odo_out["surf_cloud"]
        return out

    # ------------------------------------------------------------------
    # checkpoint / resume (net-new vs. reference; SURVEY §5)
    def save(self, path: str):
        """Serialize the INITED device state to an npz checkpoint."""
        from ..io import checkpoint as CKPT

        meta = jnp.asarray(
            [1 if self.stage == "INITED" else 0, self.frame_count,
             self._compact_count], jnp.int32)
        CKPT.save_state(path, est=self.est_state, odom=self.odom_state,
                        meta=meta, pending=self._merge_pending())

    def load(self, path: str):
        """Resume from a checkpoint written by :meth:`save`."""
        from ..io import checkpoint as CKPT

        loaded = CKPT.load_state(
            path, est=self.est_state, odom=self.odom_state)
        self.est_state = loaded["est"]
        self.odom_state = loaded["odom"]
        # meta/pending are consumed host-side: read them straight from the
        # npz rather than uploading and reading back. On the tunneled TPU a
        # single D2H readback permanently degrades the process's dispatch
        # path (see README "device-queue discipline") — resume must stay
        # H2D-only so a resumed process streams at full rate.
        raw = np.load(path, allow_pickle=False)
        inited, count, compact = raw["meta.0"]
        self.stage = "INITED" if int(inited) else "NOT_INITED"
        self.frame_count = int(count)
        self._compact_count = int(compact)
        self._snap = None  # resumed state: fall back to device predict
        pending = np.asarray(raw["pending.0"], np.float32)
        self._pending = [pending] if (pending[1:, 0] > 0).any() else []

    # ------------------------------------------------------------------
    def _push_init_frame(self, odo_out, samples: PI.ImuSamples):
        cfg = self.cfg
        self._init_odom_poses.append(odo_out["pose"])
        self._init_samples.append(samples)
        surf: Cloud = odo_out["surf_cloud"]
        ds_xyz, ds_mask, _ = VX.voxel_downsample(
            surf.xyz, surf.mask, cfg.estimator.surf_filter_size,
            cfg.estimator.surf_stack_cap)
        if cfg.estimator.use_corner:
            corner: Cloud = odo_out["corner_cloud"]
            dc_xyz, dc_mask, _ = VX.voxel_downsample(
                corner.xyz, corner.mask, cfg.estimator.corner_filter_size,
                cfg.estimator.corner_stack_cap)
        else:
            dc_xyz = jnp.zeros((cfg.estimator.corner_state_cap, 3), self.dtype)
            dc_mask = jnp.zeros((cfg.estimator.corner_state_cap,), bool)
        self._init_stacks.append((ds_xyz, ds_mask, dc_xyz, dc_mask))

    def _try_initialize(self) -> bool:
        """EstimateExtrinsicRotation + ImuInitializer + state alignment."""
        cfg = self.cfg
        e = cfg.estimator
        w = e.window_size
        dtype = self.dtype

        # integrate each interval (except slot 0) for init quantities.
        # f64 when the host enabled x64 (tests); otherwise f32 — requesting
        # f64 without x64 just truncates with a warning per array.
        f_init = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
        pres = [PI.Preintegration.identity(f_init)]
        for i in range(1, w + 1):
            s64 = jax.tree.map(lambda a: a.astype(f_init), self._init_samples[i])
            pres.append(PI.integrate(
                s64, jnp.zeros(3, f_init), jnp.zeros(3, f_init),
                self._noise18.astype(f_init)))

        laser_q = np.stack([np.asarray(p.q, np.float64) for p in self._init_odom_poses])
        laser_p = np.stack([np.asarray(p.t, np.float64) for p in self._init_odom_poses])
        imu_dq = np.stack([np.asarray(pres[i].delta_q) for i in range(1, w + 1)])

        q_lb = np.asarray(self.est_state.q_lb, np.float64)
        t_lb = np.asarray(self.est_state.t_lb, np.float64)

        # extrinsic rotation calibration (estimate_extrinsic == 2)
        if e.estimate_extrinsic == 2:
            q_lb_new, ok = INIT.estimate_extrinsic_rotation(laser_q, imu_dq, q_lb)
            if not ok:
                return False
            q_lb = q_lb_new

        # IMU excitation gate
        delta_vs = np.stack([np.asarray(pres[i].delta_v) for i in range(1, w + 1)])
        sum_dts = np.array([float(pres[i].sum_dt) for i in range(1, w + 1)])
        if not INIT.check_imu_observibility(delta_vs, sum_dts):
            return False

        # gyro bias, then repropagate
        jacs = [np.asarray(pres[i].jacobian) for i in range(1, w + 1)]
        dqs = [np.asarray(pres[i].delta_q) for i in range(1, w + 1)]
        dbg = INIT.estimate_gyro_bias(laser_q, jacs, dqs)
        # physical-sanity gate (net-new vs reference, which accepts any
        # LDLT solution, ImuInitializer.cc:49-90): a MEMS gyro bias is
        # <0.02 rad/s — estimates far above it mean the window's laser
        # rotations are corrupt (e.g. cold-start scan-to-scan junk in a
        # degenerate corridor poisons the solve with ~0.9 rad/s). Refuse
        # and retry on a later window instead of booting a diverging
        # estimator (tests/test_hard_scenes.py corridor scene).
        if np.linalg.norm(dbg) > 0.2:
            return False
        bg = jnp.asarray(dbg, f_init)
        for i in range(1, w + 1):
            s64 = jax.tree.map(lambda a: a.astype(f_init), self._init_samples[i])
            pres[i] = PI.integrate(
                s64, jnp.zeros(3, f_init), bg, self._noise18.astype(f_init))

        delta_ps = np.stack([np.asarray(pres[i].delta_p) for i in range(1, w + 1)])
        delta_vs = np.stack([np.asarray(pres[i].delta_v) for i in range(1, w + 1)])

        g_approx, ok = INIT.approximate_gravity(
            laser_p, laser_q, q_lb, t_lb, sum_dts, delta_ps, delta_vs, e.imu.g_norm)
        if not ok:
            return False

        vels, g_refined, r_wi = INIT.refine_gravity_acc_bias(
            laser_p, laser_q, q_lb, t_lb, sum_dts, delta_ps, delta_vs,
            g_approx, e.imu.g_norm)

        # ---- state alignment (Estimator.cc:905-947) ----
        # body poses from laser transforms: T_bi = T_li * T_lb
        t_lb_pose = Pose(jnp.asarray(q_lb), jnp.asarray(t_lb))
        ps_b, qs_b = [], []
        for i in range(w + 1):
            t_bi = Pose(jnp.asarray(laser_q[i]), jnp.asarray(laser_p[i])) @ t_lb_pose
            qs_b.append(np.asarray(quat.normalize(t_bi.q)))
            ps_b.append(np.asarray(t_bi.t))
        qs_b = np.stack(qs_b)
        ps_b = np.stack(ps_b)

        # yaw-zeroed alignment rotation R0
        r0 = r_wi.T
        rs0 = np.asarray(quat.to_matrix(jnp.asarray(qs_b[0])))
        yaw = float(np.asarray(quat.rot_to_ypr(jnp.asarray(r0 @ rs0)))[0])
        r0 = np.asarray(quat.ypr_to_rot(jnp.asarray([-yaw, 0.0, 0.0]))) @ r0
        g_vec = r0 @ g_refined

        rot_diff = jnp.asarray(r0)
        q_diff = quat.from_matrix(rot_diff)

        qs_new = np.stack([
            np.asarray(quat.normalize(quat.qmul(q_diff, jnp.asarray(q)))) for q in qs_b])
        ps_new = (np.asarray(rot_diff) @ ps_b.T).T
        vs_new = (np.asarray(rot_diff) @ vels.T).T

        # ---- fill the estimator state ----
        m = e.imu.max_imu_per_frame
        samples_all = jax.tree.map(
            lambda *a: jnp.stack(a),
            *([jax.tree.map(lambda x: x.astype(dtype), s) for s in self._init_samples]))
        pres_f = jax.tree.map(
            lambda *a: jnp.stack(a).astype(dtype),
            *[jax.tree.map(lambda x: jnp.asarray(x), p) for p in pres])

        stacks_xyz = jnp.stack([s[0] for s in self._init_stacks]).astype(dtype)
        stacks_mask = jnp.stack([s[1] for s in self._init_stacks])
        c_stacks_xyz = jnp.stack([s[2] for s in self._init_stacks]).astype(dtype)
        c_stacks_mask = jnp.stack([s[3] for s in self._init_stacks])

        self.est_state = self.est_state._replace(
            qs=jnp.asarray(qs_new, dtype),
            ps=jnp.asarray(ps_new, dtype),
            qs_lin=jnp.asarray(qs_new, dtype),
            ps_lin=jnp.asarray(ps_new, dtype),
            corner_xyz=c_stacks_xyz,
            corner_mask=c_stacks_mask,
            vs=jnp.asarray(vs_new, dtype),
            bas=jnp.zeros((w + 1, 3), dtype),
            bgs=jnp.tile(jnp.asarray(dbg, dtype), (w + 1, 1)),
            pres=pres_f,
            imu=samples_all,
            surf_xyz=stacks_xyz,
            surf_mask=stacks_mask,
            g_vec=jnp.asarray(g_vec, dtype),
            q_lb=jnp.asarray(q_lb, dtype),
            t_lb=jnp.asarray(t_lb, dtype),
        )
        return True


class LoamPipeline:
    """LiDAR-only LOAM baseline: processor -> odometry -> scan-to-map.

    The reference's baseline launch graph (launch/16_scans_test.launch:7-9:
    processor_node + odometry_node + mapping_node, no IMU). Scan-to-map
    refinement runs every ``io_ratio``-th frame (odometry_node.cc:50,
    PointMapping decimation); in between, the published pose chains the
    scan-to-scan increment onto the last mapped pose exactly like
    TransformAssociateToMap (PointMapping.cc:755-758).
    """

    def __init__(self, cfg: LioConfig, dtype=jnp.float32):
        self.cfg = cfg
        self.dtype = dtype
        self.odom_state = ODO.init_state(cfg, dtype)
        self.map_state = MAP.init_state(cfg, dtype)
        self.frame_count = 0
        self._start_ori_tracker = (
            StartOriTracker(cfg.sensor.rad_diff)
            if cfg.sensor.infer_start_ori else None)

        # one executable per sweep (see LioPipeline.__init__): on the
        # io_ratio-th frame the scan-to-map refinement fuses into the same
        # program as the front end + odometry; in between, the cheap
        # TransformAssociateToMap chain fuses instead.
        def front_map(ostate, mstate, xyzw, start_ori):
            feats = _feats_from_xyzw(xyzw, start_ori, cfg)
            new_odo, odo_out = ODO.odometry_step(ostate, feats, cfg, jnp.asarray(True))
            new_map, m_out = MAP.mapping_step(
                mstate, odo_out["corner_cloud"], odo_out["surf_cloud"],
                odo_out["pose"], cfg)
            return new_odo, new_map, m_out["pose"], odo_out["pose"]

        def front_assoc(ostate, mstate, xyzw, start_ori):
            feats = _feats_from_xyzw(xyzw, start_ori, cfg)
            new_odo, odo_out = ODO.odometry_step(ostate, feats, cfg, jnp.asarray(True))
            pose = (mstate.pose @ (mstate.pose_bef.inverse() @ odo_out["pose"])).normalized()
            return new_odo, pose, odo_out["pose"]

        self._front_map = jax.jit(front_map)
        self._front_assoc = jax.jit(front_assoc)

    def process(self, xyz: np.ndarray, mask: np.ndarray,
                ring_ids: np.ndarray | None = None) -> dict:
        cfg = self.cfg
        if cfg.sensor.uneven and ring_ids is None:
            raise ValueError(
                "sensor.uneven=True requires per-point ring_ids "
                "(see LioPipeline._check_ring)")
        start_ori = None
        if self._start_ori_tracker is not None:
            start_ori = jnp.asarray(
                self._start_ori_tracker.update(raw_start_ori(xyz, mask)),
                self.dtype)
        xyzw = LioPipeline._pack_xyzw(xyz, mask, self.dtype, ring_ids)
        self.frame_count += 1

        if self.frame_count % cfg.odometry.io_ratio == 0:
            self.odom_state, self.map_state, pose, odom_pose = self._front_map(
                self.odom_state, self.map_state, xyzw, start_ori)
        else:
            self.odom_state, pose, odom_pose = self._front_assoc(
                self.odom_state, self.map_state, xyzw, start_ori)
        return {"stage": "LOAM", "laser_pose": pose,
                "odom_pose": odom_pose}

    def save(self, path: str):
        from ..io import checkpoint as CKPT

        CKPT.save_state(path, odom=self.odom_state, map=self.map_state,
                        meta=jnp.asarray([self.frame_count], jnp.int32))

    def load(self, path: str):
        from ..io import checkpoint as CKPT

        loaded = CKPT.load_state(
            path, odom=self.odom_state, map=self.map_state,
            meta=jnp.zeros(1, jnp.int32))
        self.odom_state = loaded["odom"]
        self.map_state = loaded["map"]
        self.frame_count = int(np.asarray(loaded["meta"])[0])
