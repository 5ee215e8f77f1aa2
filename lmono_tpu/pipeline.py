"""Full-system pipeline: LiDAR odometry → fusion → loop closure → dense map.

This replaces the reference's four-OS-process ROS topic graph
(A-LOAM / monolio_estimator_node / monolio_loop_detection_node /
monolio_map_build_node, SURVEY §1) with one in-program dataflow: the "topics"
are function boundaries with explicit array schemas, the three worker
threads become jitted step functions invoked per frame, and the loop lane
runs at keyframe rate like the reference's SKIP_TIME-gated loop thread.

Two drive modes:

* `process(scan, image)` — interactive, one frame per call.  The front
  (odometry+tracking+fusion) is ONE device dispatch (`fused_step`); the
  loop lane dispatches asynchronously at keyframe rate and its result is
  reaped on a later frame, so detection/verification overlaps subsequent
  frames instead of blocking the frame loop — the same latency-hiding the
  reference gets from running the loop node as a separate OS process
  (`estimator_node.cc:59-66`, `loop_detection_node.cc:382`).
* `process_chunk(frames)` — offline/bench: the whole frame-rate dataflow
  (front + dense-map merge + loop-landmark extraction) compiles into one
  `lax.scan` program per chunk (`fused.system_chunk`); only the
  keyframe-rate loop lane stays host-driven, fed by the chunk outputs.

The pose-graph correction feeds back multiplicatively: fused poses are
emitted as  T_corrected = drift_correction ∘ T_fused  (the reference's
`loopCorrection` re-anchors the whole window the same way,
Estimator.cc:309-365).  Corrections take effect from the frame after the
reap (interactive) or the next chunk (chunked) — the reference's
loop-node→estimator ROS round trip has the same latency.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera import camera_from_config
from lmono_tpu.config import SystemConfig
from lmono_tpu.estimator import FusionEstimator, FeatureTracker
from lmono_tpu.lidar.odometry import LidarOdometry
from lmono_tpu.loop import (
    LoopDetector,
    PoseGraph,
    graph_add_loop,
    graph_add_node,
    graph_poses,
    optimize_posegraph,
)
from lmono_tpu.loop.landmarks import subsample_features, window_landmarks
from lmono_tpu.mapping import MapBuilder
from lmono_tpu.utils.lie import Pose
from lmono_tpu.utils.timing import StageTimer


# kf-sharded pose-graph crossover: node count where the sharded optimizer
# starts winning (SCALING.json posegraph_size_sweep, 8-dev virtual mesh)
DIST_POSEGRAPH_CROSSOVER = 16384


class SlamSystem:
    """End-to-end SLAM engine over (scan, image) frame streams.

    With `ParallelConfig.kf_shards × map_shards > 1` the engine runs
    distributed over a (kf, map) device mesh: the odometry voxel banks and
    dense colored map shard over the space axis, the fusion window's
    landmark rows and the pose graph over the kf axis — same host API, same
    trajectory (`tests/test_dist_engine.py` asserts end-to-end parity)."""

    def __init__(self, cfg: SystemConfig, enable_loop: bool = True,
                 enable_mapping: bool = True, fused_front: bool = False):
        """fused_front=True compiles odometry+tracking+fusion into ONE
        device program dispatched once per frame (vs three) — worth a full
        host→device round-trip per frame on remote-attached devices.  The
        program is literally `fused.fused_step`, the same function
        `FusedPipeline`/`process_chunk` scan over frames, so the per-frame
        and chunked paths share one key schedule and one math path (only
        XLA fusion boundaries, ~1 ulp, can differ).  The distributed-parity
        tests keep the per-lane path (their voxel-bank checks are bitwise).

        fused_front is incompatible with a device mesh (kf_shards ×
        map_shards > 1): the sharded engine re-lays the per-lane programs.
        """
        self.cfg = cfg
        self.cam = camera_from_config(cfg.camera)
        T_CL = None
        if cfg.laser_to_camera is not None:
            m = jnp.asarray(np.array(cfg.laser_to_camera).reshape(4, 4),
                            jnp.float32)
            T_CL = Pose.from_mat4(m)
        pc = cfg.parallel
        self.mesh = None
        if pc.kf_shards * pc.map_shards > 1:
            if fused_front:
                raise ValueError(
                    "fused_front=True is unsupported with a device mesh "
                    "(kf_shards*map_shards > 1): the sharded engine re-lays "
                    "the per-lane programs over the mesh instead")
            from lmono_tpu.parallel.dist_engine import (
                check_divisible, make_engine_mesh)
            self.mesh = make_engine_mesh(pc.kf_shards, pc.map_shards)
            check_divisible(cfg, pc.kf_shards, pc.map_shards)
        self.lidar = LidarOdometry(cfg.lidar)
        self.tracker = FeatureTracker(self.cam, cfg.tracker,
                                      cfg.camera.height, cfg.camera.width)
        self.estimator = FusionEstimator(
            cfg.estimator, T_CL, n_tracks=cfg.tracker.max_features)
        self.loop: Optional[LoopDetector] = (
            LoopDetector(cfg.loop, (cfg.camera.height, cfg.camera.width),
                         lidar_cfg=cfg.lidar)
            if enable_loop else None)
        # the pose graph starts SMALL and doubles on demand: its matrix-free
        # GN+CG costs O(capacity) per step regardless of active nodes, so a
        # 4096-capacity graph would pay 8x while only a few hundred
        # keyframes exist (the dominant loop-lane cost at KITTI scale).
        # Every capacity (start and grown) is rounded UP to a multiple of
        # kf_shards so the sharded pose-graph optimizer can split the node
        # axis (db_capacity itself is validated divisible above).
        ks = max(1, pc.kf_shards)
        self._graph_cap = min(-(-min(512, cfg.loop.db_capacity) // ks) * ks,
                              cfg.loop.db_capacity)
        self.graph = (PoseGraph.empty(self._graph_cap)
                      if enable_loop else None)
        self.mapper: Optional[MapBuilder] = (
            MapBuilder(self.cam, cfg.mapping, mesh=self.mesh)
            if enable_mapping else None)
        if self.mesh is not None:
            # re-lay the hot lanes over the mesh (same signatures/state API)
            from lmono_tpu.parallel.dist_engine import (
                estimator_specs,
                make_dist_fusion_step,
                make_dist_odometry_scan,
                make_dist_odometry_step,
                odometry_specs,
                put_sharded,
            )
            from lmono_tpu.parallel.dist_posegraph import (
                make_sharded_posegraph_opt)
            self.lidar._step = make_dist_odometry_step(self.mesh, cfg.lidar)
            self.lidar._scan = make_dist_odometry_scan(self.mesh, cfg.lidar)
            self.lidar.state = put_sharded(self.mesh, self.lidar.state,
                                           odometry_specs())
            self.estimator._step = make_dist_fusion_step(self.mesh,
                                                         cfg.estimator)
            self.estimator.state = put_sharded(self.mesh,
                                               self.estimator.state,
                                               estimator_specs())
            if enable_loop:
                # measured crossover (SCALING.json posegraph_size_sweep:
                # 8-dev partition efficiency 0.21 at N=2048, 0.50 at 8192,
                # ≥1.0 only from 16384): below it the kf-sharded GN+CG's
                # 3 latency-bound collectives per CG step cost more than
                # the O(N) local work they split, so small graphs run the
                # single-device optimizer replicated — the same fallback
                # the window solver applies (DIST_WINDOW_CROSSOVER).
                self._opt_graph_sharded = make_sharded_posegraph_opt(
                    self.mesh, iters=cfg.loop.posegraph_iters, cg_iters=50,
                    four_dof=cfg.loop.posegraph_4dof, axis="kf")
                self._opt_graph_plain = jax.jit(
                    lambda g: optimize_posegraph(
                        g, iters=cfg.loop.posegraph_iters,
                        four_dof=cfg.loop.posegraph_4dof))
                self._opt_graph = lambda g: self._choose_posegraph_opt(g)(g)
            else:
                self._opt_graph = None
            if enable_loop and pc.kf_shards > 1:
                # shard the loop detector's keyframe DB over the kf axis
                # (VERDICT r4 #5): score matmul + row storage partition by
                # DB slot; verification stays replicated in-program
                from lmono_tpu.parallel.dist_loop import (
                    make_dist_process_fused, put_db_sharded)
                self.loop._process_fused = make_dist_process_fused(
                    self.mesh, self.loop, cfg.loop, axis="kf")
                self.loop.db = put_db_sharded(self.mesh, self.loop.db,
                                              axis="kf")
        else:
            self._opt_graph = (jax.jit(lambda g: optimize_posegraph(
                g, iters=cfg.loop.posegraph_iters,
                four_dof=cfg.loop.posegraph_4dof)) if enable_loop else None)

        from lmono_tpu.fused import FusedState, fused_step, system_chunk
        self._FusedState = FusedState
        self._fkey = jax.random.PRNGKey(7)
        self._front = None
        if fused_front and self.mesh is None:
            # no donation: freshly-init states share zero-filled buffers
            # via constant pooling, which trips the double-donation check
            self._front = jax.jit(lambda s, fr: fused_step(
                s, fr, self.cam, cfg, with_features=enable_loop))
        self._enable_loop = enable_loop
        self._enable_map = enable_mapping
        self._chunk = None
        if self.mesh is None:
            self._chunk = jax.jit(lambda s, cm, fr, ct, cq: system_chunk(
                s, cm, fr, Pose(ct, cq), self.cam, cfg,
                enable_mapping, enable_loop))

        Kw = cfg.loop.window_points

        def _extract(w, sp, sv, corr_t, corr_q):
            lm = window_landmarks(w, self.cam, cfg.mapping, Kw,
                                  scan_points=sp, scan_valid=sv)
            # 3D points are built in the estimator frame; shift to the
            # loop-corrected world on-device (one dispatch)
            return lm._replace(pts_w=Pose(corr_t, corr_q).apply(lm.pts_w))

        self._extract_landmarks = jax.jit(_extract)

        # jitted wrappers for the keyframe-rate host lane: on a
        # remote-attached device every EAGER jnp op is its own tunnel
        # round-trip, so the ~15-op graph_add_node etc. must each be ONE
        # dispatch (measured: the eager path cost ~hundreds of ms per
        # keyframe through the tunnel)
        self._jit_add_node = jax.jit(graph_add_node)
        self._jit_add_loop = jax.jit(graph_add_loop,
                                     static_argnames=("weight",))
        _KF_KEYS = ("ccam_t", "ccam_q", "cam_t", "cam_q", "ex_t", "ex_q",
                    "lm_pts", "lm_norm", "lm_uv", "lm_sel", "lm_pnp",
                    "loop_edge", "loop_edge_mask", "loop_planar",
                    "loop_planar_mask")
        self._kf_keys = _KF_KEYS
        self._jit_gather_kf = jax.jit(
            lambda outs, img, i: tuple(
                [outs[k][i] for k in _KF_KEYS] + [img[i]]))

        def drop_bad(g, gate_m):
            from lmono_tpu.utils.lie import quat_rotate_inv
            opt = graph_poses(g)
            dt_est = quat_rotate_inv(opt.q[g.loop_i],
                                     g.t[g.loop_j] - g.t[g.loop_i])
            err = jnp.linalg.norm(dt_est - g.loop_dt, axis=-1)
            bad = g.loop_mask & (err > gate_m)
            return g._replace(loop_mask=g.loop_mask & ~bad), jnp.sum(bad)

        self._jit_drop_bad = jax.jit(drop_bad)
        self._jit_graph_last = jax.jit(
            lambda g, last: (lambda p: (p.t[last], p.q[last]))(
                graph_poses(g)))

        self.correction = Pose.identity()   # drift fix from the pose graph
        self.timer = StageTimer()
        self.frame_idx = 0
        self.n_loops = 0
        # history for retro-corrected trajectory export
        self._raw_poses: list = []      # fused laser pose per frame (uncorrected)
        self._node_frames: list = []    # frame index of each pose-graph node
        self._node_raw_cam: list = []   # uncorrected cam pose per node
        self._n_nodes = 0               # host mirror of pose-graph node count
        self._pending: list = []        # dispatched, un-reaped loop detections
        # push-based stream front (MeasurementManager parity): scans and
        # images arrive on independent clocks and are paired by timestamp
        from lmono_tpu.io.sync import MeasurementSync
        self.sync = MeasurementSync(delay_time=cfg.estimator.delay_time)

    # ------------------------------------------------------------------
    def _choose_posegraph_opt(self, g):
        """Mesh mode: sharded optimizer only past the measured crossover
        (see DIST_POSEGRAPH_CROSSOVER); small graphs run replicated."""
        if g.t.shape[0] >= DIST_POSEGRAPH_CROSSOVER:
            return self._opt_graph_sharded
        return self._opt_graph_plain

    # ------------------------------------------------------------------
    # Push-based streaming front (replaces the reference's ROS-topic intake:
    # `MeasurementManager::GetMeasurements` pairing, MeasurementManager.cc:
    # 69-110).  Scans and images may arrive out of order, duplicated, or
    # dropped; `process_pending` drains every currently pairable frame.
    def push_image(self, t: float, image) -> None:
        self.sync.push_image(t, image)

    def push_scan(self, t: float, scan: dict) -> None:
        """scan = {points, ranges, valid} — the laser stream (the reference
        consumes A-LOAM's odometry topic; here odometry is computed in-lane
        from the paired scan)."""
        self.sync.push_odometry(t, scan)

    def process_pending(self) -> list:
        """Pair queued streams by timestamp and run `process` on each pair
        (in time order).  Returns the list of per-frame output dicts."""
        outs = []
        for t_img, image, scan in self.sync.get_measurements():
            outs.append(self.process(scan, image, time=t_img))
        return outs

    # ------------------------------------------------------------------
    def process(self, scan: dict, image, time: Optional[float] = None) -> dict:
        """One frame: scan = {points, ranges, valid}; image (H, W) in [0,1].

        Returns dict with fused pose (loop-corrected), extrinsic, stats.
        `loop` reports detections APPLIED this frame (detections dispatch
        asynchronously at the keyframe and are reaped on a later frame).
        """
        time = self.frame_idx * 0.1 if time is None else time
        applied = self._reap_loops()

        if self._front is not None:
            # single-dispatch composed front lane (fused_step)
            with self.timer.stage("front"):
                fst = self._FusedState(self.lidar.state, self.tracker.state,
                                       self.estimator.state, self._fkey)
                fst2, res = self._front(fst, {**scan, "image": image})
                (self.lidar.state, self.tracker.state,
                 self.estimator.state, self._fkey) = fst2
            lidar_feats = res.get("features")
        else:
            with self.timer.stage("lidar"):
                lo = self.lidar.process(scan)

            # same key schedule as fused_step: split(key,3) → (carry,
            # tracker, estimator) — all drive modes trace identical draws
            self._fkey, k1, k2 = jax.random.split(self._fkey, 3)
            with self.timer.stage("track"):
                track = self.tracker.process(image, key=k1)

            with self.timer.stage("fuse"):
                out = self.estimator.process(track, Pose(lo["pose"].t,
                                                         lo["pose"].q),
                                             key=k2)
            res = {
                "pose_t": out.pose.t, "pose_q": out.pose.q,
                "cam_t": out.cam_pose.t, "cam_q": out.cam_pose.q,
                "ex_t": out.extrinsic.t, "ex_q": out.extrinsic.q,
                "is_keyframe": out.is_keyframe,
                "initialized": out.initialized,
                "n_tracked": out.n_tracked,
            }
            lidar_feats = lo.get("features")

        fused = Pose(res["pose_t"], res["pose_q"])
        cam_pose = Pose(res["cam_t"], res["cam_q"])
        corrected = self.correction.compose(fused)
        self._raw_poses.append(fused)

        # one host transfer for both lane-gating flags (each bool() would
        # otherwise cost its own device->host round-trip per frame)
        kf_flag, init_flag = (bool(v) for v in jax.device_get(
            (res["is_keyframe"], res["initialized"])))

        if self.loop is not None and kf_flag and init_flag:
            with self.timer.stage("loop"):
                self._loop_lane(scan, image, cam_pose,
                                Pose(res["ex_t"], res["ex_q"]), time,
                                lidar_feats)

        if self.mapper is not None and init_flag:
            with self.timer.stage("map"):
                T_CL = Pose(res["ex_t"], res["ex_q"])
                self.mapper.process(
                    scan["points"].reshape(-1, 3),
                    scan["valid"].reshape(-1),
                    image, T_CL,
                    self.correction.compose(cam_pose))

        self.frame_idx += 1
        return {
            "pose": corrected,
            "pose_raw": fused,
            "cam_pose": self.correction.compose(cam_pose),
            "extrinsic": Pose(res["ex_t"], res["ex_q"]),
            "is_keyframe": kf_flag,
            "initialized": init_flag,
            "loop": applied > 0,
            "n_tracked": int(res["n_tracked"]),
        }

    # ------------------------------------------------------------------
    def process_chunk(self, frames: dict, t0: Optional[float] = None,
                      dt: float = 0.1) -> dict:
        """Offline/bench drive: frames is a pytree with leading (F,) axis
        ({points, ranges, valid, image}).  The front, dense-map merge and
        loop-landmark extraction run as ONE device program
        (`fused.system_chunk`); the keyframe-rate loop lane dispatches
        asynchronously per keyframe afterwards.  Returns the per-frame
        output arrays (leading (F,) axis)."""
        if self._chunk is None:
            raise ValueError("process_chunk requires mesh-less config")
        t0 = self.frame_idx * dt if t0 is None else t0
        applied = self._reap_loops()   # correction current before dispatch

        from lmono_tpu.mapping.builder import ColorMap
        cmap = self.mapper.map if self.mapper is not None \
            else ColorMap.empty(8)
        with self.timer.stage("chunk"):
            fst = self._FusedState(self.lidar.state, self.tracker.state,
                                   self.estimator.state, self._fkey)
            fst2, cmap2, outs = self._chunk(fst, cmap, frames,
                                            self.correction.t,
                                            self.correction.q)
            (self.lidar.state, self.tracker.state,
             self.estimator.state, self._fkey) = fst2
        fill = outs.pop("map_fill", None)
        F = int(np.shape(outs["pose_t"])[0])
        if self.mapper is not None:
            self.mapper.absorb_chunk(cmap2, F)

        for i in range(F):
            self._raw_poses.append(Pose(outs["pose_t"][i],
                                        outs["pose_q"][i]))
        if self.loop is not None:
            with self.timer.stage("loop"):
                # ONE device_get covers the lane flags AND the map
                # occupancy — a separate occupancy sync measurably stalled
                # the queued loop programs (6.6 vs 11 fps at kitti scale)
                kf, init, ccam_t, n_fill = jax.device_get(
                    (outs["is_keyframe"], outs["initialized"],
                     outs["ccam_t"],
                     fill if fill is not None else jnp.zeros(())))
                if self.mapper is not None and fill is not None:
                    self.mapper.flush_if_full(int(n_fill))
                for i in range(F):
                    if kf[i] and init[i]:
                        self._loop_lane_chunk(outs, frames, i,
                                              t0 + i * dt, ccam_t[i],
                                              self.frame_idx + i)
        elif self.mapper is not None and fill is not None:
            self.mapper.flush_if_full(int(jax.device_get(fill)))
        self.frame_idx += F
        outs["loops_applied"] = applied
        return outs

    # ------------------------------------------------------------------
    def _loop_lane(self, scan, image, cam_pose: Pose, extrinsic: Pose,
                   time: float, lidar_feats=None) -> None:
        """Keyframe lane (interactive): extract landmarks, dispatch the
        fused detect+add program asynchronously, queue the result for a
        later reap."""
        w = self.estimator.state.window
        lm = self._extract_landmarks(w, scan["points"], scan["valid"],
                                     self.correction.t, self.correction.q)
        corr_pose = self.correction.compose(cam_pose)
        pts_w = lm.pts_w

        lidar_pack = None
        if lidar_feats is not None:
            le, lem = subsample_features(lidar_feats.edge_points,
                                         lidar_feats.edge_mask,
                                         self.cfg.loop.kf_edge_points)
            lp, lpm = subsample_features(lidar_feats.planar_points,
                                         lidar_feats.planar_mask,
                                         self.cfg.loop.kf_planar_points)
            lidar_pack = (le, lem, lp, lpm)

        res = self.loop.process_keyframe(
            image, self.cam, lm.uv, lm.norm, pts_w, lm.sel,
            corr_pose, time, win_pnp_mask=lm.sel_pnp,
            lidar_features=lidar_pack, extrinsic=extrinsic,
            defer_note=True)
        if res is None:
            return
        self._add_node(corr_pose, cam_pose, res, time)

    def _loop_lane_chunk(self, outs, frames, i: int, time: float,
                         pos_np, frame_idx: int) -> None:
        """Keyframe lane fed by `system_chunk` per-frame outputs (landmarks
        and LiDAR features were extracted on-device inside the chunk).
        All per-keyframe slices come from ONE jitted gather dispatch."""
        (ccam_t, ccam_q, cam_t, cam_q, ex_t, ex_q, lm_pts, lm_norm, lm_uv,
         lm_sel, lm_pnp, le, lem, lp, lpm, image) = self._jit_gather_kf(
            {k: outs[k] for k in self._kf_keys}, frames["image"],
            np.int32(i))
        corr_pose = Pose(ccam_t, ccam_q)
        res = self.loop.process_keyframe(
            image, self.cam, lm_uv, lm_norm, lm_pts, lm_sel,
            corr_pose, time, win_pnp_mask=lm_pnp,
            lidar_features=(le, lem, lp, lpm),
            extrinsic=Pose(ex_t, ex_q),
            defer_note=True, pos=pos_np)
        if res is None:
            return
        self._add_node(corr_pose, Pose(cam_t, cam_q), res, time, frame_idx)

    def _add_node(self, corr_pose: Pose, raw_cam: Pose, res, time: float,
                  frame_idx: Optional[int] = None) -> None:
        """Every processed keyframe becomes a pose-graph node; the detection
        result is queued for asynchronous reaping."""
        node_idx = self._n_nodes
        self._n_nodes += 1
        if (self._n_nodes >= self._graph_cap - 2
                and self._graph_cap < self.cfg.loop.db_capacity):
            self._grow_graph()
        self.graph = self._jit_add_node(self.graph, corr_pose)
        self._node_frames.append(self.frame_idx if frame_idx is None
                                 else frame_idx)
        # store the UNcorrected camera pose: final_trajectory computes the
        # raw-world → optimized-world transform per segment from it
        self._node_raw_cam.append(raw_cam)
        self._pending.append(
            {"res": res, "node_idx": node_idx, "node_pose": corr_pose,
             "time": time})

    # ------------------------------------------------------------------
    def _grow_graph(self) -> None:
        """Double the pose-graph node capacity, padding the node-axis
        arrays (loop-edge arrays are capacity-independent).  The jitted
        optimizers retrace once per size — log2(total/512) times over a
        whole run."""
        old = self.graph
        ks = max(1, self.cfg.parallel.kf_shards)
        new_cap = min(-(-self._graph_cap * 2 // ks) * ks,
                      self.cfg.loop.db_capacity)
        fresh = PoseGraph.empty(new_cap,
                                max_loops=old.loop_mask.shape[0])
        c = self._graph_cap
        self.graph = fresh._replace(
            t=fresh.t.at[:c].set(old.t),
            ypr=fresh.ypr.at[:c].set(old.ypr),
            node_mask=fresh.node_mask.at[:c].set(old.node_mask),
            seq_dt=fresh.seq_dt.at[:c].set(old.seq_dt),
            seq_dyaw=fresh.seq_dyaw.at[:c].set(old.seq_dyaw),
            seq_dq=fresh.seq_dq.at[:c].set(old.seq_dq),
            seq_mask=fresh.seq_mask.at[:c].set(old.seq_mask),
            loop_i=old.loop_i, loop_j=old.loop_j, loop_dt=old.loop_dt,
            loop_dyaw=old.loop_dyaw, loop_dq=old.loop_dq,
            loop_mask=old.loop_mask, loop_w=old.loop_w,
            n_nodes=old.n_nodes, n_loops=old.n_loops)
        self._graph_cap = new_cap

    # ------------------------------------------------------------------
    # loop-edge weights relative to sequential odometry edges: closures
    # whose relative pose survived LiDAR GN refinement are cm-grade and
    # anchor hard; PnP-only closures are dm-grade and must not out-shout a
    # low-drift odometry chain (CPU-baseline measurement: weight-5 PnP
    # edges DEGRADED system ATE 0.14 → 1.87 m on the synthetic circuit)
    LOOP_W_REFINED = 5.0
    LOOP_W_PNP = 1.5

    def _reap_loops(self) -> int:
        """Collect finished loop detections (dispatched on earlier frames),
        apply graph edges, optimize ONCE, and re-anchor the drift
        correction at the latest node.  Returns #loops applied.

        By the time this runs, the detection programs have executed behind
        subsequent front dispatches — the host sync here is a reap, not a
        stall (the overlap the reference buys with a separate loop-node
        process).

        The correction re-anchors through the LAST pose-graph node, not the
        closure node: subsequent frames chain off the most recent keyframe,
        so anchoring there keeps the next sequential edge free of any
        correction jump (the optimizer has already distributed the closure
        along the chain)."""
        if not self._pending:
            return 0
        applied = 0
        # ONE batched device->host transfer for every pending detection
        # (per-pending device_gets each cost a tunnel round-trip)
        with self.timer.stage("reap_fetch"):
            fetched = jax.device_get([
                (p["res"].found, p["res"].old_seq, p["res"].rel_t,
                 p["res"].rel_q, p["res"].refined) for p in self._pending])
        # SKIP_LOOP_* parity across the pending window: detections dispatch
        # before earlier results are known, so several keyframes at one
        # revisit can all come back found.  Apply the suppression gates here
        # in time order — the reference's loop node (one keyframe in flight)
        # would have skipped the later ones before ever processing them
        # (loop_detection_node.cc:211,242).
        skip_t = self.cfg.loop.skip_loop_time
        skip_d = self.cfg.loop.skip_loop_dis
        for p, (found, old_seq, rel_t, rel_q, refined) in zip(
                self._pending, fetched):
            if not bool(found):
                continue
            pos = np.asarray(p["node_pose"].t)
            if p["time"] - self.loop._last_loop_time < skip_t:
                continue
            if (self.loop._last_loop_pos is not None and skip_d > 0
                    and np.linalg.norm(pos - self.loop._last_loop_pos)
                    < skip_d):
                continue
            self.n_loops += 1
            applied += 1
            self.loop.note_loop(p["time"], pos)
            # numpy scalars/arrays ride in the dispatch; eager jnp wrappers
            # each cost a ~15 ms tunnel round-trip per reaped loop
            rel = Pose(np.asarray(rel_t), np.asarray(rel_q))
            self.graph = self._jit_add_loop(
                self.graph, np.int32(int(old_seq)),
                np.int32(p["node_idx"]), rel,
                weight=(self.LOOP_W_REFINED if bool(refined)
                        else self.LOOP_W_PNP))
        self._pending = []
        if applied:
            with self.timer.stage("reap_opt"):
                self.graph = self._opt_graph(self.graph)
                # hard-reject loop edges that the optimum still contradicts
                # by >0.5 m: the IRLS kernel already down-weights them, but
                # a rejected edge must also stop counting as a closure and
                # stop exerting its residual Geman-McClure pull (a
                # verification false-accept, not a noisy measurement)
                self.graph, n_bad = self._jit_drop_bad(self.graph,
                                                       np.float32(0.5))
                if int(n_bad):
                    self.graph = self._opt_graph(self.graph)
            last = self._n_nodes - 1
            t_l, q_l = self._jit_graph_last(self.graph, np.int32(last))
            # correction = optimized-world from raw-estimator-world at the
            # newest node (algebraically opt ∘ raw_cam⁻¹; the previous
            # incremental composition reduced to the same thing)
            self.correction = Pose(t_l, q_l).compose(
                self._node_raw_cam[last].inverse())
        return applied

    # ------------------------------------------------------------------
    def final_trajectory(self) -> Pose:
        """Retro-corrected full trajectory (laser frame, one pose per frame).

        The streaming output (`process()["pose"]`) applies each loop
        correction only from its closure onward — the already-emitted
        history keeps its drift, which is how the reference behaves too.
        For evaluation/mapping the optimized pose graph corrects the whole
        past: each frame is re-anchored through its most recent keyframe
        node's optimized pose.
        """
        from lmono_tpu.utils.lie import pose_stack

        self._reap_loops()
        if self.graph is None or not self._node_frames:
            return pose_stack(self._raw_poses)
        opt = graph_poses(self.graph)
        out = []
        node = 0
        cur_fix = Pose.identity()
        for i, raw in enumerate(self._raw_poses):
            while (node < len(self._node_frames)
                   and self._node_frames[node] <= i):
                opt_cam = Pose(opt.t[node], opt.q[node])
                raw_cam = self._node_raw_cam[node]
                cur_fix = opt_cam.compose(raw_cam.inverse())
                node += 1
            out.append(cur_fix.compose(raw))
        return pose_stack(out)

    # ------------------------------------------------------------------
    def save_map(self, path: str) -> int:
        if self.mapper is None:
            return 0
        return self.mapper.save_ply(path)

    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        """Serialize the full SLAM state (odometry map, window, tracker,
        keyframe DB, pose graph, drift correction) for resume/replay —
        the capability the reference lacks entirely (SURVEY §5)."""
        from lmono_tpu.utils.checkpoint import save_state

        self._reap_loops()
        state = {
            "lidar": self.lidar.state,
            "tracker": self.tracker.state,
            "estimator": self.estimator.state,
            "correction": self.correction,
            "fkey": self._fkey,
            "frame_idx": jnp.asarray(self.frame_idx),
            "n_loops": jnp.asarray(self.n_loops),
            "n_nodes": jnp.asarray(self._n_nodes),
        }
        if self.loop is not None:
            state["loop_db"] = self.loop.db
            state["graph"] = self.graph
        if self.mapper is not None:
            state["map"] = self.mapper.map
        # variable-length host-side history (extras bypass the template
        # shape check): the per-node raw camera poses are what _reap_loops
        # re-anchors the drift correction through and what
        # final_trajectory segments the past with — resuming without them
        # crashed on the first post-load closure
        extra = {}
        if self._raw_poses:
            extra["raw_t"] = np.stack(
                [np.asarray(p.t) for p in self._raw_poses])
            extra["raw_q"] = np.stack(
                [np.asarray(p.q) for p in self._raw_poses])
        if self.loop is not None and self._node_frames:
            extra["node_frames"] = np.asarray(self._node_frames, np.int64)
            extra["node_raw_t"] = np.stack(
                [np.asarray(p.t) for p in self._node_raw_cam])
            extra["node_raw_q"] = np.stack(
                [np.asarray(p.q) for p in self._node_raw_cam])
        save_state(path, state, extra=extra)

    def load_checkpoint(self, path: str) -> None:
        from lmono_tpu.utils.checkpoint import load_extras, load_state

        template = {
            "lidar": self.lidar.state,
            "tracker": self.tracker.state,
            "estimator": self.estimator.state,
            "correction": self.correction,
            "fkey": self._fkey,
            "frame_idx": jnp.asarray(self.frame_idx),
            "n_loops": jnp.asarray(self.n_loops),
            "n_nodes": jnp.asarray(self._n_nodes),
        }
        if self.loop is not None:
            template["loop_db"] = self.loop.db
            template["graph"] = self.graph
        if self.mapper is not None:
            template["map"] = self.mapper.map
        while True:
            try:
                state = load_state(path, template)
                break
            except ValueError as e:
                # the saved pose graph may have grown beyond this fresh
                # system's capacity — grow and retry (capacities are
                # powers of two, so this converges in a few doublings).
                # Only when EVERY mismatched leaf is a graph entry: an
                # unrelated shape mismatch (old DB layout, different vocab
                # dim) must surface immediately, not after futile growth.
                lines = str(e).split(": ", 1)[-1].split("; ")
                graph_only = all("'graph'" in m for m in lines)
                if (self.loop is None or not graph_only
                        or self._graph_cap >= self.cfg.loop.db_capacity):
                    raise
                self._grow_graph()
                template["graph"] = self.graph
        self.lidar.state = state["lidar"]
        self.tracker.state = state["tracker"]
        self.estimator.state = state["estimator"]
        self.correction = state["correction"]
        self._fkey = state["fkey"]
        self.frame_idx = int(state["frame_idx"])
        self.n_loops = int(state["n_loops"])
        self._n_nodes = int(state["n_nodes"])
        self._pending = []
        if self.loop is not None:
            self.loop.db = state["loop_db"]
            self.graph = state["graph"]
        if self.mapper is not None:
            self.mapper.map = state["map"]
        # restore variable-length history so post-resume closures re-anchor
        # correctly and final_trajectory spans the whole run
        extras = load_extras(path)
        self._raw_poses = (
            [Pose(jnp.asarray(t), jnp.asarray(q)) for t, q in
             zip(extras["raw_t"], extras["raw_q"])]
            if "raw_t" in extras else [])
        if "node_frames" in extras:
            self._node_frames = [int(f) for f in extras["node_frames"]]
            self._node_raw_cam = [
                Pose(jnp.asarray(t), jnp.asarray(q)) for t, q in
                zip(extras["node_raw_t"], extras["node_raw_q"])]
        else:
            self._node_frames = []
            self._node_raw_cam = []
