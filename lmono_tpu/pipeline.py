"""Full-system pipeline: LiDAR odometry → fusion → loop closure → dense map.

This replaces the reference's four-OS-process ROS topic graph
(A-LOAM / monolio_estimator_node / monolio_loop_detection_node /
monolio_map_build_node, SURVEY §1) with one in-program dataflow: the "topics"
are function boundaries with explicit array schemas, the three worker
threads become jitted step functions invoked per frame, and the loop lane
runs at keyframe rate like the reference's SKIP_TIME-gated loop thread.

The pose-graph correction feeds back multiplicatively: fused poses are
emitted as  T_corrected = drift_correction ∘ T_fused  (the reference's
`loopCorrection` re-anchors the whole window the same way,
Estimator.cc:309-365).
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
from lmono_tpu.mapping import MapBuilder
from lmono_tpu.utils.lie import Pose
from lmono_tpu.utils.timing import StageTimer


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
        math is the composition of the same three step functions; only XLA
        fusion boundaries (and hence float rounding at ~1 ulp) can differ,
        which is why the distributed-parity tests keep the per-lane path
        (their voxel-bank checks are bitwise)."""
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
        self.graph = PoseGraph.empty(cfg.loop.db_capacity) if enable_loop else None
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
            self._opt_graph = (make_sharded_posegraph_opt(
                self.mesh, iters=cfg.loop.posegraph_iters, cg_iters=50,
                four_dof=cfg.loop.posegraph_4dof, axis="kf")
                if enable_loop else None)
        else:
            self._opt_graph = (jax.jit(lambda g: optimize_posegraph(
                g, iters=cfg.loop.posegraph_iters,
                four_dof=cfg.loop.posegraph_4dof)) if enable_loop else None)

        self._front = None
        if fused_front and self.mesh is None:
            from lmono_tpu.estimator.estimator import fusion_step
            from lmono_tpu.estimator.tracker import tracker_step
            from lmono_tpu.lidar.odometry import odometry_step
            cam = self.cam

            def front(odo_st, trk_st, est_st, tkey, ekey, scan, image):
                odo2, lo = odometry_step(odo_st, scan, cfg.lidar)
                tkey2, k1 = jax.random.split(tkey)
                trk2, track = tracker_step(trk_st, image, cam,
                                           cfg.tracker, k1)
                ekey2, k2 = jax.random.split(ekey)
                est2, out = fusion_step(est_st, track, lo["pose"],
                                        cfg.estimator, k2)
                return odo2, trk2, est2, tkey2, ekey2, lo, track, out

            # no donation: freshly-init states share zero-filled buffers
            # via constant pooling, which trips the double-donation check
            self._front = jax.jit(front)

        Kw = cfg.loop.window_points

        def extract_landmarks(w, scan_points, scan_valid):
            """Newest-frame window landmarks for the loop lane.

            All live features enter descriptor matching; 3D for PnP comes
            from the *LiDAR* depth image (projected + morphologically
            completed) sampled at the feature pixel — metric and far more
            accurate than the monocular inverse depths, which is what makes
            the PnP verification reliable (triangulated depths gave ~0 PnP
            inliers at true revisits).
            Returns (pts_w, norm, uv, sel_match, sel_pnp).
            """
            from lmono_tpu.mapping.depth import complete_depth, project_cloud
            from lmono_tpu.utils.lie import quat_mul, quat_normalize, quat_rotate

            slot = jnp.minimum(w.count - 1, w.t.shape[0] - 1).astype(jnp.int32)
            feats = w.feats
            sel = feats.alive & feats.obs_mask[:, slot]
            norm = feats.obs[:, slot]
            uv = self.cam.undist_to_plane(norm)

            T_CL_ = Pose(w.ex_t, w.ex_q)
            cam_pose = Pose(w.t[slot], w.q[slot]).compose(T_CL_.inverse())

            # --- LiDAR depth at feature pixels (nearest-valid sampling)
            pts_cam_scan = T_CL_.apply(scan_points.reshape(-1, 3))
            depth_img, dmask = project_cloud(
                pts_cam_scan, scan_valid.reshape(-1), self.cam,
                cfg.mapping.depth_min, cfg.mapping.depth_max)
            depth_f, fmask = complete_depth(depth_img, dmask, cfg.mapping)
            ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0,
                          depth_f.shape[1] - 1)
            vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0,
                          depth_f.shape[0] - 1)
            z_lidar = depth_f[vi, ui]
            has_lidar = fmask[vi, ui] & (z_lidar > cfg.mapping.depth_min) \
                & (z_lidar < cfg.mapping.depth_max * 0.9)

            # --- fallback: triangulated inverse depth (weaker, but covers
            # features above the LiDAR's vertical FoV)
            T_LC = T_CL_.inverse()
            cam_t = w.t + quat_rotate(w.q, jnp.broadcast_to(
                T_LC.t, (w.t.shape[0], 3)))
            cam_q = quat_normalize(quat_mul(w.q, T_LC.q))
            a = feats.anchor
            n_a = jnp.take_along_axis(feats.obs, a[:, None, None],
                                      axis=1)[:, 0]
            tri_depth = 1.0 / jnp.maximum(feats.inv_depth, 1e-4)
            p_ca = jnp.concatenate(
                [n_a, jnp.ones_like(n_a[:, :1])], -1) * tri_depth[:, None]
            p_w_tri = quat_rotate(cam_q[a], p_ca) + cam_t[a]
            p_c_tri = cam_pose.apply_inv(p_w_tri)
            z_tri = p_c_tri[..., 2]
            has_tri = feats.depth_ok & (z_tri > 0.5)

            ray = jnp.concatenate([norm, jnp.ones_like(norm[:, :1])], -1)
            z = jnp.where(has_lidar, z_lidar, z_tri)
            pts_w = cam_pose.apply(ray * z[:, None])
            sel_pnp = sel & (has_lidar | has_tri)
            if Kw >= sel.shape[0]:
                return (pts_w[:Kw], norm[:Kw], uv[:Kw], sel[:Kw],
                        sel_pnp[:Kw])
            # Kw < max_tracks: keep the BEST Kw landmarks, not the first Kw
            # slot rows — rank by (selected, PnP-usable, track length) so a
            # smaller loop-lane budget still carries the strongest features.
            track_len = jnp.sum(feats.obs_mask, axis=1).astype(jnp.float32)
            score = (sel.astype(jnp.float32) * 1e6
                     + sel_pnp.astype(jnp.float32) * 1e3 + track_len)
            idx = jax.lax.top_k(score, Kw)[1]
            return (pts_w[idx], norm[idx], uv[idx], sel[idx], sel_pnp[idx])

        self._extract_landmarks = jax.jit(extract_landmarks)

        self.correction = Pose.identity()   # drift fix from the pose graph
        self.timer = StageTimer()
        self.frame_idx = 0
        self.n_loops = 0
        # history for retro-corrected trajectory export
        self._raw_poses: list = []      # fused laser pose per frame (uncorrected)
        self._node_frames: list = []    # frame index of each pose-graph node
        self._node_raw_cam: list = []   # corrected-at-the-time cam pose per node
        # push-based stream front (MeasurementManager parity): scans and
        # images arrive on independent clocks and are paired by timestamp
        from lmono_tpu.io.sync import MeasurementSync
        self.sync = MeasurementSync(delay_time=cfg.estimator.delay_time)

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
        """
        time = self.frame_idx * 0.1 if time is None else time

        if self._front is not None:
            # single-dispatch composed front lane
            with self.timer.stage("front"):
                (self.lidar.state, self.tracker.state, self.estimator.state,
                 self.tracker._key, self.estimator._key,
                 lo, track, out) = self._front(
                    self.lidar.state, self.tracker.state,
                    self.estimator.state, self.tracker._key,
                    self.estimator._key, scan, image)
            laser_pose = Pose(lo["pose"].t, lo["pose"].q)
        else:
            with self.timer.stage("lidar"):
                lo = self.lidar.process(scan)
            laser_pose = Pose(lo["pose"].t, lo["pose"].q)

            with self.timer.stage("track"):
                track = self.tracker.process(image)

            with self.timer.stage("fuse"):
                out = self.estimator.process(track, laser_pose)

        fused = Pose(out.pose.t, out.pose.q)
        cam_pose = Pose(out.cam_pose.t, out.cam_pose.q)
        corrected = self.correction.compose(fused)
        self._raw_poses.append(fused)

        # one host transfer for both lane-gating flags (each bool() would
        # otherwise cost its own device->host round-trip per frame)
        kf_flag, init_flag = (bool(v) for v in jax.device_get(
            (out.is_keyframe, out.initialized)))

        loop_fired = False
        if self.loop is not None and kf_flag and init_flag:
            with self.timer.stage("loop"):
                loop_fired = self._loop_lane(scan, image, cam_pose, time,
                                             lo.get("features"))

        if self.mapper is not None and init_flag:
            with self.timer.stage("map"):
                T_CL = Pose(out.extrinsic.t, out.extrinsic.q)
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
            "extrinsic": Pose(out.extrinsic.t, out.extrinsic.q),
            "is_keyframe": bool(out.is_keyframe),
            "initialized": bool(out.initialized),
            "loop": loop_fired,
            "n_tracked": int(out.n_tracked),
        }

    # ------------------------------------------------------------------
    def _loop_lane(self, scan, image, cam_pose: Pose, time: float,
                   lidar_feats=None) -> bool:
        """Keyframe lane: descriptor DB + detection + pose-graph correction."""
        w = self.estimator.state.window
        pts_w, norm, uv, sel, sel_pnp = self._extract_landmarks(
            w, scan["points"], scan["valid"])
        # 3D points were built in the estimator frame; shift to corrected
        corr_pose = self.correction.compose(cam_pose)
        pts_w = self.correction.apply(pts_w)

        lidar_pack = None
        ext = None
        if lidar_feats is not None:
            Ke = self.cfg.loop.kf_edge_points
            Kp = self.cfg.loop.kf_planar_points

            def sub(x, m, cap):
                stride = max(1, x.shape[0] // cap)
                return x[::stride][:cap], m[::stride][:cap]

            le, lem = sub(lidar_feats.edge_points, lidar_feats.edge_mask, Ke)
            lp, lpm = sub(lidar_feats.planar_points,
                          lidar_feats.planar_mask, Kp)
            lidar_pack = (le, lem, lp, lpm)
            wst = self.estimator.state.window
            ext = Pose(wst.ex_t, wst.ex_q)

        res = self.loop.process_keyframe(
            image, self.cam, uv, norm, pts_w, sel,
            corr_pose, time, win_pnp_mask=sel_pnp,
            lidar_features=lidar_pack, extrinsic=ext)

        # every processed keyframe becomes a pose-graph node
        if res is None:
            return False
        node_idx = int(self.loop.db.count) - 1  # slot just written
        node_pose = self.correction.compose(cam_pose)
        self.graph = graph_add_node(self.graph, node_pose)
        self._node_frames.append(self.frame_idx)
        # store the UNcorrected camera pose: final_trajectory computes the
        # raw-world → optimized-world transform per segment from it
        self._node_raw_cam.append(cam_pose)
        if not bool(res.found):
            return False

        self.n_loops += 1
        rel = Pose(res.rel_t, res.rel_q)
        self.graph = graph_add_loop(self.graph, int(res.old_seq), node_idx,
                                    rel)
        self.graph = self._opt_graph(self.graph)
        # drift correction: move the current node to its optimized pose
        opt = graph_poses(self.graph)
        cur_opt = Pose(opt.t[node_idx], opt.q[node_idx])
        cur_raw = self.correction.compose(cam_pose)
        self.correction = cur_opt.compose(cur_raw.inverse()).compose(
            self.correction)
        return True

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

        state = {
            "lidar": self.lidar.state,
            "tracker": self.tracker.state,
            "estimator": self.estimator.state,
            "correction": self.correction,
            "frame_idx": jnp.asarray(self.frame_idx),
            "n_loops": jnp.asarray(self.n_loops),
        }
        if self.loop is not None:
            state["loop_db"] = self.loop.db
            state["graph"] = self.graph
        if self.mapper is not None:
            state["map"] = self.mapper.map
        save_state(path, state)

    def load_checkpoint(self, path: str) -> None:
        from lmono_tpu.utils.checkpoint import load_state

        template = {
            "lidar": self.lidar.state,
            "tracker": self.tracker.state,
            "estimator": self.estimator.state,
            "correction": self.correction,
            "frame_idx": jnp.asarray(self.frame_idx),
            "n_loops": jnp.asarray(self.n_loops),
        }
        if self.loop is not None:
            template["loop_db"] = self.loop.db
            template["graph"] = self.graph
        if self.mapper is not None:
            template["map"] = self.mapper.map
        state = load_state(path, template)
        self.lidar.state = state["lidar"]
        self.tracker.state = state["tracker"]
        self.estimator.state = state["estimator"]
        self.correction = state["correction"]
        self.frame_idx = int(state["frame_idx"])
        self.n_loops = int(state["n_loops"])
        if self.loop is not None:
            self.loop.db = state["loop_db"]
            self.graph = state["graph"]
        if self.mapper is not None:
            self.mapper.map = state["map"]
