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
    """End-to-end SLAM engine over (scan, image) frame streams."""

    def __init__(self, cfg: SystemConfig, enable_loop: bool = True,
                 enable_mapping: bool = True):
        self.cfg = cfg
        self.cam = camera_from_config(cfg.camera)
        T_CL = None
        if cfg.laser_to_camera is not None:
            m = jnp.asarray(np.array(cfg.laser_to_camera).reshape(4, 4),
                            jnp.float32)
            T_CL = Pose.from_mat4(m)
        self.lidar = LidarOdometry(cfg.lidar)
        self.tracker = FeatureTracker(self.cam, cfg.tracker,
                                      cfg.camera.height, cfg.camera.width)
        self.estimator = FusionEstimator(
            cfg.estimator, T_CL, n_tracks=cfg.tracker.max_features)
        self.loop: Optional[LoopDetector] = (
            LoopDetector(cfg.loop, (cfg.camera.height, cfg.camera.width))
            if enable_loop else None)
        self.graph = PoseGraph.empty(cfg.loop.db_capacity) if enable_loop else None
        self.mapper: Optional[MapBuilder] = (
            MapBuilder(self.cam, cfg.mapping) if enable_mapping else None)
        self._opt_graph = (jax.jit(lambda g: optimize_posegraph(
            g, iters=cfg.loop.posegraph_iters)) if enable_loop else None)

        Kw = cfg.loop.window_points

        def extract_landmarks(w):
            """Newest-frame window landmarks: (pts_w, norm, uv, sel)."""
            from lmono_tpu.utils.lie import quat_mul, quat_normalize, quat_rotate
            slot = jnp.minimum(w.count - 1, w.t.shape[0] - 1).astype(jnp.int32)
            feats = w.feats
            sel = feats.alive & feats.depth_ok & feats.obs_mask[:, slot]
            norm = feats.obs[:, slot]
            uv = self.cam.undist_to_plane(norm)
            T_CL_ = Pose(w.ex_t, w.ex_q)
            T_LC = T_CL_.inverse()
            cam_t = w.t + quat_rotate(w.q, jnp.broadcast_to(
                T_LC.t, (w.t.shape[0], 3)))
            cam_q = quat_normalize(quat_mul(w.q, T_LC.q))
            a = feats.anchor
            n_a = jnp.take_along_axis(feats.obs, a[:, None, None],
                                      axis=1)[:, 0]
            depth = 1.0 / jnp.maximum(feats.inv_depth, 1e-4)
            p_ca = jnp.concatenate(
                [n_a, jnp.ones_like(n_a[:, :1])], -1) * depth[:, None]
            pts_w = quat_rotate(cam_q[a], p_ca) + cam_t[a]
            return pts_w[:Kw], norm[:Kw], uv[:Kw], sel[:Kw]

        self._extract_landmarks = jax.jit(extract_landmarks)

        self.correction = Pose.identity()   # drift fix from the pose graph
        self.timer = StageTimer()
        self.frame_idx = 0
        self.n_loops = 0

    # ------------------------------------------------------------------
    def process(self, scan: dict, image, time: Optional[float] = None) -> dict:
        """One frame: scan = {points, ranges, valid}; image (H, W) in [0,1].

        Returns dict with fused pose (loop-corrected), extrinsic, stats.
        """
        time = self.frame_idx * 0.1 if time is None else time

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

        loop_fired = False
        if self.loop is not None and bool(out.is_keyframe) \
                and bool(out.initialized):
            with self.timer.stage("loop"):
                loop_fired = self._loop_lane(scan, image, cam_pose, time)

        if self.mapper is not None and bool(out.initialized):
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
    def _loop_lane(self, scan, image, cam_pose: Pose, time: float) -> bool:
        """Keyframe lane: descriptor DB + detection + pose-graph correction."""
        w = self.estimator.state.window
        pts_w, norm, uv, sel = self._extract_landmarks(w)

        res = self.loop.process_keyframe(
            image, self.cam, uv, norm, pts_w, sel,
            self.correction.compose(cam_pose), time)

        # every processed keyframe becomes a pose-graph node
        if res is None:
            return False
        node_idx = int(self.loop.db.count) - 1  # slot just written
        self.graph = graph_add_node(self.graph,
                                    self.correction.compose(cam_pose))
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
    def save_map(self, path: str) -> int:
        if self.mapper is None:
            return 0
        return self.mapper.save_ply(path)
