"""Fused full-pipeline step: LiDAR odometry + KLT tracking + window fusion
in ONE compiled program, `lax.scan`-rolled over a chunk of frames.

The interactive `SlamSystem` dispatches the three jitted lanes per frame —
right for live streams, but each host→device dispatch through the runtime
tunnel costs ~ms while the math costs ~0.1 ms.  For offline jobs (mapping
runs, benchmarks, batch replays) this module scans the composed step over a
frame chunk so the dispatch is amortized CHUNK× and XLA overlaps adjacent
frames' programs.  This is the TPU-shaped counterpart of the reference's
4-process free-running pipeline (SURVEY §1 — its throughput comes from
process overlap; ours from compiler-scheduled chunk rollouts).

The loop-closure and dense-mapping lanes stay host-side (keyframe-rate,
data-dependent) — they consume this module's per-frame outputs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.camera import CameraModel
from lmono_tpu.config import SystemConfig
from lmono_tpu.estimator.estimator import EstimatorState, fusion_step
from lmono_tpu.estimator.tracker import TrackerState, tracker_step
from lmono_tpu.lidar.odometry import OdometryState, odometry_step
from lmono_tpu.utils.lie import Pose


class FusedState(NamedTuple):
    odo: OdometryState
    trk: TrackerState
    est: EstimatorState
    key: jax.Array

    @staticmethod
    def init(cfg: SystemConfig, T_CL: Pose | None,
             key=None) -> "FusedState":
        return FusedState(
            odo=OdometryState.init(cfg.lidar),
            trk=TrackerState.init(cfg.tracker, cfg.camera.height,
                                  cfg.camera.width),
            est=EstimatorState.init(cfg.estimator, T_CL,
                                    cfg.tracker.max_features),
            key=key if key is not None else jax.random.PRNGKey(7),
        )


def fused_step(state: FusedState, frame: dict, cam: CameraModel,
               cfg: SystemConfig, with_features: bool = False
               ) -> tuple[FusedState, dict]:
    """One frame through odometry → tracker → fusion.

    frame: {points (R,W,3), ranges (R,W), valid (R,W), image (H,W)}.
    with_features=True additionally returns the scan's edge/planar feature
    sets (`result["features"]`) for the loop lane's LiDAR refinement.
    """
    scan = {k: frame[k] for k in ("points", "ranges", "valid")}
    odo, lo = odometry_step(state.odo, scan, cfg.lidar)
    key, k1, k2 = jax.random.split(state.key, 3)
    trk, track = tracker_step(state.trk, frame["image"], cam,
                              cfg.tracker, k1)
    est, out = fusion_step(state.est, track, lo["pose"], cfg.estimator, k2)
    result = {
        "pose_t": out.pose.t, "pose_q": out.pose.q,
        "cam_t": out.cam_pose.t, "cam_q": out.cam_pose.q,
        "ex_t": out.extrinsic.t, "ex_q": out.extrinsic.q,
        "is_keyframe": out.is_keyframe,
        "initialized": out.initialized,
        "n_tracked": out.n_tracked,
        "laser_t": lo["pose"].t, "laser_q": lo["pose"].q,
        "solve_cost": out.solve_cost,
    }
    if with_features:
        result["features"] = lo["features"]
    return FusedState(odo, trk, est, key), result


def fused_chunk(state: FusedState, frames: dict, cam: CameraModel,
                cfg: SystemConfig) -> tuple[FusedState, dict]:
    """Roll `fused_step` over frames with a leading chunk axis — one device
    program for the whole chunk."""

    def step(s, f):
        return fused_step(s, f, cam, cfg)

    return jax.lax.scan(step, state, frames)


def system_chunk(state: FusedState, cmap, frames: dict, corr: Pose,
                 cam: CameraModel, cfg: SystemConfig,
                 enable_map: bool, enable_loop: bool):
    """Roll the FULL per-frame system over a chunk in ONE device program:
    odometry + tracking + window fusion (+ dense-map merge, + loop-lane
    landmark extraction), `lax.scan`-rolled over the frame axis.

    This is the TPU-shaped counterpart of the reference's four overlapping
    free-running processes (`estimator_node.cc:59-66`, `loop_detection_node
    .cc:382`, `map_build_node.cc:299-300`): instead of hiding per-frame
    latency behind OS processes, the whole frame-rate dataflow compiles into
    one program whose dispatch cost amortizes over the chunk; only the
    keyframe-rate loop lane stays host-driven (it is data-dependent), fed by
    the per-frame landmark outputs this program emits.

    The LiDAR depth image (projection + morphological completion) is
    computed ONCE per frame and shared by the dense-mapping merge and the
    loop-lane landmark depths — the two consumers the interactive path
    computes it twice for.

    `corr` is the pose-graph drift correction at chunk start; it is applied
    to mapped points and landmark outputs on-device.  Corrections discovered
    mid-chunk take effect from the next chunk (the reference's ROS pipeline
    has the same keyframe→estimator feedback latency).

    Returns (state', cmap', per-frame outputs dict).
    """
    from lmono_tpu.loop.landmarks import subsample_features, window_landmarks
    from lmono_tpu.mapping.builder import colormap_update_hash
    from lmono_tpu.mapping.depth import (backproject_colored, complete_depth,
                                         project_cloud)

    Kw = cfg.loop.window_points
    Ke, Kp = cfg.loop.kf_edge_points, cfg.loop.kf_planar_points
    mcfg = cfg.mapping

    def step(carry, frame):
        st, cm = carry
        st2, res = fused_step(st, frame, cam, cfg,
                              with_features=enable_loop)
        feats = res.pop("features", None)
        w = st2.est.window
        T_CL = Pose(w.ex_t, w.ex_q)
        cam_pose = Pose(res["cam_t"], res["cam_q"])
        corr_cam = corr.compose(cam_pose)
        res.update(ccam_t=corr_cam.t, ccam_q=corr_cam.q)

        pts_cam = T_CL.apply(frame["points"].reshape(-1, 3))
        depth, dmask = project_cloud(pts_cam, frame["valid"].reshape(-1),
                                     cam, mcfg.depth_min, mcfg.depth_max)
        depth_f, fmask = complete_depth(depth, dmask, mcfg)

        if enable_map:
            pts_c, colors, ok = backproject_colored(depth_f, fmask,
                                                    frame["image"], cam, mcfg)
            keep = (ok & (pts_c[:, 1] > -mcfg.crop_height)
                    & res["initialized"])
            pts_w = corr_cam.apply(pts_c)
            cm = colormap_update_hash(cm, pts_w, colors, keep, mcfg.map_voxel)

        if enable_loop:
            lm = window_landmarks(w, cam, mcfg, Kw,
                                  depth=depth_f, depth_mask=fmask)
            res.update(lm_pts=corr.apply(lm.pts_w), lm_norm=lm.norm,
                       lm_uv=lm.uv, lm_sel=lm.sel, lm_pnp=lm.sel_pnp)
            le, lem = subsample_features(feats.edge_points,
                                         feats.edge_mask, Ke)
            lp, lpm = subsample_features(feats.planar_points,
                                         feats.planar_mask, Kp)
            res.update(loop_edge=le, loop_edge_mask=lem,
                       loop_planar=lp, loop_planar_mask=lpm)
        return (st2, cm), res

    (state2, cmap2), outs = jax.lax.scan(step, (state, cmap), frames)
    # active-bank occupancy at chunk end: the host flush decision reads it
    # from the SAME per-chunk fetch as the keyframe flags — a separate
    # eager occupancy probe measurably stalled the device queue
    outs["map_fill"] = jnp.sum(cmap2.mask)
    return state2, cmap2, outs


class FusedPipeline:
    """Host wrapper: jitted chunk rollout with donated carry."""

    def __init__(self, cfg: SystemConfig, cam: CameraModel,
                 T_CL: Pose | None = None):
        self.cfg = cfg
        # no carry donation: the freshly-initialized state aliases identical
        # constant buffers (identity poses, zero pyramids) and XLA rejects
        # donating the same buffer twice; state is small next to the frames
        self._chunk = jax.jit(lambda s, fr: fused_chunk(s, fr, cam, cfg))
        self._step = jax.jit(lambda s, fr: fused_step(s, fr, cam, cfg))
        self.state = FusedState.init(cfg, T_CL)

    def process_chunk(self, frames: dict) -> dict:
        """frames: pytree with leading (chunk,) axis."""
        self.state, outs = self._chunk(self.state, frames)
        return outs

    def process(self, frame: dict) -> dict:
        self.state, out = self._step(self.state, frame)
        return out
