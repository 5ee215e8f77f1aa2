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
               cfg: SystemConfig) -> tuple[FusedState, dict]:
    """One frame through odometry → tracker → fusion.

    frame: {points (R,W,3), ranges (R,W), valid (R,W), image (H,W)}.
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
    return FusedState(odo, trk, est, key), result


def fused_chunk(state: FusedState, frames: dict, cam: CameraModel,
                cfg: SystemConfig) -> tuple[FusedState, dict]:
    """Roll `fused_step` over frames with a leading chunk axis — one device
    program for the whole chunk."""

    def step(s, f):
        return fused_step(s, f, cam, cfg)

    return jax.lax.scan(step, state, frames)


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
