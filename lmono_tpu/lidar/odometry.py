"""LiDAR odometry: direct scan-to-map registration with a rolling voxel map.

F-LOAM-style pipeline (the capability the reference delegates to the external
A-LOAM package, `/root/reference/README.md:50-60`), rebuilt as a single jitted
step: extract edge/planar features → constant-velocity predict → damped GN
scan-to-map registration → voxel-map update.  State is a fixed-shape pytree,
so the whole odometry loop is `lax.scan`-able and shard-able.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import LidarConfig
from lmono_tpu.lidar.features import ScanFeatures, extract_features
from lmono_tpu.lidar.registration import register
from lmono_tpu.ops.voxelmap import PointBank, bank_update, bank_update_hash
from lmono_tpu.utils.lie import Pose, quat_mul, quat_normalize, quat_conj


class OdometryState(NamedTuple):
    pose: Pose            # map-from-sensor, current frame
    prev_pose: Pose       # map-from-sensor, previous frame
    edge_map: PointBank
    plane_map: PointBank
    frame: jax.Array      # int32 frame counter

    @staticmethod
    def init(cfg: LidarConfig) -> "OdometryState":
        return OdometryState(
            pose=Pose.identity(),
            prev_pose=Pose.identity(),
            edge_map=PointBank.empty(cfg.map_edge_capacity),
            plane_map=PointBank.empty(cfg.map_planar_capacity),
            frame=jnp.zeros((), jnp.int32),
        )


def predict_pose(state: OdometryState) -> Pose:
    """Constant-velocity motion model: pose ∘ (prev⁻¹ ∘ pose)."""
    rel = state.prev_pose.between(state.pose)
    return state.pose.compose(rel)


def odometry_step(state: OdometryState, scan: dict,
                  cfg: LidarConfig,
                  axis: str | None = None) -> tuple[OdometryState, dict]:
    """Process one sweep dict {points (R,W,3), ranges (R,W), valid (R,W)}.

    axis: inside `shard_map`, the map banks in `state` are shards of the
    global slot space over this mesh axis (space/"map" sharding, SURVEY §5);
    scans and poses stay replicated.  Requires `map_update == "hash"` (the
    slot-range-partitionable scheme).  Concatenated shard banks and the
    resulting trajectory match the single-device run exactly.
    """
    feats = extract_features(scan["points"], scan["ranges"], scan["valid"], cfg)

    is_first = state.frame == 0
    init_pose = predict_pose(state)

    refined, diag = register(
        init_pose,
        feats.edge_points, feats.edge_mask,
        feats.planar_points, feats.planar_mask,
        state.edge_map.points, state.edge_map.mask,
        state.plane_map.points, state.plane_map.mask,
        cfg, cfg.scan_to_map_iters, axis=axis,
    )
    # first frame: no map yet, keep the prior pose
    pose = Pose(
        jnp.where(is_first, init_pose.t, refined.t),
        jnp.where(is_first, init_pose.q, refined.q),
    )

    # insert this frame's features into the map (world frame)
    if axis is not None and cfg.map_update != "hash":
        raise ValueError("sharded odometry requires map_update='hash'")
    if cfg.map_update == "hash":
        upd = lambda *a: bank_update_hash(*a, axis=axis)
    else:
        upd = bank_update

    def do_update(_):
        ew = pose.apply(feats.edge_points)
        pw = pose.apply(feats.planar_points)
        edge_map = upd(state.edge_map, ew, feats.edge_mask,
                       cfg.map_voxel_size, pose.t, cfg.map_keep_radius)
        plane_map = upd(state.plane_map, pw, feats.planar_mask,
                        cfg.map_voxel_size * 2.0, pose.t,
                        cfg.map_keep_radius)
        return edge_map, plane_map

    if cfg.map_update_every > 1:
        # sub-rate mapping (A-LOAM's map thread runs below odometry rate);
        # the first frames always insert so registration has a map to
        # anchor to.  lax.cond executes only the taken branch on TPU.
        want = ((state.frame % cfg.map_update_every == 0)
                | (state.frame < 10))
        edge_map, plane_map = jax.lax.cond(
            want, do_update,
            lambda _: (state.edge_map, state.plane_map), None)
    else:
        edge_map, plane_map = do_update(None)

    new_state = OdometryState(
        pose=pose,
        prev_pose=state.pose,
        edge_map=edge_map,
        plane_map=plane_map,
        frame=state.frame + 1,
    )
    out = {
        "pose": pose,
        "n_edge": jnp.sum(feats.edge_mask),
        "n_planar": jnp.sum(feats.planar_mask),
        "inliers": diag["inliers"][-1],
        "cost": diag["costs"][-1],
        # sensor-frame features, reused by the loop lane for LiDAR
        # refinement of loop edges
        "features": feats,
    }
    return new_state, out


def odometry_scan(state: OdometryState, scans: dict,
                  cfg: LidarConfig) -> tuple[OdometryState, dict]:
    """Roll the odometry over a whole chunk of sweeps in ONE device program.

    scans: pytree with a leading frame axis, e.g. points (F, R, W, 3).
    Returns (final state, stacked per-frame outputs minus the bulky feature
    arrays).  This is the TPU-shaped driver: per-frame host dispatch costs
    ~ms through the runtime tunnel, while the step itself costs ~0.1 ms —
    `lax.scan` amortizes the dispatch over the chunk and lets XLA overlap
    the per-frame programs.
    """
    def step(s, scan):
        s, out = odometry_step(s, scan, cfg)
        out.pop("features")          # keep the scanned carry lean
        return s, out

    return jax.lax.scan(step, state, scans)


class LidarOdometry:
    """Host-side convenience wrapper holding the jitted step.

    `process` runs one sweep per call (interactive / full-pipeline use);
    `process_chunk` runs a whole (F, ...) batch of sweeps in one dispatch
    (offline / bench use — over an order of magnitude faster per frame).
    """

    def __init__(self, cfg: LidarConfig):
        self.cfg = cfg
        self._step = jax.jit(lambda s, scan: odometry_step(s, scan, cfg),
                             donate_argnums=(0,))
        self._scan = jax.jit(lambda s, scans: odometry_scan(s, scans, cfg),
                             donate_argnums=(0,))
        self.state = OdometryState.init(cfg)

    def process(self, scan: dict) -> dict:
        self.state, out = self._step(self.state, scan)
        return out

    def process_chunk(self, scans: dict) -> dict:
        """scans: stacked sweeps with leading frame axis."""
        self.state, outs = self._scan(self.state, scans)
        return outs
