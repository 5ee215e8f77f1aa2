"""The live engine on the mesh: distributed SlamSystem / FusedPipeline lanes.

Round-2 validated the sharded solvers as standalone programs; this module
runs the *actual* SLAM loop distributed — one `shard_map` per lane over a 2-D
device mesh `(kf, map)`:

* **kf axis** (keyframe/time + landmark) — the fusion window's feature-table
  rows (`estimator.fusion_step(axis="kf")`: landmark-sharded LM with local
  Schur elimination of depths and a psum-reduced pose system) and the
  pose-graph nodes (`dist_posegraph`);
* **map axis** (space) — the odometry's voxel point banks
  (`odometry_step(axis="map")`: slot-range-sharded hash updates, per-shard
  KNN with all-gather candidate merge) and the dense colored map
  (`mapping.builder.colormap_update_hash(axis="map")`).

Everything not worth communicating for (scan feature extraction, KLT
tracking, the GN on merged correspondences) is computed replicated — the
standard SPMD trade: replicate the cheap compute, shard the state that grows.

Sharded and single-device runs produce the *same trajectory*: the bank/KNN
path is exactly equal (deterministic slot winners, exact top-k merges) and
the fusion path differs only by psum reassociation (~1e-7 relative).
`tests/test_dist_engine.py` asserts end-to-end parity on the 8-device CPU
mesh; `__graft_entry__.dryrun_multichip` runs the composed step.

This replaces, at scale, the reference's 4-OS-process topic graph
(`/root/reference/mono_lidar_mapping/launch/kitti_estimator_00.launch`,
`src/image_process/MeasurementManager.cc:17-24`) — processes become mesh
axes, topics become in-program arrays, and the scale axis is ICI bandwidth
instead of rosbag replay rate.
"""

from __future__ import annotations

from functools import partial

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmono_tpu.camera import CameraModel
from lmono_tpu.config import SystemConfig
from lmono_tpu.estimator.estimator import EstimatorState, fusion_step
from lmono_tpu.estimator.tracker import tracker_step
from lmono_tpu.estimator.window import FeatureTable, WindowState
from lmono_tpu.fused import FusedState
from lmono_tpu.lidar.odometry import OdometryState, odometry_step
from lmono_tpu.ops.voxelmap import PointBank
from lmono_tpu.utils.lie import Pose


def make_engine_mesh(kf_shards: int, map_shards: int,
                     devices=None) -> Mesh:
    """2-D engine mesh: `kf` (landmark/keyframe axis) × `map` (space axis).

    Size-1 axes are legal — psum/all_gather over them are identities — so
    one mesh shape covers every ParallelConfig."""
    devs = devices if devices is not None else jax.devices()
    n = kf_shards * map_shards
    if len(devs) < n:
        raise ValueError(
            f"need {n} devices for kf_shards={kf_shards}×"
            f"map_shards={map_shards}, have {len(devs)}")
    return Mesh(np.array(devs[:n]).reshape(kf_shards, map_shards),
                ("kf", "map"))


# --------------------------------------------------------------------------
# Sharding spec trees (global-view arrays; shard_map slices them).
# P() leaves are pytree prefixes: the whole subtree is replicated.
# --------------------------------------------------------------------------

def odometry_specs() -> OdometryState:
    """Map banks sharded over the space axis, poses replicated."""
    s = P("map")
    return OdometryState(
        pose=P(), prev_pose=P(),
        edge_map=PointBank(points=s, mask=s),
        plane_map=PointBank(points=s, mask=s),
        frame=P(),
    )


def estimator_specs() -> EstimatorState:
    """Feature-table rows sharded over kf, everything else replicated."""
    s = P("kf")
    window = WindowState(
        t=P(), q=P(), lt=P(), lq=P(),
        ex_t=P(), ex_q=P(), ex_ref_t=P(), ex_ref_q=P(),
        feats=FeatureTable(ids=s, anchor=s, obs=s, obs_mask=s,
                           inv_depth=s, depth_ok=s, alive=s),
        prior=P(), count=P(), initialized=P(), ex_refines=P(),
    )
    return EstimatorState(window=window, handeye=P(),
                          prev_norm=P(), prev_ids=P(), prev_alive=P(),
                          prev_laser_t=P(), prev_laser_q=P())


def fused_specs() -> FusedState:
    return FusedState(odo=odometry_specs(), trk=P(),
                      est=estimator_specs(), key=P())


def put_sharded(mesh: Mesh, value, specs):
    """device_put a pytree under a PartitionSpec (prefix) tree."""
    shardings = jax.tree.map(lambda sp: NamedSharding(mesh, sp), specs,
                             is_leaf=lambda x: isinstance(x, P))
    return jax.device_put(value, shardings)


def check_divisible(cfg: SystemConfig, kf: int, map_: int,
                    loop: bool = True, mapping: bool = True) -> None:
    est, lid, mp = cfg.estimator, cfg.lidar, cfg.mapping
    bad = []
    if est.max_tracks % kf:
        bad.append(f"estimator.max_tracks={est.max_tracks} % kf={kf}")
    if lid.map_edge_capacity % map_ or lid.map_planar_capacity % map_:
        bad.append("lidar map bank capacities % map shards")
    if loop and cfg.loop.db_capacity % kf:
        bad.append(f"loop.db_capacity={cfg.loop.db_capacity} % kf={kf}")
    if mapping and mp.map_capacity % map_:
        bad.append(f"mapping.map_capacity={mp.map_capacity} % map={map_}")
    if bad:
        raise ValueError("shard-divisibility: " + "; ".join(bad))


# --------------------------------------------------------------------------
# Composed distributed fused step (offline/bench path)
# --------------------------------------------------------------------------

def dist_fused_step(state: FusedState, frame: dict, cam: CameraModel,
                    cfg: SystemConfig) -> tuple[FusedState, dict]:
    """One frame through odometry → tracker → fusion, inside `shard_map`
    over the (kf, map) mesh.  Mirrors `fused.fused_step` exactly."""
    scan = {k: frame[k] for k in ("points", "ranges", "valid")}
    odo, lo = odometry_step(state.odo, scan, cfg.lidar, axis="map")
    key, k1, k2 = jax.random.split(state.key, 3)
    trk, track = tracker_step(state.trk, frame["image"], cam,
                              cfg.tracker, k1)
    est, out = fusion_step(state.est, track, lo["pose"], cfg.estimator, k2,
                           axis="kf")
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


class DistributedFusedPipeline:
    """`fused.FusedPipeline` with the step laid out over the engine mesh.

    Same host API (`process`, `process_chunk`); state lives sharded on the
    mesh between calls."""

    def __init__(self, cfg: SystemConfig, cam: CameraModel,
                 T_CL: Pose | None = None, mesh: Mesh | None = None):
        pc = cfg.parallel
        self.mesh = mesh or make_engine_mesh(pc.kf_shards, pc.map_shards)
        check_divisible(cfg, self.mesh.shape["kf"], self.mesh.shape["map"],
                        loop=False, mapping=False)
        self.cfg = cfg
        specs = fused_specs()
        self.state = put_sharded(self.mesh, FusedState.init(cfg, T_CL),
                                 specs)

        @partial(jax.shard_map, mesh=self.mesh, check_vma=False,
                 in_specs=(specs, P()), out_specs=(specs, P()))
        def step(s, fr):
            return dist_fused_step(s, fr, cam, cfg)

        @partial(jax.shard_map, mesh=self.mesh, check_vma=False,
                 in_specs=(specs, P()), out_specs=(specs, P()))
        def chunk(s, frames):
            return jax.lax.scan(
                lambda c, f: dist_fused_step(c, f, cam, cfg), s, frames)

        self._step = jax.jit(step)
        self._chunk = jax.jit(chunk)

    def process(self, frame: dict) -> dict:
        self.state, out = self._step(self.state, frame)
        return out

    def process_chunk(self, frames: dict) -> dict:
        self.state, outs = self._chunk(self.state, frames)
        return outs


# --------------------------------------------------------------------------
# Per-lane builders for the interactive SlamSystem
# --------------------------------------------------------------------------

def make_dist_odometry_step(mesh: Mesh, cfg_lidar):
    """shard_map'd `odometry_step` (banks on the map axis).  Same call
    signature as the single-device jitted step."""
    specs = odometry_specs()

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(specs, P()), out_specs=(specs, P()))
    def step(s, scan):
        return odometry_step(s, scan, cfg_lidar, axis="map")

    return jax.jit(step)


def make_dist_odometry_scan(mesh: Mesh, cfg_lidar):
    """shard_map'd `odometry_scan` (chunk rollout, banks on the map axis)."""
    specs = odometry_specs()

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(specs, P()), out_specs=(specs, P()))
    def scan(s, scans):
        def step(c, sc):
            c, out = odometry_step(c, sc, cfg_lidar, axis="map")
            out.pop("features")
            return c, out

        return jax.lax.scan(step, s, scans)

    return jax.jit(scan)


def make_dist_fusion_step(mesh: Mesh, cfg_est):
    """shard_map'd `fusion_step` (feature table on the kf axis).  Signature
    matches FusionEstimator._step: (state, track, lt, lq, key)."""
    specs = estimator_specs()

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(specs, P(), P(), P(), P()), out_specs=(specs, P()))
    def step(s, track, lt, lq, key):
        return fusion_step(s, track, Pose(lt, lq), cfg_est, key, axis="kf")

    return jax.jit(step)
