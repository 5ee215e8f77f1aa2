"""The engine itself on the mesh: end-to-end parity of the distributed
SlamSystem / FusedPipeline vs the single-device run (VERDICT r2 #1/#2).

The map/space axis (voxel banks, colored map) is slot-range sharded and must
match the single-device state EXACTLY (deterministic hash winners, exact
top-k merges); the kf/landmark axis (window solve, marginalization) differs
only by psum reassociation, so trajectories agree to float tolerance.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from lmono_tpu.config import ParallelConfig, synthetic_config
from lmono_tpu.io import synthetic as syn
from lmono_tpu.utils.lie import Pose


def _dist_cfg(cfg, kf=4, map_=2):
    return cfg.replace(parallel=ParallelConfig(kf_shards=kf, map_shards=map_))


def _make_frames(cfg, n, T_CL):
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(n)
    frames = []
    for i in range(n):
        pose = Pose(traj.t[i], traj.q[i])
        s = syn.simulate_lidar(scene, pose, cfg.lidar, noise_std=0.01,
                               key=jax.random.PRNGKey(100 + i))
        fr = {k: s[k] for k in ("points", "ranges", "valid")}
        fr["image"] = syn.render_camera(
            scene, pose.compose(T_CL.inverse()), cfg.camera)
        frames.append(jax.tree.map(np.asarray, fr))
    return frames


# --------------------------------------------------------------------------
# exact shard parity of the space-axis state updates
# --------------------------------------------------------------------------

def test_sharded_bank_update_exact():
    """Concatenated per-shard voxel banks == the single-device bank,
    bitwise (slot-range partition + deterministic contested-slot winner)."""
    from functools import partial

    from lmono_tpu.ops.voxelmap import PointBank, bank_update_hash
    from lmono_tpu.parallel.dist_engine import make_engine_mesh

    mesh = make_engine_mesh(1, 4)
    C = 1024
    key = jax.random.PRNGKey(0)
    pts1 = jax.random.uniform(key, (512, 3), minval=-20, maxval=20)
    pts2 = pts1 + 0.02 * jax.random.normal(jax.random.PRNGKey(1), (512, 3))
    center = jnp.zeros(3)

    bank = PointBank.empty(C)
    for p in (pts1, pts2):
        bank = bank_update_hash(bank, p, jnp.ones(512, bool), 0.5, center,
                                100.0)

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(PointBank(P("map"), P("map")), P(), P()),
             out_specs=PointBank(P("map"), P("map")))
    def upd(b, p, m):
        return bank_update_hash(b, p, m, 0.5, center, 100.0, axis="map")

    sb = PointBank.empty(C)
    for p in (pts1, pts2):
        sb = upd(sb, p, jnp.ones(512, bool))

    np.testing.assert_array_equal(np.asarray(bank.mask), np.asarray(sb.mask))
    np.testing.assert_array_equal(np.asarray(bank.points),
                                  np.asarray(sb.points))
    assert int(bank.mask.sum()) > 100


def test_sharded_colormap_exact():
    from functools import partial

    from lmono_tpu.mapping.builder import ColorMap, colormap_update_hash
    from lmono_tpu.parallel.dist_engine import make_engine_mesh

    mesh = make_engine_mesh(2, 4)
    C = 2048
    pts = jax.random.uniform(jax.random.PRNGKey(2), (1024, 3),
                             minval=-30, maxval=30)
    cols = jax.random.uniform(jax.random.PRNGKey(3), (1024, 3))
    msk = jnp.arange(1024) % 5 != 0

    cm = colormap_update_hash(ColorMap.empty(C), pts, cols, msk, 0.3)

    spec = ColorMap(P("map"), P("map"), P("map"))

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(spec, P(), P(), P()), out_specs=spec)
    def upd(c, p, co, m):
        return colormap_update_hash(c, p, co, m, 0.3, axis="map")

    sm = upd(ColorMap.empty(C), pts, cols, msk)
    np.testing.assert_array_equal(np.asarray(cm.mask), np.asarray(sm.mask))
    np.testing.assert_array_equal(np.asarray(cm.points),
                                  np.asarray(sm.points))
    np.testing.assert_array_equal(np.asarray(cm.colors),
                                  np.asarray(sm.colors))
    assert int(cm.mask.sum()) > 200


# --------------------------------------------------------------------------
# composed distributed step / live system parity
# --------------------------------------------------------------------------

@pytest.mark.slow
def test_dist_fused_pipeline_matches_single():
    """The composed (odometry → tracker → fusion) step on the (kf, map)
    mesh reproduces the single-device FusedPipeline trajectory."""
    from lmono_tpu.camera import camera_from_config
    from lmono_tpu.fused import FusedPipeline
    from lmono_tpu.parallel.dist_engine import DistributedFusedPipeline

    cfg = synthetic_config()
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    cfg = _dist_cfg(cfg, kf=4, map_=2)
    cam = camera_from_config(cfg.camera)
    frames = _make_frames(cfg, 24, T_CL)

    fp = FusedPipeline(cfg, cam, T_CL)
    dp = DistributedFusedPipeline(cfg, cam, T_CL)
    max_gap = 0.0
    for fr in frames:
        o1 = fp.process(fr)
        o2 = dp.process(fr)
        assert bool(o1["is_keyframe"]) == bool(o2["is_keyframe"])
        assert bool(o1["initialized"]) == bool(o2["initialized"])
        max_gap = max(max_gap, float(jnp.linalg.norm(
            o1["pose_t"] - o2["pose_t"])))
    assert bool(o1["initialized"])
    assert max_gap < 5e-3, f"distributed/single pose gap {max_gap}"
    # the odometry banks are bitwise equal (space axis is exact)
    np.testing.assert_array_equal(
        np.asarray(fp.state.odo.edge_map.mask),
        np.asarray(dp.state.odo.edge_map.mask))
    np.testing.assert_array_equal(
        np.asarray(fp.state.odo.plane_map.points),
        np.asarray(dp.state.odo.plane_map.points))


@pytest.mark.slow
def test_dist_slam_system_matches_single(tmp_path):
    """Full live engine (loop + mapping lanes enabled) distributed vs
    single-device: same trajectory, same keyframe DB fill, equal colored
    map shards."""
    from lmono_tpu.pipeline import SlamSystem

    base = synthetic_config()
    T_CL = syn.synthetic_T_CL()
    base = base.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    frames = _make_frames(base, 16, T_CL)

    sys1 = SlamSystem(base, enable_loop=True, enable_mapping=True)
    sys2 = SlamSystem(_dist_cfg(base, kf=4, map_=2), enable_loop=True,
                      enable_mapping=True)
    max_gap = 0.0
    for i, fr in enumerate(frames):
        scan = {k: fr[k] for k in ("points", "ranges", "valid")}
        o1 = sys1.process(scan, fr["image"], time=i * 0.1)
        o2 = sys2.process(scan, fr["image"], time=i * 0.1)
        assert o1["is_keyframe"] == o2["is_keyframe"]
        max_gap = max(max_gap, float(jnp.linalg.norm(
            o1["pose"].t - o2["pose"].t)))
    assert o1["initialized"] and o2["initialized"]
    assert max_gap < 5e-3, f"distributed/single pose gap {max_gap}"
    assert int(sys1.loop.db.count) == int(sys2.loop.db.count) > 0
    assert sys1.n_loops == sys2.n_loops
    # colored world map: the sharded update itself is exact
    # (test_sharded_colormap_exact); end-to-end, the ~1e-6 kf-axis pose
    # jitter moves a few back-projected points across voxel boundaries, so
    # assert slot agreement >99% rather than bitwise equality
    m1 = np.asarray(sys1.mapper.map.mask)
    m2 = np.asarray(sys2.mapper.map.mask)
    agree = (m1 == m2).mean()
    assert agree > 0.99, f"colored-map slot agreement {agree}"
    both = m1 & m2
    p1 = np.asarray(sys1.mapper.map.points)[both]
    p2 = np.asarray(sys2.mapper.map.points)[both]
    # mm-level pose deltas shift ~m-scale points across 0.2 m voxel
    # boundaries, so a few % of slots legitimately host different points
    close = (np.linalg.norm(p1 - p2, axis=-1) < 2e-2).mean()
    assert close > 0.95, f"colored-map same-slot point agreement {close}"
    assert m1.sum() > 500
    # PLY export works from the sharded map
    n_pts = sys2.save_map(str(tmp_path / "dist.ply"))
    assert n_pts > 500


@pytest.mark.slow
def test_small_mesh_auto_dense_window_solver():
    """kf_shards below the measured crossover (estimator.DIST_WINDOW_
    CROSSOVER, SCALING.json) must auto-select the gather-dense window
    solver — identical math to the single-device dense path, so the
    2-shard engine's trajectory matches single-device EXACTLY at the
    solve level (VERDICT r3 #5: kf_shards>1 must never pessimize)."""
    from lmono_tpu.estimator.estimator import DIST_WINDOW_CROSSOVER
    from lmono_tpu.fused import FusedPipeline
    from lmono_tpu.parallel.dist_engine import DistributedFusedPipeline
    from lmono_tpu.camera import camera_from_config

    assert DIST_WINDOW_CROSSOVER == 4   # measured on the 8-way CPU mesh

    cfg = synthetic_config()
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    cfg2 = _dist_cfg(cfg, kf=2, map_=1)
    cam = camera_from_config(cfg.camera)
    frames = _make_frames(cfg, 14, T_CL)

    fp = FusedPipeline(cfg, cam, T_CL)
    dp = DistributedFusedPipeline(cfg2, cam, T_CL)
    max_gap = 0.0
    for fr in frames:
        o1 = fp.process(fr)
        o2 = dp.process(fr)
        max_gap = max(max_gap, float(jnp.linalg.norm(
            o1["pose_t"] - o2["pose_t"])))
    assert bool(o1["initialized"]) and bool(o2["initialized"])
    # dense math on both sides: gap is collective-reduction rounding only
    assert max_gap < 1e-4, f"dense-fallback pose gap {max_gap}"
