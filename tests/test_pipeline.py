"""SlamSystem integration test: the full dataflow on a short synthetic run."""

import numpy as np
import pytest

import jax

from lmono_tpu.config import synthetic_config
from lmono_tpu.eval.ate import ate_rmse
from lmono_tpu.io import synthetic as syn
from lmono_tpu.pipeline import SlamSystem
from lmono_tpu.utils.lie import Pose, pose_stack


@pytest.mark.slow
def test_slam_system_short_run(tmp_path):
    cfg = synthetic_config()
    scene = syn.make_city_scene()
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    n = 14
    traj = syn.circuit_trajectory(n)

    system = SlamSystem(cfg, enable_loop=False, enable_mapping=True)
    est = []
    for i in range(n):
        pose_wl = Pose(traj.t[i], traj.q[i])
        scan = syn.simulate_lidar(scene, pose_wl, cfg.lidar, noise_std=0.01,
                                  key=jax.random.PRNGKey(i))
        img = syn.render_camera(
            scene, pose_wl.compose(T_CL.inverse()), cfg.camera)
        out = system.process(scan, img)
        est.append(out["pose"])

    assert out["initialized"]
    gt = Pose(traj.t[:n], traj.q[:n])
    err = ate_rmse(pose_stack(est), gt, align=True)
    assert err < 0.2, f"pipeline ATE {err}"
    # dense map accumulated and exports
    ply = str(tmp_path / "m.ply")
    n_pts = system.save_map(ply)
    assert n_pts > 500
    # stage timers populated
    s = system.timer.summary()
    assert {"lidar", "track", "fuse", "map"} <= set(s.keys())


def test_loop_lane_selects_best_landmarks_when_budget_small():
    """window_points < max_tracks must carry the ALIVE landmarks, not the
    first Kw slot rows (round-1 review: `pts_w[:Kw]` dropped arbitrary
    landmarks)."""
    import dataclasses

    import jax.numpy as jnp

    cfg = synthetic_config()
    cfg = cfg.replace(loop=dataclasses.replace(cfg.loop, window_points=32))
    system = SlamSystem(cfg, enable_loop=True, enable_mapping=False)
    w = system.estimator.state.window
    M = w.feats.alive.shape[0]
    w1 = w.t.shape[0]
    assert cfg.loop.window_points < M

    # only the LAST 40 feature slots are alive/observed — slot-order
    # truncation would select 32 dead rows
    live = jnp.arange(M) >= (M - 40)
    feats = w.feats._replace(
        alive=live,
        obs_mask=jnp.tile(live[:, None], (1, w1)),
        depth_ok=live,
        inv_depth=jnp.full((M,), 0.1),
    )
    w = w._replace(feats=feats, count=jnp.asarray(w1, jnp.int32),
                   initialized=jnp.ones((), bool))

    R, Wh = cfg.lidar.num_rings, cfg.lidar.horiz_res
    scan_points = jnp.zeros((R, Wh, 3))
    scan_valid = jnp.zeros((R, Wh), bool)
    pts_w, norm, uv, sel, sel_pnp = system._extract_landmarks(
        w, scan_points, scan_valid, jnp.zeros(3),
        jnp.asarray([1.0, 0.0, 0.0, 0.0]))
    assert pts_w.shape[0] == cfg.loop.window_points
    assert bool(jnp.all(sel)), "selected landmarks include dead slots"
    assert int(sel_pnp.sum()) == cfg.loop.window_points


@pytest.mark.slow
def test_push_based_streams_match_paired_input():
    """MeasurementManager-parity front: scans/images pushed out of sync —
    images racing ahead, odometry bursts, one dropped scan, one duplicated
    image — must yield the SAME trajectory as feeding the surviving pairs
    directly (pairing is deterministic, so bitwise-equal poses)."""
    cfg = synthetic_config()
    scene = syn.make_city_scene()
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    n = 10
    traj = syn.circuit_trajectory(n)
    frames = []
    for i in range(n):
        pose_wl = Pose(traj.t[i], traj.q[i])
        scan = syn.simulate_lidar(scene, pose_wl, cfg.lidar, noise_std=0.01,
                                  key=jax.random.PRNGKey(i))
        img = syn.render_camera(
            scene, pose_wl.compose(T_CL.inverse()), cfg.camera)
        frames.append((i * 0.1, scan, img))

    DROP_SCAN = 4       # scan 4 never arrives → its image must be discarded

    # --- streamed system: skewed interleaving --------------------------
    sys_stream = SlamSystem(cfg, enable_loop=False, enable_mapping=False)
    outs = []
    for i, (t, scan, img) in enumerate(frames):
        # images race 2 frames ahead of the laser stream
        sys_stream.push_image(t, img)
        if i == 2:
            sys_stream.push_image(t, img)          # duplicated image
        if i >= 2:
            tl, scl, _ = frames[i - 2]
            if i - 2 != DROP_SCAN:
                sys_stream.push_scan(tl, scl)
        outs.extend(sys_stream.process_pending())
    # flush the lagging laser stream
    for j in (n - 2, n - 1):
        t, scan, _ = frames[j]
        sys_stream.push_scan(t, scan)
        outs.extend(sys_stream.process_pending())

    # --- reference system: direct pairs, skipping the dropped frame ----
    sys_direct = SlamSystem(cfg, enable_loop=False, enable_mapping=False)
    ref = []
    for i, (t, scan, img) in enumerate(frames):
        if i == DROP_SCAN:
            continue
        ref.append(sys_direct.process(scan, img, time=t))

    assert len(outs) == len(ref) == n - 1
    assert sys_stream.sync.n_dropped_images >= 1   # dup + orphaned image
    for a, b in zip(outs, ref):
        np.testing.assert_array_equal(np.asarray(a["pose"].t),
                                      np.asarray(b["pose"].t))
        np.testing.assert_array_equal(np.asarray(a["pose"].q),
                                      np.asarray(b["pose"].q))


@pytest.mark.slow
def test_fused_front_matches_per_lane_path():
    """`SlamSystem(fused_front=True)` (one device dispatch per frame) must
    produce the same trajectory as the default per-lane path — the front is
    the composition of the identical step functions, so only XLA fusion
    rounding may differ."""
    cfg = synthetic_config()
    scene = syn.make_city_scene()
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    n = 12
    traj = syn.circuit_trajectory(n)
    frames = []
    for i in range(n):
        pose_wl = Pose(traj.t[i], traj.q[i])
        scan = syn.simulate_lidar(scene, pose_wl, cfg.lidar,
                                  noise_std=0.01, key=jax.random.PRNGKey(i))
        img = syn.render_camera(
            scene, pose_wl.compose(T_CL.inverse()), cfg.camera)
        frames.append((scan, img))

    sys_a = SlamSystem(cfg, enable_loop=True, enable_mapping=True)
    sys_b = SlamSystem(cfg, enable_loop=True, enable_mapping=True,
                       fused_front=True)
    assert sys_b._front is not None
    gap = 0.0
    for scan, img in frames:
        oa = sys_a.process(dict(scan), img)
        ob = sys_b.process(dict(scan), img)
        assert bool(oa["is_keyframe"]) == bool(ob["is_keyframe"])
        assert bool(oa["initialized"]) == bool(ob["initialized"])
        gap = max(gap, float(np.linalg.norm(
            np.asarray(oa["pose"].t) - np.asarray(ob["pose"].t))))
    assert bool(oa["initialized"])
    assert gap < 5e-3, f"fused-front/per-lane pose gap {gap}"
    assert "front" in sys_b.timer.summary()


def test_graph_capacity_growth_preserves_state():
    """The pose graph starts small (512) and doubles on demand; growth must
    preserve nodes, edges, and counters exactly."""
    import dataclasses

    import jax.numpy as jnp

    from lmono_tpu.loop.posegraph import graph_add_loop, graph_add_node
    from lmono_tpu.utils.lie import Pose

    cfg = synthetic_config()
    cfg = cfg.replace(loop=dataclasses.replace(cfg.loop, db_capacity=2048))
    system = SlamSystem(cfg, enable_loop=True, enable_mapping=False)
    assert system._graph_cap == 512

    for i in range(5):
        system.graph = graph_add_node(
            system.graph, Pose(jnp.asarray([float(i), 0.0, 0.0]),
                               jnp.asarray([1.0, 0.0, 0.0, 0.0])))
        system._n_nodes += 1
    system.graph = graph_add_loop(
        system.graph, 0, 4, Pose.identity(), weight=2.5)
    before_t = np.asarray(system.graph.t[:5]).copy()

    system._grow_graph()
    assert system._graph_cap == 1024
    assert system.graph.t.shape[0] == 1024
    np.testing.assert_array_equal(np.asarray(system.graph.t[:5]), before_t)
    assert int(system.graph.n_nodes) == 5
    assert int(system.graph.n_loops) == 1
    assert float(system.graph.loop_w[0]) == 2.5
    assert bool(system.graph.loop_mask[0])
    assert bool(system.graph.seq_mask[3]) and not bool(
        system.graph.seq_mask[5])
