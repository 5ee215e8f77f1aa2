"""Chunked odometry rollout (`odometry_scan`) must match per-frame stepping."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.config import synthetic_config
from lmono_tpu.io import synthetic as syn
from lmono_tpu.lidar.odometry import LidarOdometry, OdometryState, odometry_scan
from lmono_tpu.utils.lie import Pose


def test_chunked_rollout_matches_per_frame():
    cfg = synthetic_config()
    scene = syn.make_city_scene()
    n = 6
    traj = syn.circuit_trajectory(n)
    sim = jax.jit(lambda p, k: syn.simulate_lidar(
        scene, p, cfg.lidar, noise_std=0.01, key=k))
    scans = [sim(Pose(traj.t[i], traj.q[i]), jax.random.PRNGKey(100 + i))
             for i in range(n)]

    # per-frame (non-donated jit: reuse inputs safely)
    state = OdometryState.init(cfg.lidar)
    step = jax.jit(lambda s, sc: __import__(
        "lmono_tpu.lidar.odometry", fromlist=["odometry_step"]
    ).odometry_step(s, sc, cfg.lidar))
    poses = []
    for s in scans:
        state, out = step(state, s)
        poses.append(out["pose"])

    # chunked
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *scans)
    state2 = OdometryState.init(cfg.lidar)
    state2, outs = jax.jit(
        lambda st, sc: odometry_scan(st, sc, cfg.lidar))(state2, stacked)

    for i in range(n):
        np.testing.assert_allclose(np.asarray(outs["pose"].t[i]),
                                   np.asarray(poses[i].t), atol=1e-5)
        np.testing.assert_allclose(np.asarray(outs["pose"].q[i]),
                                   np.asarray(poses[i].q), atol=1e-5)
    # final states agree too
    np.testing.assert_allclose(np.asarray(state2.pose.t),
                               np.asarray(state.pose.t), atol=1e-5)
    assert int(state2.frame) == n
