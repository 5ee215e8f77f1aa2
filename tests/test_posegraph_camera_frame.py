"""Pose-graph consistency for camera-frame nodes (roll ≈ −90°): loop-edge
residuals must vanish at ground truth — regression for the yaw-decomposition
bug where ypr(rel) was taken in the camera frame."""

import jax.numpy as jnp
import numpy as np

from lmono_tpu.loop.posegraph import (
    PoseGraph,
    _residuals,
    graph_add_loop,
    graph_add_node,
    optimize_posegraph,
)
from lmono_tpu.utils.lie import Pose, mat_to_quat, quat_mul, so3_exp_quat


def camera_pose(x, y, yaw):
    """World-from-camera with the KITTI-style mounting (z forward, y down)."""
    R_yaw = so3_exp_quat(jnp.array([0.0, 0.0, yaw]))
    # columns = camera axes in the body frame: x_cam=(0,-1,0), y_cam=(0,0,-1)
    # (down), z_cam=(1,0,0) (forward) — same mounting as synthetic_T_CL,
    # which decomposes to pitch=0 / roll=-90° (no gimbal lock)
    R_mount = mat_to_quat(jnp.array([
        [0.0, 0.0, 1.0],
        [-1.0, 0.0, 0.0],
        [0.0, -1.0, 0.0],
    ]))
    return Pose(jnp.array([x, y, 1.5]), quat_mul(R_yaw, R_mount))


def test_loop_edge_zero_residual_at_truth():
    N = 12
    g = PoseGraph.empty(N, 4)
    poses = []
    for i in range(N):
        th = 2 * np.pi * i / N
        p = camera_pose(5 * np.cos(th), 5 * np.sin(th), th + np.pi / 2)
        poses.append(p)
        g = graph_add_node(g, p)
    # exact loop edge between node 11 and node 1
    rel = poses[11].between(poses[1])
    g = graph_add_loop(g, 11, 1, rel)
    x = jnp.concatenate([g.t, g.ypr[:, :1]], -1)
    r = _residuals(x, g)
    assert float(jnp.max(jnp.abs(r))) < 1e-3, float(jnp.max(jnp.abs(r)))


def test_camera_frame_graph_corrects_drift():
    N = 24
    g = PoseGraph.empty(N, 4)
    gt = []
    for i in range(N):
        th = 2 * np.pi * i / N
        gt.append(camera_pose(8 * np.cos(th), 8 * np.sin(th), th + np.pi / 2))
    drift = np.linspace(0, 1.0, N)
    for i in range(N):
        p = gt[i]
        g = graph_add_node(g, Pose(p.t + jnp.array([0, drift[i], 0.0]), p.q))
    rel = gt[N - 1].between(gt[0])
    g = graph_add_loop(g, N - 1, 0, rel)
    g2 = optimize_posegraph(g, iters=15, cg_iters=120)
    err_before = np.abs(np.asarray(g.t)[:, 1]
                        - np.stack([np.asarray(p.t) for p in gt])[:, 1]).max()
    err_after = np.linalg.norm(
        np.asarray(g2.t)[:, :2]
        - np.stack([np.asarray(p.t) for p in gt])[:, :2], axis=1).max()
    assert err_after < 0.45 * err_before, (err_before, err_after)
