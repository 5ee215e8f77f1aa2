"""Global SfM (reference initial/SFM.cc rebuild): synthetic window recovery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmono_tpu.estimator.sfm import global_sfm
from lmono_tpu.utils.lie import Pose, so3_exp_quat, quat_rotate_inv


def _make_window(rng, W1=8, M=64, noise=0.0):
    """Camera moving forward-right through a point cloud in front of it."""
    ts = np.arange(W1, dtype=np.float32)
    t = np.stack([0.4 * ts, 0.05 * ts, 0.02 * ts ** 2], -1)
    ang = np.stack([0.005 * ts, 0.01 * ts, 0.002 * ts], -1)
    q = np.asarray(so3_exp_quat(jnp.asarray(ang)))
    pts = rng.uniform([-4, -2, 6], [4, 2, 14], (M, 3)).astype(np.float32)

    obs = np.zeros((M, W1, 2), np.float32)
    mask = np.zeros((M, W1), bool)
    for i in range(W1):
        pose = Pose(jnp.asarray(t[i]), jnp.asarray(q[i]))
        pc = np.asarray(quat_rotate_inv(pose.q[None], jnp.asarray(pts) - pose.t))
        z = pc[:, 2]
        ok = z > 0.5
        uv = pc[:, :2] / np.maximum(z[:, None], 1e-6)
        if noise:
            uv = uv + rng.normal(0, noise, uv.shape).astype(np.float32)
        obs[:, i] = uv
        mask[:, i] = ok & (np.abs(uv) < 1.2).all(-1)
    return jnp.asarray(obs), jnp.asarray(mask), t, q


def test_global_sfm_recovers_geometry():
    rng = np.random.default_rng(3)
    W1 = 8
    obs, mask, t_gt, q_gt = _make_window(rng, W1=W1)
    l = 0
    # global_sfm wants the pose of frame l expressed in the last camera:
    pose_l = Pose(jnp.asarray(t_gt[l]), jnp.asarray(q_gt[l]))
    pose_n = Pose(jnp.asarray(t_gt[-1]), jnp.asarray(q_gt[-1]))
    rel = pose_n.inverse().compose(pose_l)

    res = jax.jit(lambda o, m: global_sfm(o, m, l, rel))(obs, mask)
    assert bool(res.ok)
    assert int(jnp.sum(res.point_ok)) > 32

    # similarity-align recovered trajectory to GT (monocular scale is
    # inherited from rel's translation, so scale should be ~1)
    t_est = np.asarray(res.poses.t)
    # world = frame l ⇒ transform GT into frame l
    T0 = Pose(jnp.asarray(t_gt[l]), jnp.asarray(q_gt[l])).inverse()
    t_ref = np.stack([np.asarray(T0.apply(jnp.asarray(t_gt[i])))
                      for i in range(W1)])
    err = np.linalg.norm(t_est - t_ref, axis=-1)
    assert err.max() < 0.08, err

    # triangulated points should reproject tightly
    ok = np.asarray(res.point_ok)
    X = np.asarray(res.points)[ok]
    pose0 = Pose(res.poses.t[0], res.poses.q[0])
    pc = np.asarray(quat_rotate_inv(pose0.q[None], jnp.asarray(X) - pose0.t))
    uv = pc[:, :2] / pc[:, 2:3]
    gt_uv = np.asarray(obs[:, 0])[ok]
    m0 = np.asarray(mask[:, 0])[ok]
    e = np.linalg.norm(uv - gt_uv, axis=-1)[m0]
    assert np.median(e) < 5e-3


def test_global_sfm_noise_robust():
    rng = np.random.default_rng(11)
    obs, mask, t_gt, q_gt = _make_window(rng, W1=6, M=48, noise=1.0 / 460.0)
    l = 1
    pose_l = Pose(jnp.asarray(t_gt[l]), jnp.asarray(q_gt[l]))
    pose_n = Pose(jnp.asarray(t_gt[-1]), jnp.asarray(q_gt[-1]))
    rel = pose_n.inverse().compose(pose_l)
    res = jax.jit(lambda o, m: global_sfm(o, m, l, rel))(obs, mask)
    assert bool(res.ok)
    t_est = np.asarray(res.poses.t)
    T0 = pose_l.inverse()
    t_ref = np.stack([np.asarray(T0.apply(jnp.asarray(t_gt[i])))
                      for i in range(6)])
    assert np.linalg.norm(t_est - t_ref, axis=-1).max() < 0.15
