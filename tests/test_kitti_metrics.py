"""KITTI devkit metric: drift on known-error trajectories + pose-file IO."""

import numpy as np
import jax.numpy as jnp
import pytest

from lmono_tpu.eval import (kitti_odometry_errors, load_kitti_poses,
                            save_kitti_poses)
from lmono_tpu.utils.lie import Pose, so3_exp_quat


def straight_line(n, speed=1.0):
    t = jnp.stack([speed * jnp.arange(n, dtype=jnp.float32),
                   jnp.zeros(n), jnp.zeros(n)], -1)
    q = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (n, 1))
    return Pose(t, q)


def test_zero_error_on_identical_trajectories():
    gt = straight_line(500)  # 500 m → 100..400 m segments exist
    res = kitti_odometry_errors(gt, gt)
    assert res["segments"], "expected evaluable segments"
    assert res["t_err_pct"] == pytest.approx(0.0, abs=1e-9)
    assert res["r_err_deg_per_m"] == pytest.approx(0.0, abs=1e-9)


def test_known_translation_drift():
    n = 1000
    gt = straight_line(n)
    # estimate runs 1% fast along x: after L meters of gt path the
    # relative-translation error is exactly 0.01*L → 1% drift
    est = Pose(gt.t * 1.01, gt.q)
    res = kitti_odometry_errors(est, gt)
    assert res["t_err_pct"] == pytest.approx(1.0, rel=1e-3)
    assert res["r_err_deg_per_m"] == pytest.approx(0.0, abs=1e-6)


def test_known_rotation_drift():
    n = 600
    gt = straight_line(n)
    # constant yaw-rate error: 0.001 rad per meter travelled
    yaw = 0.001 * np.arange(n, dtype=np.float32)
    q = so3_exp_quat(jnp.stack([jnp.zeros(n), jnp.zeros(n),
                                jnp.asarray(yaw)], -1))
    est = Pose(gt.t, q)
    res = kitti_odometry_errors(est, gt)
    assert res["r_err_deg_per_m"] == pytest.approx(np.rad2deg(0.001),
                                                   rel=1e-2)


def test_kitti_pose_file_roundtrip(tmp_path):
    n = 40
    rng = np.random.default_rng(0)
    t = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    q = so3_exp_quat(jnp.asarray(0.3 * rng.normal(size=(n, 3)), jnp.float32))
    poses = Pose(t, q)
    path = str(tmp_path / "poses.txt")
    save_kitti_poses(path, poses)
    back = load_kitti_poses(path)
    np.testing.assert_allclose(np.asarray(back.t), np.asarray(t), atol=1e-5)
    # quaternion sign is gauge: compare |dot| ≈ 1
    dots = np.abs(np.sum(np.asarray(back.q) * np.asarray(q), axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-5)
