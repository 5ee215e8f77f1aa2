"""LiDAR feature extraction, registration, and end-to-end odometry tests
against the synthetic simulator's exact ground truth."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmono_tpu.config import synthetic_config
from lmono_tpu.eval.ate import ate_rmse
from lmono_tpu.io import synthetic as syn
from lmono_tpu.lidar.features import extract_features
from lmono_tpu.lidar.odometry import LidarOdometry, OdometryState, odometry_step
from lmono_tpu.lidar.registration import register, fit_lines, fit_planes
from lmono_tpu.utils.lie import Pose, pose_stack, so3_exp_quat

CFG = synthetic_config()
SCENE = syn.make_city_scene()


def make_scan(pose, noise=0.0, key=None):
    return syn.simulate_lidar(SCENE, pose, CFG.lidar, noise_std=noise, key=key)


def test_feature_extraction_counts():
    traj = syn.circuit_trajectory(2)
    scan = make_scan(Pose(traj.t[0], traj.q[0]))
    feats = extract_features(scan["points"], scan["ranges"], scan["valid"],
                             CFG.lidar)
    ne, np_ = int(feats.edge_mask.sum()), int(feats.planar_mask.sum())
    assert ne > 30, f"too few edges: {ne}"
    assert np_ > 200, f"too few planars: {np_}"


def test_fit_lines_recovers_direction():
    d = jnp.array([0.0, 0.70710678, 0.70710678])
    t = jnp.linspace(-1, 1, 5)[:, None] * d[None, :] + jnp.array([1.0, 2.0, 3.0])
    nbrs = t[None]  # (1,5,3)
    c, v, ok = fit_lines(nbrs, jnp.ones((1, 5), bool))
    assert bool(ok[0])
    np.testing.assert_allclose(np.abs(np.asarray(v[0]) @ np.asarray(d)), 1.0,
                               atol=1e-4)


def test_fit_planes_recovers_normal():
    n = jnp.array([0.0, 0.0, 1.0])
    key = jax.random.PRNGKey(0)
    xy = jax.random.normal(key, (1, 6, 2))
    pts = jnp.concatenate([xy, jnp.full((1, 6, 1), 2.0)], axis=-1)
    nrm, rho, ok = fit_planes(pts, jnp.ones((1, 6), bool))
    assert bool(ok[0])
    np.testing.assert_allclose(np.abs(np.asarray(nrm[0, 2])), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.abs(np.asarray(rho[0])), 2.0, atol=1e-2)


def test_register_recovers_known_offset():
    """Register a perturbed scan against the map built from the true scan."""
    traj = syn.circuit_trajectory(2)
    true_pose = Pose(traj.t[0], traj.q[0])
    scan = make_scan(true_pose)
    feats = extract_features(scan["points"], scan["ranges"], scan["valid"],
                             CFG.lidar)
    # build "map" = true-pose-transformed features
    ew = true_pose.apply(feats.edge_points)
    pw = true_pose.apply(feats.planar_points)

    # start from a perturbed initial pose
    delta = jnp.array([0.3, -0.2, 0.1])
    dq = so3_exp_quat(jnp.array([0.02, -0.03, 0.05]))
    from lmono_tpu.utils.lie import quat_mul, quat_normalize
    init = Pose(true_pose.t + delta,
                quat_normalize(quat_mul(true_pose.q, dq)))

    refined, diag = register(
        init, feats.edge_points, feats.edge_mask,
        feats.planar_points, feats.planar_mask,
        ew, feats.edge_mask, pw, feats.planar_mask,
        CFG.lidar, iters=10)

    t_err = float(jnp.linalg.norm(refined.t - true_pose.t))
    from lmono_tpu.utils.lie import boxminus
    r_err = float(jnp.linalg.norm(boxminus(true_pose.q, refined.q)))
    assert t_err < 0.03, f"translation error {t_err}"
    assert r_err < 0.005, f"rotation error {r_err}"


@pytest.mark.slow
def test_odometry_end_to_end():
    n_frames = 25
    traj = syn.circuit_trajectory(n_frames)
    odo = LidarOdometry(CFG.lidar)
    est = []
    for i in range(n_frames):
        pose_i = Pose(traj.t[i], traj.q[i])
        key = jax.random.PRNGKey(100 + i)
        scan = make_scan(pose_i, noise=0.01, key=key)
        out = odo.process(jax.device_get(scan))
        est.append(Pose(out["pose"].t, out["pose"].q))
    est_traj = pose_stack(est)
    gt = Pose(traj.t[:n_frames], traj.q[:n_frames])
    # align=False: odometry starts at the true pose (first frame anchored)
    err = ate_rmse(est_traj, gt, align=True)
    assert err < 0.10, f"odometry ATE {err} m"


def test_map_update_every_skips_inserts():
    """`map_update_every > 1` freezes the banks on off-cadence frames
    (after the 10-frame bootstrap) and keeps odometry running."""
    import dataclasses

    cfg = dataclasses.replace(CFG.lidar, map_update_every=3)
    traj = syn.circuit_trajectory(16)
    odo = LidarOdometry(cfg)
    masks = []
    for i in range(14):
        pose_i = Pose(traj.t[i], traj.q[i])
        scan = make_scan(pose_i, noise=0.01, key=jax.random.PRNGKey(i))
        odo.process(jax.device_get(scan))
        masks.append(np.asarray(odo.state.edge_map.mask).sum())
    # frames 0-9 bootstrap (insert every frame); from there only frames
    # with frame % 3 == 0 insert: frame 10 and 11 must not change the bank
    assert masks[10] == masks[9], masks
    assert masks[11] == masks[10], masks
    # frame 12 inserts again
    assert masks[12] >= masks[11], masks
    assert masks[9] > 0
