"""End-to-end fusion estimator tests: rendered images + noisy laser odometry
through the tracker and sliding-window solver, against simulator ground truth."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmono_tpu.camera import pinhole_camera
from lmono_tpu.config import synthetic_config
from lmono_tpu.estimator import FusionEstimator, FeatureTracker
from lmono_tpu.eval.ate import ate_rmse
from lmono_tpu.io import synthetic as syn
from lmono_tpu.utils.lie import (
    Pose,
    boxminus,
    pose_stack,
    quat_conj,
    quat_mul,
    quat_normalize,
    so3_exp_quat,
)

CFG = synthetic_config()
SCENE = syn.make_city_scene()


def _noisy_laser_traj(traj, n, key, t_std=0.01, r_std=0.002):
    """Integrate ground-truth relative motion with per-step noise (odometry
    drift model, like A-LOAM output)."""
    poses = [Pose(traj.t[0], traj.q[0])]
    for i in range(1, n):
        prev_gt = Pose(traj.t[i - 1], traj.q[i - 1])
        cur_gt = Pose(traj.t[i], traj.q[i])
        rel = prev_gt.between(cur_gt)
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        rel_n = Pose(
            rel.t + t_std * jax.random.normal(k1, (3,)),
            quat_normalize(quat_mul(
                rel.q, so3_exp_quat(r_std * jax.random.normal(k2, (3,))))),
        )
        poses.append(poses[-1].compose(rel_n))
    return poses


@pytest.mark.slow
def test_fusion_end_to_end():
    n = 18
    traj = syn.circuit_trajectory(n)
    T_CL = syn.synthetic_T_CL()
    cam_cfg = CFG.camera
    cam = pinhole_camera(cam_cfg.width, cam_cfg.height, cam_cfg.fx,
                         cam_cfg.fy, cam_cfg.cx, cam_cfg.cy)

    ecfg = dataclasses.replace(CFG.estimator, window_size=6, max_tracks=96,
                               estimate_laser=1, fine_times=1000)
    tracker = FeatureTracker(cam, CFG.tracker, cam_cfg.height, cam_cfg.width)
    est = FusionEstimator(ecfg, T_CL, n_tracks=CFG.tracker.max_features)

    laser = _noisy_laser_traj(traj, n, jax.random.PRNGKey(0))
    outs = []
    for i in range(n):
        pose_wl = Pose(traj.t[i], traj.q[i])
        img = syn.render_camera(SCENE, pose_wl.compose(T_CL.inverse()),
                                cam_cfg)
        track = tracker.process(img)
        outs.append(est.process(track, laser[i]))

    assert bool(outs[-1].initialized), "estimator failed to initialize"
    est_traj = pose_stack([o.pose for o in outs])
    gt = Pose(traj.t[:n], traj.q[:n])
    err = ate_rmse(est_traj, gt, align=True)
    laser_traj = pose_stack(laser)
    err_laser = ate_rmse(laser_traj, gt, align=True)
    # under unbiased random-walk odometry noise fusion holds parity (the
    # decisive fusion-wins case is test_fusion_beats_drifting_laser below).
    # measured fused/laser ratio over seeds 0-5 of this exact setup:
    # [1.024, 0.914, 0.960, 0.833, 0.984, 1.095] — mean 0.97, max 1.10;
    # the bound sits just above the observed max (was 1.2 in round 2)
    assert err < max(1.1 * err_laser, 0.05), \
        f"fusion ATE {err} vs laser {err_laser}"
    # extrinsic must not drift away from truth while refining
    ex = outs[-1].extrinsic
    assert float(jnp.linalg.norm(ex.t - T_CL.t)) < 0.08
    assert float(jnp.linalg.norm(boxminus(T_CL.q, ex.q))) < 0.03


def _drifting_laser(traj, n, key, t_std=0.004, r_std=0.0015,
                    yaw_bias=0.002):
    """Laser odometry with a systematic per-step yaw bias — the dominant
    real failure mode of scan-matching odometry (and the error source the
    reference fuses a camera to fix)."""
    poses = [Pose(traj.t[0], traj.q[0])]
    rb = jnp.array([0.0, 0.0, yaw_bias])
    for i in range(1, n):
        prev_gt = Pose(traj.t[i - 1], traj.q[i - 1])
        cur_gt = Pose(traj.t[i], traj.q[i])
        rel = prev_gt.between(cur_gt)
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        rel_n = Pose(
            rel.t + t_std * jax.random.normal(k1, (3,)),
            quat_normalize(quat_mul(rel.q, so3_exp_quat(
                rb + r_std * jax.random.normal(k2, (3,))))),
        )
        poses.append(poses[-1].compose(rel_n))
    return poses


@pytest.mark.slow
def test_fusion_beats_drifting_laser():
    """The reference's raison d'être: visual features must pull systematic
    rotation drift out of the laser odometry.  Fused ATE must beat the
    laser-only ATE decisively (measured ratios 0.14–0.27 across seeds)."""
    n = 40
    traj = syn.circuit_trajectory(n)
    T_CL = syn.synthetic_T_CL()
    cam_cfg = CFG.camera
    cam = pinhole_camera(cam_cfg.width, cam_cfg.height, cam_cfg.fx,
                         cam_cfg.fy, cam_cfg.cx, cam_cfg.cy)
    ecfg = dataclasses.replace(CFG.estimator, window_size=6, max_tracks=96,
                               estimate_laser=1, fine_times=1000)
    tracker = FeatureTracker(cam, CFG.tracker, cam_cfg.height, cam_cfg.width)
    est = FusionEstimator(ecfg, T_CL, n_tracks=CFG.tracker.max_features)

    laser = _drifting_laser(traj, n, jax.random.PRNGKey(0))
    outs = []
    for i in range(n):
        pose_wl = Pose(traj.t[i], traj.q[i])
        img = syn.render_camera(SCENE, pose_wl.compose(T_CL.inverse()),
                                cam_cfg)
        outs.append(est.process(tracker.process(img), laser[i]))

    est_traj = pose_stack([o.pose for o in outs])
    gt = Pose(traj.t[:n], traj.q[:n])
    err = ate_rmse(est_traj, gt, align=True)
    err_laser = ate_rmse(pose_stack(laser), gt, align=True)
    assert err < err_laser, f"fusion {err} did not beat laser {err_laser}"
    assert err < 0.6 * err_laser, \
        f"fusion ATE {err} vs laser {err_laser} — improvement too weak"


@pytest.mark.slow
def test_fusion_keyframe_logic():
    """Static camera (no motion) → frames are non-keyframes once tracking
    is established."""
    n = 8
    T_CL = syn.synthetic_T_CL()
    cam_cfg = CFG.camera
    cam = pinhole_camera(cam_cfg.width, cam_cfg.height, cam_cfg.fx,
                         cam_cfg.fy, cam_cfg.cx, cam_cfg.cy)
    ecfg = dataclasses.replace(CFG.estimator, window_size=4, max_tracks=96,
                               estimate_laser=0)
    tracker = FeatureTracker(cam, CFG.tracker, cam_cfg.height, cam_cfg.width)
    est = FusionEstimator(ecfg, T_CL, n_tracks=CFG.tracker.max_features)
    traj = syn.circuit_trajectory(2)
    pose_wl = Pose(traj.t[0], traj.q[0])
    img = syn.render_camera(SCENE, pose_wl.compose(T_CL.inverse()), cam_cfg)
    kf_flags = []
    for i in range(n):
        track = tracker.process(img)
        out = est.process(track, pose_wl)
        kf_flags.append(bool(out.is_keyframe))
    # after warmup, static frames must not be keyframes
    assert not any(kf_flags[3:]), f"static frames flagged keyframe: {kf_flags}"


@pytest.mark.slow
def test_handeye_calibrates_from_identity():
    """estimate_laser=2 end-to-end (VERDICT r4 #4): starting with NO
    extrinsic, the hand-eye accumulator must converge on rotation-rich
    motion (figure-8 with pitch/roll excitation — yaw-only motion is
    rank-deficient and correctly refused by the σ₂ gate), adopt the
    estimate, and initialize fusion (reference path AxxbSolver.cc:89-147 →
    Estimator.cc:403-430)."""
    # The hand-eye needs ~100 accumulated ~2-5°/frame pairs before the
    # stability gate clears (sharper trajectories break KLT tracking —
    # measured: at 6°/frame the matched-track count collapses within
    # 5 frames and no pairs survive)
    n = 240
    traj = syn.figure8_trajectory(n)
    T_CL = syn.synthetic_T_CL()
    cam_cfg = CFG.camera
    cam = pinhole_camera(cam_cfg.width, cam_cfg.height, cam_cfg.fx,
                         cam_cfg.fy, cam_cfg.cx, cam_cfg.cy)
    # fine_times high: keep refinement live for the whole short run (the
    # seq-2 preset's fine_times=3 freeze is exercised by the TPU eval
    # sweep, which refines to <1° before freezing)
    ecfg = dataclasses.replace(CFG.estimator, window_size=6, max_tracks=96,
                               estimate_laser=2, fine_times=1000)
    tracker = FeatureTracker(cam, CFG.tracker, cam_cfg.height, cam_cfg.width)
    est = FusionEstimator(ecfg, None, n_tracks=CFG.tracker.max_features)

    laser = _noisy_laser_traj(traj, n, jax.random.PRNGKey(2),
                              t_std=0.002, r_std=0.001)
    outs = []
    for i in range(n):
        pose_wl = Pose(traj.t[i], traj.q[i])
        img = syn.render_camera(SCENE, pose_wl.compose(T_CL.inverse()),
                                cam_cfg)
        track = tracker.process(img)
        outs.append(est.process(track, laser[i]))

    he = est.state.handeye
    assert bool(he.converged), "hand-eye did not converge on figure-8"
    dq = quat_mul(quat_conj(T_CL.q), he.q_ex)
    ang = 2 * np.arccos(min(1.0, abs(float(dq[0]))))
    # adoption-grade initial estimate: anywhere inside the BA basin (the
    # ensemble gate fires at the ~5-13° identification floor) ...
    assert np.rad2deg(ang) < 15.0, \
        f"hand-eye rotation error {np.rad2deg(ang):.2f} deg"
    assert bool(outs[-1].initialized), \
        "fusion did not initialize after hand-eye convergence"
    # ... then the window BA's ∂reprojection/∂T_CL refinement tightens it
    # (reference: MonoProjectionFactor.cc:120-135 continuous refinement
    # after CalibrationExRotation seeds the rotation)
    w = est.state.window
    dqw = quat_mul(quat_conj(T_CL.q), w.ex_q)
    angw = 2 * np.arccos(min(1.0, abs(float(dqw[0]))))
    assert np.rad2deg(angw) < 3.0, \
        f"BA-refined extrinsic rotation error {np.rad2deg(angw):.2f} deg"
