"""Tests for corners, LK tracking, RANSAC, and the full tracker front-end."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera import pinhole_camera
from lmono_tpu.config import synthetic_config
from lmono_tpu.estimator.tracker import FeatureTracker, TrackerState, tracker_step
from lmono_tpu.io import synthetic as syn
from lmono_tpu.ops.corners import detect_grid
from lmono_tpu.ops.image import bilinear_sample, build_pyramid, scharr_gradients
from lmono_tpu.ops.lk import track_fb
from lmono_tpu.ops.ransac import ransac_fundamental, ransac_pnp
from lmono_tpu.utils.lie import Pose, so3_exp_quat

CFG = synthetic_config()


def noise_image(key, H=128, W=160):
    """Smooth random texture with plenty of corners."""
    base = jax.random.normal(key, (H // 8, W // 8))
    img = jax.image.resize(base, (H, W), "bicubic")
    img = img + 0.3 * jax.image.resize(
        jax.random.normal(jax.random.PRNGKey(5), (H // 2, W // 2)), (H, W),
        "bicubic")
    img = (img - img.min()) / (img.max() - img.min())
    return img


def shift_image(img, dx, dy):
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    coords = jnp.stack([xx + dx, yy + dy], axis=-1)
    return bilinear_sample(img, coords)


def test_detect_grid_finds_spaced_corners():
    img = noise_image(jax.random.PRNGKey(0))
    uv, ok = detect_grid(img, cell=16, max_new=64,
                         occupied_uv=jnp.zeros((64, 2)),
                         occupied_mask=jnp.zeros(64, bool))
    assert int(ok.sum()) > 20
    pts = np.asarray(uv[np.asarray(ok)])
    # one corner per cell → no two in the same cell
    cells = {(int(x) // 16, int(y) // 16) for x, y in pts}
    assert len(cells) == len(pts)


def test_lk_recovers_known_shift():
    img0 = noise_image(jax.random.PRNGKey(1))
    dx, dy = 3.7, -2.4
    img1 = shift_image(img0, dx, dy)  # img1(x) = img0(x + d) → flow = -d
    uv, ok = detect_grid(img0, 16, 48, jnp.zeros((48, 2)), jnp.zeros(48, bool))
    pyr0 = build_pyramid(img0, 3)
    pyr1 = build_pyramid(img1, 3)
    g0 = [scharr_gradients(p) for p in pyr0]
    g1 = [scharr_gradients(p) for p in pyr1]
    pts1, ok2 = track_fb(pyr0, g0, pyr1, g1, uv, ok, patch=15, iters=12,
                         fb_thresh=0.5)
    ok2 = np.asarray(ok2)
    assert ok2.sum() > 15
    flow = np.asarray(pts1 - uv)[ok2]
    np.testing.assert_allclose(flow.mean(0), [-dx, -dy], atol=0.15)


def test_ransac_fundamental_rejects_outliers():
    key = jax.random.PRNGKey(2)
    N = 100
    # planar-ish scene seen by two cameras with pure translation
    X = jnp.concatenate([
        jax.random.uniform(key, (N, 2), minval=-2, maxval=2),
        jax.random.uniform(jax.random.PRNGKey(3), (N, 1), minval=4, maxval=12),
    ], axis=-1)
    t = jnp.array([0.5, 0.1, 0.2])
    x0 = X[:, :2] / X[:, 2:3]
    X1 = X - t
    x1 = X1[:, :2] / X1[:, 2:3]
    # corrupt 20 correspondences
    bad = jnp.arange(N) < 20
    x1 = jnp.where(bad[:, None], x1 + 0.3, x1)
    x1 = jax.random.permutation(jax.random.PRNGKey(4), x1) * 0 + x1  # no-op keep
    inl, F = ransac_fundamental(x0, x1, jnp.ones(N, bool),
                                jax.random.PRNGKey(5), iters=128,
                                thresh=(1.0 / 460) ** 2)
    inl = np.asarray(inl)
    assert inl[20:].mean() > 0.9, "lost good matches"
    assert inl[:20].sum() == 0, "kept outliers"


def test_ransac_pnp_recovers_pose():
    key = jax.random.PRNGKey(6)
    N = 60
    Xw = jnp.concatenate([
        jax.random.uniform(key, (N, 2), minval=-3, maxval=3),
        jax.random.uniform(jax.random.PRNGKey(7), (N, 1), minval=5, maxval=15),
    ], axis=-1)
    true = Pose(jnp.array([0.3, -0.2, 0.5]),
                so3_exp_quat(jnp.array([0.05, 0.1, -0.08])))
    Pc = true.apply(Xw)
    x = Pc[:, :2] / Pc[:, 2:3]
    bad = jnp.arange(N) >= 50
    x = jnp.where(bad[:, None], x + 0.2, x)
    pose, inl, ok = ransac_pnp(Xw, x, jnp.ones(N, bool),
                               jax.random.PRNGKey(8), iters=128,
                               thresh=(2.0 / 460) ** 2)
    assert bool(ok)
    assert np.asarray(inl)[:50].mean() > 0.9
    np.testing.assert_allclose(np.asarray(pose.t), np.asarray(true.t), atol=0.02)


def test_tracker_two_rendered_views():
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(3)
    T_CL = syn.synthetic_T_CL()
    cam_cfg = CFG.camera
    cam = pinhole_camera(cam_cfg.width, cam_cfg.height, cam_cfg.fx,
                         cam_cfg.fy, cam_cfg.cx, cam_cfg.cy)
    tracker = FeatureTracker(cam, CFG.tracker, cam_cfg.height, cam_cfg.width)
    alive_counts = []
    for i in range(3):
        pose_wc = Pose(traj.t[i], traj.q[i]).compose(T_CL.inverse())
        img = syn.render_camera(scene, pose_wc, cam_cfg)
        out = tracker.process(img)
        alive_counts.append(int(out.alive.sum()))
    assert alive_counts[0] > 40, f"detection too weak: {alive_counts}"
    assert alive_counts[1] > 30, f"tracking lost features: {alive_counts}"
    # ids persist across frames for tracked features
    out_ids = np.asarray(out.ids[np.asarray(out.track_cnt >= 2)])
    assert len(out_ids) > 20


def test_small_linalg_helpers():
    """Hand-rolled small linear algebra (replacing LAPACK custom calls on
    TPU) matches numpy references."""
    from lmono_tpu.ops.ransac import (_chol_solve6, _det3, _inv3,
                                      _polar3, _qr_nullvec)

    rng = np.random.RandomState(0)
    # SPD 6x6 solve
    for _ in range(5):
        A = rng.randn(6, 6)
        H = A @ A.T + 0.1 * np.eye(6)
        g = rng.randn(6)
        x = np.asarray(_chol_solve6(jnp.asarray(H, jnp.float32),
                                    jnp.asarray(g, jnp.float32)))
        np.testing.assert_allclose(x, np.linalg.solve(H, g), rtol=2e-3,
                                   atol=2e-4)
    # QR nullspace of (m, m+1) and rank-deficient (m, m)
    B = rng.randn(8, 9)
    v = np.asarray(_qr_nullvec(jnp.asarray(B, jnp.float32)))
    assert np.linalg.norm(B @ v) < 1e-4
    C = rng.randn(12, 12)
    C[-1] = C[:-1].T @ rng.randn(11)         # make rank 11
    v2 = np.asarray(_qr_nullvec(jnp.asarray(C, jnp.float32)))
    # smallest-singular direction: residual tiny relative to ||C||
    assert np.linalg.norm(C @ v2) / np.linalg.norm(C) < 1e-3
    # det / inv / polar
    M = rng.randn(3, 3)
    np.testing.assert_allclose(np.asarray(_det3(jnp.asarray(M, jnp.float32))),
                               np.linalg.det(M), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(_inv3(jnp.asarray(M, jnp.float32))),
                               np.linalg.inv(M), rtol=1e-3, atol=1e-4)
    R_true, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(R_true) < 0:
        R_true[:, 0] *= -1
    M2 = R_true * 2.5                        # rotation times scale
    R, s = _polar3(jnp.asarray(M2, jnp.float32))
    np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-4)
    np.testing.assert_allclose(float(s), 2.5, rtol=1e-4)
