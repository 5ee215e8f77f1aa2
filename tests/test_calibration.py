"""Intrinsic calibration tests: synthetic planar views → recover K + distortion."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera.calibration import (
    calibrate_camera,
    calibrate_pinhole,
    find_chessboard_corners,
)
from lmono_tpu.camera.models import (
    _radtan_distort,
    equidistant_camera,
    mei_camera,
)
from lmono_tpu.utils.lie import Pose, so3_exp_quat


def synth_views(fx=500.0, fy=510.0, cx=320.0, cy=240.0,
                k1=-0.15, k2=0.02, n_views=6, rows=5, cols=7, sq=0.04):
    """Generate exact chessboard corner projections from known K/dist."""
    xx, yy = np.meshgrid(np.arange(cols) * sq, np.arange(rows) * sq)
    obj = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float32)
    obj = obj - obj.mean(0)
    obj3 = jnp.concatenate([jnp.asarray(obj),
                            jnp.zeros((len(obj), 1), jnp.float32)], -1)
    rng = np.random.RandomState(3)
    views = []
    for v in range(n_views):
        rvec = np.array([0.25, 0.25, 0.2]) * rng.uniform(-1, 1, 3)
        tvec = np.array([rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                         rng.uniform(0.35, 0.6)])
        pose = Pose(jnp.asarray(tvec, jnp.float32),
                    so3_exp_quat(jnp.asarray(rvec, jnp.float32)))
        P = pose.apply(obj3)
        xy = P[:, :2] / P[:, 2:3]
        xy_d = xy + _radtan_distort(k1, k2, 0.0, 0.0, xy)
        u = fx * xy_d[:, 0] + cx
        w = fy * xy_d[:, 1] + cy
        views.append(np.stack([np.asarray(u), np.asarray(w)], -1))
    return obj, np.stack(views)


def test_calibration_recovers_intrinsics():
    obj, views = synth_views()
    res = calibrate_pinhole(obj, views, iters=25)
    assert abs(res.fx - 500.0) < 1.0, res.fx
    assert abs(res.fy - 510.0) < 1.0, res.fy
    assert abs(res.cx - 320.0) < 1.5, res.cx
    assert abs(res.cy - 240.0) < 1.5, res.cy
    assert abs(res.dist[0] - (-0.15)) < 0.01, res.dist
    assert res.reproj_rmse < 0.05, res.reproj_rmse


def test_calibration_with_pixel_noise():
    obj, views = synth_views()
    views = views + np.random.RandomState(0).normal(0, 0.2, views.shape)
    res = calibrate_pinhole(obj, views, iters=25)
    assert abs(res.fx - 500.0) < 5.0
    assert res.reproj_rmse < 0.5


def _synth_model_views(cam, n_views=8, rows=6, cols=9, sq=0.05, seed=0,
                       noise=0.1):
    """Project a planar board through an arbitrary camera model."""
    obj = np.stack(np.meshgrid(np.arange(cols), np.arange(rows)),
                   -1).reshape(-1, 2).astype(np.float32) * sq
    obj3 = jnp.concatenate([jnp.asarray(obj),
                            jnp.zeros((len(obj), 1), jnp.float32)], -1)
    rng = np.random.RandomState(seed)
    views = []
    for _ in range(n_views):
        rot = so3_exp_quat(jnp.asarray(rng.uniform(-0.35, 0.35, 3),
                                       jnp.float32))
        t = jnp.asarray([rng.uniform(-0.1, 0.1) - cols * sq / 2,
                         rng.uniform(-0.1, 0.1) - rows * sq / 2,
                         rng.uniform(0.5, 0.9)], jnp.float32)
        uv = cam.space_to_plane(Pose(t, rot).apply(obj3))
        views.append(np.asarray(uv))
    img = np.stack(views)
    return obj, img + rng.normal(0, noise, img.shape)


def test_calibrate_mei():
    """MEI rig recovered to sub-pixel RMSE (reference: the MEI branch of
    `CostFunctionFactory.cc` + `CataCamera::estimateIntrinsics`).  The
    (xi, gamma) pair is only weakly observable from board-FoV views — the
    acceptance metric is reprojection, as for the reference's calibrator."""
    cam = mei_camera(640, 480, gamma1=410.0, gamma2=405.0, u0=325.0,
                     v0=245.0, xi=0.9, k1=-0.1, k2=0.02)
    obj, img = _synth_model_views(cam, seed=1)
    res = calibrate_camera("mei", obj, img, image_size=(640, 480))
    assert res.reproj_rmse < 0.5, res.reproj_rmse
    assert abs(res.params["u0"] - 325.0) < 5.0, res.params
    assert abs(res.params["v0"] - 245.0) < 5.0, res.params


def test_calibrate_equidistant():
    """Kannala–Brandt fisheye recovered (reference: KANNALA_BRANDT branch
    of `CostFunctionFactory.cc`, `EquidistantCamera.cc`)."""
    cam = equidistant_camera(640, 480, mu=300.0, mv=298.0, u0=322.0,
                             v0=242.0, k2=0.01, k3=-0.002)
    obj, img = _synth_model_views(cam, seed=3)
    res = calibrate_camera("equidistant", obj, img, image_size=(640, 480))
    assert res.reproj_rmse < 0.5, res.reproj_rmse
    # the θ-polynomial absorbs small focal deltas over board-FoV views
    # (k's trade off against μ) — allow ~2% on focals, keep c tight
    assert abs(res.params["mu"] - 300.0) < 6.0, res.params
    assert abs(res.params["mv"] - 298.0) < 6.0, res.params
    assert abs(res.params["u0"] - 322.0) < 3.0, res.params
    assert abs(res.params["v0"] - 242.0) < 3.0, res.params


def test_calibrate_camera_pinhole_matches_zhang():
    """The generic sweep path agrees with the Zhang-initialized pinhole
    calibrator on the same views."""
    obj, views = synth_views()
    res = calibrate_camera("pinhole", obj, views, image_size=(640, 480))
    assert res.reproj_rmse < 0.1, res.reproj_rmse
    assert abs(res.params["fx"] - 500.0) < 2.0, res.params


def test_chessboard_detection():
    """Render a synthetic checkerboard and find its inner corners."""
    rows, cols = 4, 6
    sq = 24
    H = (rows + 3) * sq
    W = (cols + 3) * sq
    yy, xx = np.mgrid[0:H, 0:W]
    board = (((xx // sq) + (yy // sq)) % 2).astype(np.float32)
    # border margin of one square
    img = jnp.asarray(board)
    corners, ok = find_chessboard_corners(img, rows, cols)
    assert ok
    # expected inner corners at multiples of sq, offset by 2*sq .. — check
    # each detected corner is within 2px of a lattice point
    c = np.asarray(corners)
    rem = np.abs((c + sq / 2) % sq - sq / 2)
    assert np.percentile(rem, 90) < 2.0, rem.max()
    # grid ordering: first row should have increasing or decreasing x
    first_row = c[:cols]
    dx = np.diff(first_row[:, 0])
    assert (dx > 0).all() or (dx < 0).all()
