"""Intrinsic calibration tests: synthetic planar views → recover K + distortion."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera.calibration import (
    calibrate_pinhole,
    find_chessboard_corners,
)
from lmono_tpu.camera.models import _radtan_distort
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
