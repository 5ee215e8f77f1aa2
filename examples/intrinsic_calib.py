"""Intrinsic calibration CLI — parity with the reference's `Calibrations`
executable (`camera_models/src/intrinsic_calib.cc`): feed chessboard images,
get fx/fy/cx/cy + radtan distortion.

Usage:
    python examples/intrinsic_calib.py --images 'calib/*.png' \
        --rows 6 --cols 9 --square 0.03
    python examples/intrinsic_calib.py --demo      # synthetic self-test
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import glob

import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera.calibration import (
    calibrate_pinhole,
    find_chessboard_corners,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=str, default=None,
                    help="glob of chessboard images")
    ap.add_argument("--rows", type=int, default=6)
    ap.add_argument("--cols", type=int, default=9)
    ap.add_argument("--square", type=float, default=0.03,
                    help="square size in meters")
    ap.add_argument("--demo", action="store_true")
    args = ap.parse_args()

    xx, yy = np.meshgrid(np.arange(args.cols) * args.square,
                         np.arange(args.rows) * args.square)
    obj = np.stack([xx.ravel(), yy.ravel()], -1).astype(np.float32)
    obj -= obj.mean(0)

    if args.demo:
        # synthetic demo: project a known camera, then calibrate it back
        from lmono_tpu.camera.models import _radtan_distort
        from lmono_tpu.utils.lie import Pose, so3_exp_quat
        fx, fy, cx, cy, k1 = 500.0, 505.0, 320.0, 240.0, -0.12
        obj3 = jnp.concatenate([jnp.asarray(obj),
                                jnp.zeros((len(obj), 1), jnp.float32)], -1)
        rng = np.random.RandomState(1)
        views = []
        for _ in range(8):
            pose = Pose(
                jnp.asarray([rng.uniform(-0.05, 0.05),
                             rng.uniform(-0.05, 0.05),
                             rng.uniform(0.4, 0.6)], jnp.float32),
                so3_exp_quat(jnp.asarray(
                    0.3 * rng.uniform(-1, 1, 3), jnp.float32)))
            P = pose.apply(obj3)
            xy = P[:, :2] / P[:, 2:3]
            xy_d = xy + _radtan_distort(k1, 0.0, 0.0, 0.0, xy)
            views.append(np.stack(
                [np.asarray(fx * xy_d[:, 0] + cx),
                 np.asarray(fy * xy_d[:, 1] + cy)], -1))
        res = calibrate_pinhole(obj, np.stack(views))
        print(f"true   : fx=500.0 fy=505.0 cx=320.0 cy=240.0 k1=-0.120")
        print(f"solved : fx={res.fx:.1f} fy={res.fy:.1f} cx={res.cx:.1f} "
              f"cy={res.cy:.1f} k1={res.dist[0]:.3f}")
        print(f"reproj rmse: {res.reproj_rmse:.4f} px")
        return

    paths = sorted(glob.glob(args.images))
    if not paths:
        raise SystemExit(f"no images match {args.images}")
    from lmono_tpu.io.kitti import _read_png
    views = []
    for p in paths:
        img = jnp.asarray(_read_png(p))
        corners, ok = find_chessboard_corners(img, args.rows, args.cols)
        if not ok:
            print(f"skip {p}: chessboard not found")
            continue
        views.append(np.asarray(corners))
        print(f"{p}: {len(corners)} corners")
    if len(views) < 3:
        raise SystemExit("need >= 3 good views")
    res = calibrate_pinhole(obj, np.stack(views))
    print(f"fx={res.fx:.2f} fy={res.fy:.2f} cx={res.cx:.2f} cy={res.cy:.2f}")
    print(f"dist: k1={res.dist[0]:.5f} k2={res.dist[1]:.5f} "
          f"p1={res.dist[2]:.5f} p2={res.dist[3]:.5f}")
    print(f"reproj rmse: {res.reproj_rmse:.3f} px over {len(views)} views")


if __name__ == "__main__":
    main()
