"""Run the full SLAM system on a KITTI odometry sequence.

Parity with the reference's launch flow (`kitti_estimator_00.launch` +
rosbag replay): frames stream from the KITTI files through the native
prefetching loader; outputs are TUM trajectories, ATE/RPE against ground
truth, per-stage timings, and a colored PLY map — everything the reference's
four nodes produce, in one process.

Usage:
    python examples/run_kitti.py --root /data/kitti_odometry --seq 0 \
        [--frames N] [--ply out.ply] [--no-loop] [--no-map]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import os
import time

import jax
import numpy as np

from lmono_tpu.config import kitti_config
from lmono_tpu.eval.ate import ate_rmse, rpe, save_tum
from lmono_tpu.eval.kitti_metrics import kitti_odometry_errors, save_kitti_poses
from lmono_tpu.io.kitti import KittiSequence
from lmono_tpu.native import NativeScanLoader
from lmono_tpu.pipeline import SlamSystem
from lmono_tpu.utils.lie import Pose, pose_stack


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=str, required=True)
    ap.add_argument("--seq", type=int, default=0)
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--ply", type=str, default=None)
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--no-map", action="store_true")
    ap.add_argument("--out", type=str, default="/tmp")
    ap.add_argument("--rings", type=int, default=0,
                    help="override scan rings (non-HDL64 / synthetic trees)")
    ap.add_argument("--horiz-res", type=int, default=0)
    args = ap.parse_args(argv)

    import dataclasses

    lidar_cfg = kitti_config().lidar
    if args.rings:
        lidar_cfg = dataclasses.replace(
            lidar_cfg, num_rings=args.rings,
            horiz_res=args.horiz_res or lidar_cfg.horiz_res,
            ring_mode="uniform" if args.rings != 64 else "auto")
    ds = KittiSequence(args.root, args.seq, lidar_cfg)
    # intrinsics + T_CL straight from the sequence's calib.txt (no
    # hand-entered calibration; reference ships per-seq YAML copies
    # instead), plus the per-sequence knob deltas from kitti_config(seq)
    cfg = ds.system_config().replace(lidar=lidar_cfg)
    n = min(args.frames, len(ds)) if args.frames else len(ds)
    print(f"KITTI seq {args.seq:02d}: {n} frames")

    loader = NativeScanLoader(ds.velo_dir, n, cfg.lidar)
    system = SlamSystem(cfg, enable_loop=not args.no_loop,
                        enable_mapping=not args.no_map)

    est = []
    t_total = 0.0
    for i in range(n):
        scan = loader.next()
        if scan is None:
            break
        image = ds.image(i)
        if image is None:
            raise SystemExit(
                "image_0 PNGs not found — install pillow or check paths")
        t0 = time.perf_counter()
        out = system.process(
            {k: scan[k] for k in ("points", "ranges", "valid")},
            image, time=ds.time(i))
        t_total += time.perf_counter() - t0
        est.append(out["pose"])
        if i % 100 == 0:
            print(f"frame {i:5d} kf={int(out['is_keyframe'])} "
                  f"loops={system.n_loops}", flush=True)
    loader.close()

    est_traj = pose_stack(est)
    fps = (len(est) - 1) / max(t_total, 1e-9)
    print(f"throughput: {fps:.2f} frames/s")
    save_tum(os.path.join(args.out, f"kitti{args.seq:02d}_fused.txt"),
             est_traj)
    if ds.gt_poses is not None:
        gt = Pose(ds.gt_poses.t[: len(est)], ds.gt_poses.q[: len(est)])
        print(f"ATE RMSE: {ate_rmse(est_traj, gt, align=True):.4f} m")
        r = rpe(est_traj, gt, delta=10)
        print(f"RPE(10): {r['trans_rmse']:.4f} m / {r['rot_rmse_deg']:.3f}°")
        k = kitti_odometry_errors(est_traj, gt)
        if k["segments"]:
            print(f"KITTI drift: {k['t_err_pct']:.3f} %  /  "
                  f"{k['r_err_deg_per_m'] * 100:.4f} deg/100m")
    save_kitti_poses(
        os.path.join(args.out, f"kitti{args.seq:02d}_fused_kitti.txt"),
        est_traj)
    for k, v in system.timer.summary().items():
        print(f"  stage {k:6s}: median {v['median_ms']:8.2f} ms  "
              f"mean {v['mean_ms']:8.2f} ms × {v['count']}")
    if args.ply and not args.no_map:
        print(f"saved {system.save_map(args.ply)} points to {args.ply}")


if __name__ == "__main__":
    main()
