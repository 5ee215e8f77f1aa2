"""Run LiDAR-only odometry end-to-end and report ATE + throughput.

Drives config 1 of BASELINE.json ("KITTI 00 LiDAR-only odometry") — on KITTI
data when --kitti-root is given, otherwise on the synthetic city world.

Usage:
    python examples/run_lidar_odometry.py [--frames N] [--kitti-root DIR --seq 0]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import jax
import numpy as np

from lmono_tpu.config import synthetic_config, kitti_config
from lmono_tpu.eval.ate import ate_rmse, save_tum
from lmono_tpu.lidar.odometry import LidarOdometry
from lmono_tpu.utils.lie import Pose, pose_stack


def run_synthetic(n_frames: int):
    from lmono_tpu.io import synthetic as syn

    cfg = synthetic_config()
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(n_frames)
    sim = jax.jit(lambda p, k: syn.simulate_lidar(
        scene, p, cfg.lidar, noise_std=0.01, key=k))

    odo = LidarOdometry(cfg.lidar)
    est = []
    t_total = 0.0
    for i in range(n_frames):
        pose_i = Pose(traj.t[i], traj.q[i])
        scan = sim(pose_i, jax.random.PRNGKey(100 + i))
        jax.block_until_ready(scan)
        t0 = time.perf_counter()
        out = odo.process(scan)
        jax.block_until_ready(out)
        t_total += time.perf_counter() - t0
        est.append(out["pose"])
        if i % 10 == 0:
            print(f"frame {i:4d}  inliers={int(out['inliers'])} "
                  f"cost={float(out['cost']):.4f}", flush=True)
    est_traj = pose_stack(est)
    gt = Pose(traj.t[:n_frames], traj.q[:n_frames])
    ate = ate_rmse(est_traj, gt, align=True)
    fps = (n_frames - 1) / t_total
    print(f"ATE RMSE: {ate:.4f} m over {n_frames} frames")
    print(f"throughput: {fps:.2f} frames/s (excl. simulator)")
    save_tum("/tmp/lmono_tpu_odometry.txt", est_traj)
    return ate, fps


def run_kitti(root: str, seq: int, n_frames: int):
    from lmono_tpu.io.kitti import KittiSequence

    cfg = kitti_config(seq)
    ds = KittiSequence(root, seq, cfg.lidar)
    n = min(n_frames, len(ds)) if n_frames else len(ds)
    odo = LidarOdometry(cfg.lidar)
    est = []
    t_total = 0.0
    for i in range(n):
        frame = ds.frame(i)
        t0 = time.perf_counter()
        out = odo.process(frame["scan"])
        jax.block_until_ready(out)
        t_total += time.perf_counter() - t0
        est.append(out["pose"])
    est_traj = pose_stack(est)
    print(f"throughput: {(n - 1) / t_total:.2f} frames/s")
    if ds.gt_poses is not None:
        # gt is camera-frame; compare translations after alignment
        gt = Pose(ds.gt_poses.t[:n], ds.gt_poses.q[:n])
        print(f"ATE RMSE: {ate_rmse(est_traj, gt, align=True):.4f} m")
    save_tum(f"/tmp/lmono_tpu_kitti{seq:02d}.txt", est_traj)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--kitti-root", type=str, default=None)
    ap.add_argument("--seq", type=int, default=0)
    args = ap.parse_args()
    if args.kitti_root:
        run_kitti(args.kitti_root, args.seq, args.frames)
    else:
        run_synthetic(args.frames)
