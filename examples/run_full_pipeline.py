"""Drive the full SLAM system (odometry + fusion + loop + dense map) on the
synthetic world; prints per-stage timings, ATE, and loop statistics.

Covers BASELINE.json configs 2-4 on synthetic data (KITTI replays use the
same SlamSystem via lmono_tpu.io.kitti when data is available).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.config import synthetic_config
from lmono_tpu.eval.ate import ate_rmse, save_tum
from lmono_tpu.io import synthetic as syn
from lmono_tpu.pipeline import SlamSystem
from lmono_tpu.utils.lie import Pose, pose_stack


def main(n_frames: int, loop: bool, mapping: bool, save_ply: str | None):
    cfg = synthetic_config()
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(n_frames)
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))

    sim_lidar = jax.jit(lambda p, k: syn.simulate_lidar(
        scene, p, cfg.lidar, noise_std=0.01, key=k))
    sim_cam = jax.jit(lambda p: syn.render_camera(
        scene, p, cfg.camera))

    system = SlamSystem(cfg, enable_loop=loop, enable_mapping=mapping)
    est, t_total = [], 0.0
    for i in range(n_frames):
        pose_wl = Pose(traj.t[i], traj.q[i])
        scan = sim_lidar(pose_wl, jax.random.PRNGKey(i))
        img = sim_cam(pose_wl.compose(T_CL.inverse()))
        jax.block_until_ready(img)
        t0 = time.perf_counter()
        out = system.process(scan, img)
        t_total += time.perf_counter() - t0
        est.append(out["pose"])
        if i % 20 == 0:
            print(f"frame {i:4d} kf={int(out['is_keyframe'])} "
                  f"init={int(out['initialized'])} "
                  f"tracked={out['n_tracked']} loop={int(out['loop'])}",
                  flush=True)

    est_traj = pose_stack(est)
    gt = Pose(traj.t[:n_frames], traj.q[:n_frames])
    ate = ate_rmse(est_traj, gt, align=True)
    fps = (n_frames - 1) / t_total
    print(f"\nATE RMSE (streaming): {ate:.4f} m over {n_frames} frames")
    if loop:
        final = system.final_trajectory()
        print(f"ATE RMSE (retro-corrected): "
              f"{ate_rmse(final, gt, align=True):.4f} m")
    print(f"throughput: {fps:.2f} frames/s (full pipeline, excl. simulator)")
    print(f"loops closed: {system.n_loops}")
    ex = system.estimator.state.window
    print(f"extrinsic estimate t: {np.asarray(ex.ex_t).round(4)} "
          f"(true {np.asarray(T_CL.t).round(4)})")
    for k, v in system.timer.summary().items():
        print(f"  stage {k:6s}: median {v['median_ms']:8.2f} ms  "
              f"mean {v['mean_ms']:8.2f} ms × {v['count']}")
    save_tum("/tmp/lmono_tpu_full.txt", est_traj)
    if save_ply and mapping:
        n = system.save_map(save_ply)
        print(f"saved {n} map points to {save_ply}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--no-loop", action="store_true")
    ap.add_argument("--no-map", action="store_true")
    ap.add_argument("--ply", type=str, default=None)
    args = ap.parse_args()
    main(args.frames, not args.no_loop, not args.no_map, args.ply)
