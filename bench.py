"""Headline benchmark: LiDAR odometry frames/s per chip on the synthetic
KITTI-like world (BASELINE.json metric: "odometry frames/s/chip").

Prints ONE JSON line:
  {"metric": "odometry_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N}

vs_baseline is the speedup over the CPU re-run of the identical algorithm
(BASELINE.md: the reference publishes no numbers, so the baseline is the
measured CPU frames/s of this same pipeline = 1.249 fps, measured on this
container's CPU with the synthetic 32-ring config).

Side diagnostics (ATE, stage breakdown) go to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

CPU_BASELINE_FPS = 2.320  # measured: same code, JAX CPU backend, this host

N_FRAMES = 60
WARMUP = 3


def main():
    from lmono_tpu.config import synthetic_config
    from lmono_tpu.eval.ate import ate_rmse
    from lmono_tpu.io import synthetic as syn
    from lmono_tpu.lidar.odometry import LidarOdometry
    from lmono_tpu.utils.lie import Pose, pose_stack

    cfg = synthetic_config()
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(N_FRAMES)
    sim = jax.jit(lambda p, k: syn.simulate_lidar(
        scene, p, cfg.lidar, noise_std=0.01, key=k))

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    scans = []
    for i in range(N_FRAMES):
        s = sim(Pose(traj.t[i], traj.q[i]), jax.random.PRNGKey(100 + i))
        jax.block_until_ready(s)
        scans.append(s)

    odo = LidarOdometry(cfg.lidar)
    est = []
    for i in range(WARMUP):
        est.append(odo.process(scans[i])["pose"])

    t0 = time.perf_counter()
    for i in range(WARMUP, N_FRAMES):
        out = odo.process(scans[i])
        est.append(out["pose"])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = (N_FRAMES - WARMUP) / dt

    est_traj = pose_stack(est)
    gt = Pose(traj.t[:N_FRAMES], traj.q[:N_FRAMES])
    ate = ate_rmse(est_traj, gt, align=True)
    print(f"ATE RMSE: {ate:.4f} m over {N_FRAMES} frames", file=sys.stderr)
    print(f"fps: {fps:.3f}  (cpu baseline {CPU_BASELINE_FPS})",
          file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "odometry_fps",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / CPU_BASELINE_FPS, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
