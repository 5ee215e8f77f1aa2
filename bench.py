"""Headline benchmark: LiDAR odometry + full-pipeline frames/s per chip on
the synthetic KITTI-like world (BASELINE.json metric: "odometry frames/s/
chip"; VERDICT r1 #2: full SlamSystem throughput reported next to it).

Prints ONE JSON line:
  {"metric": "odometry_fps", "value": N, "unit": "frames/s",
   "vs_baseline": N, "pipeline_fps": N, "pipeline_vs_baseline": N}

vs_baseline is the speedup over the CPU re-run of the identical algorithm
(BASELINE.md: the reference publishes no numbers, so the baseline is the
measured CPU frames/s of this same program on this container's host CPU).
Re-measure it any time with:
    python bench.py --baseline        # writes BASELINE_MEASURED.json
The default run loads that file (host-fingerprinted); without it, the
constants recorded from this container are used.

The timed paths are chunked on-device rollouts (`odometry_scan` and
`fused_chunk`): frames are pre-staged on device and each dispatch advances
CHUNK frames inside one XLA program (`lax.scan`) — how an offline job on a
TPU pod actually runs; per-frame host dispatch would measure the runtime
tunnel, not the machine.  ATE against simulator ground truth is checked on
the same runs (accuracy gate: speed is meaningless if the trajectory is
wrong).  Side diagnostics go to stderr.

--profile writes a jax.profiler trace (device-level timing) to
/tmp/lmono_profile for the two timed regions.
"""

import argparse
import json
import os
import platform
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# --baseline must run on the host CPU.  The container's sitecustomize has
# already imported jax and pinned jax_platforms=axon, so the env var is
# moot; jax.config.update works ONLY while no array has been created yet —
# i.e. it must happen here, before any lmono_tpu import.
if "--baseline" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

# Fallback CPU baselines measured on this container's host, 2026-08-20
# (BASELINE_MEASURED.json — committed — overrides these constants; re-run
# `python bench.py --baseline` to refresh it on a new host).
CPU_BASELINE_FPS = 5.886           # chunked lidar odometry, JAX CPU backend
CPU_BASELINE_PIPELINE_FPS = 2.852  # chunked full pipeline, JAX CPU backend
CPU_BASELINE_SYSTEM_FPS = 1.558    # SlamSystem loop+map, JAX CPU backend

N_FRAMES = 120
CHUNK = 20
WARMUP_CHUNKS = 1
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")


def _host_fingerprint() -> str:
    return f"{platform.node()}|{platform.machine()}|{os.cpu_count()}cpu"


def _stage_frames(cfg, with_images: bool):
    import jax.numpy as jnp

    from lmono_tpu.io import synthetic as syn
    from lmono_tpu.utils.lie import Pose

    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(N_FRAMES)
    T_CL = syn.synthetic_T_CL()
    sim = jax.jit(lambda p, k: syn.simulate_lidar(
        scene, p, cfg.lidar, noise_std=0.01, key=k))
    cam_render = jax.jit(lambda p: syn.render_camera(scene, p, cfg.camera))

    frames = []
    for i in range(N_FRAMES):
        pose = Pose(traj.t[i], traj.q[i])
        s = sim(pose, jax.random.PRNGKey(100 + i))
        fr = {k: s[k] for k in ("points", "ranges", "valid")}
        if with_images:
            fr["image"] = cam_render(pose.compose(T_CL.inverse()))
        jax.block_until_ready(fr)
        frames.append(fr)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    n_chunks = N_FRAMES // CHUNK
    chunks = jax.tree.map(
        lambda x: x[: n_chunks * CHUNK].reshape(
            (n_chunks, CHUNK) + x.shape[1:]), stacked)
    chunk_list = [jax.tree.map(lambda x: x[i], chunks)
                  for i in range(n_chunks)]
    jax.block_until_ready(chunk_list)
    return chunk_list, traj, T_CL, n_chunks


def bench_odometry(cfg, profile_dir=None):
    import jax.numpy as jnp

    from lmono_tpu.eval.ate import ate_rmse
    from lmono_tpu.lidar.odometry import LidarOdometry
    from lmono_tpu.utils.lie import Pose

    chunk_list, traj, _, n_chunks = _stage_frames(cfg, with_images=False)
    odo = LidarOdometry(cfg.lidar)
    outs = [odo.process_chunk(chunk_list[0])]          # warmup/compile
    jax.block_until_ready(outs[0]["pose"].t)

    ctx = (jax.profiler.trace(profile_dir) if profile_dir
           else _nullcontext())
    t0 = time.perf_counter()
    with ctx:
        for i in range(WARMUP_CHUNKS, n_chunks):
            outs.append(odo.process_chunk(chunk_list[i]))
        jax.block_until_ready(outs[-1]["pose"].t)
    dt = time.perf_counter() - t0
    fps = (n_chunks - WARMUP_CHUNKS) * CHUNK / dt

    est = Pose(jnp.concatenate([o["pose"].t for o in outs]),
               jnp.concatenate([o["pose"].q for o in outs]))
    gt = Pose(traj.t[: n_chunks * CHUNK], traj.q[: n_chunks * CHUNK])
    ate = ate_rmse(est, gt, align=True)
    print(f"odometry: {fps:.3f} fps, ATE {ate:.4f} m", file=sys.stderr,
          flush=True)
    assert ate < 0.5, f"odometry ATE gate failed: {ate}"
    return fps


def bench_pipeline(cfg, profile_dir=None):
    import jax.numpy as jnp
    import numpy as np

    from lmono_tpu.camera import camera_from_config
    from lmono_tpu.eval.ate import ate_rmse
    from lmono_tpu.fused import FusedPipeline
    from lmono_tpu.io.synthetic import synthetic_T_CL
    from lmono_tpu.utils.lie import Pose

    T_CL = synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    chunk_list, traj, T_CL, n_chunks = _stage_frames(cfg, with_images=True)
    cam = camera_from_config(cfg.camera)
    fp = FusedPipeline(cfg, cam, T_CL)
    outs = [fp.process_chunk(chunk_list[0])]           # warmup/compile
    jax.block_until_ready(outs[0]["pose_t"])

    ctx = (jax.profiler.trace(profile_dir) if profile_dir
           else _nullcontext())
    t0 = time.perf_counter()
    with ctx:
        for i in range(WARMUP_CHUNKS, n_chunks):
            outs.append(fp.process_chunk(chunk_list[i]))
        jax.block_until_ready(outs[-1]["pose_t"])
    dt = time.perf_counter() - t0
    fps = (n_chunks - WARMUP_CHUNKS) * CHUNK / dt

    est = Pose(jnp.concatenate([o["pose_t"] for o in outs]),
               jnp.concatenate([o["pose_q"] for o in outs]))
    gt = Pose(traj.t[: n_chunks * CHUNK], traj.q[: n_chunks * CHUNK])
    ate = ate_rmse(est, gt, align=True)
    print(f"pipeline: {fps:.3f} fps, ATE {ate:.4f} m", file=sys.stderr,
          flush=True)
    assert ate < 0.5, f"pipeline ATE gate failed: {ate}"
    return fps


def bench_system(cfg):
    """Full SlamSystem frames/s with loop + mapping lanes ENABLED — the
    complete counterpart of the reference's four processes (estimator,
    loop node, map node, odometry).  Per-frame host dispatch included:
    this is the interactive path, not the chunked offline path."""
    import jax.numpy as jnp
    import numpy as np

    from lmono_tpu.eval.ate import ate_rmse
    from lmono_tpu.io.synthetic import synthetic_T_CL
    from lmono_tpu.pipeline import SlamSystem
    from lmono_tpu.utils.lie import Pose, pose_stack

    T_CL = synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    chunk_list, traj, T_CL, n_chunks = _stage_frames(cfg, with_images=True)
    frames = []
    for ch in chunk_list:
        for i in range(CHUNK):
            frames.append(jax.tree.map(lambda x: x[i], ch))
    system = SlamSystem(cfg, enable_loop=True, enable_mapping=True,
                        fused_front=True)

    est = []
    warm = CHUNK  # first chunk of frames = compile warmup
    t0 = None
    for i, fr in enumerate(frames):
        if i == warm:
            t0 = time.perf_counter()
        scan = {k: fr[k] for k in ("points", "ranges", "valid")}
        out = system.process(scan, fr["image"], time=i * 0.1)
        est.append(out["pose"])
    jax.block_until_ready(est[-1].t)
    dt = time.perf_counter() - t0
    fps = (len(frames) - warm) / dt

    gt = Pose(traj.t[: len(frames)], traj.q[: len(frames)])
    ate = ate_rmse(pose_stack(est), gt, align=True)
    print(f"system (loop+map): {fps:.3f} fps, ATE {ate:.4f} m, "
          f"{system.n_loops} loops", file=sys.stderr, flush=True)
    assert ate < 0.5, f"system ATE gate failed: {ate}"
    return fps


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def load_baselines() -> dict:
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            d = json.load(f)
        print(f"baseline: {BASELINE_PATH} ({d.get('host')})",
              file=sys.stderr)
        return d
    print("baseline: built-in constants (run `python bench.py --baseline` "
          "to re-measure)", file=sys.stderr)
    return {"odometry_fps": CPU_BASELINE_FPS,
            "pipeline_fps": CPU_BASELINE_PIPELINE_FPS,
            "system_fps": CPU_BASELINE_SYSTEM_FPS}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--baseline", action="store_true",
                    help="re-measure the CPU baseline on this host and "
                         "write BASELINE_MEASURED.json")
    ap.add_argument("--profile", action="store_true",
                    help="write jax.profiler traces to /tmp/lmono_profile")
    args = ap.parse_args()

    from lmono_tpu.config import synthetic_config

    cfg = synthetic_config()

    if args.baseline:
        jax.config.update("jax_platforms", "cpu")
        assert jax.default_backend() == "cpu", (
            "baseline must run on CPU, got " + jax.default_backend())
        print(f"measuring CPU baseline on {_host_fingerprint()} …",
              file=sys.stderr, flush=True)
        odo_fps = bench_odometry(cfg)
        pipe_fps = bench_pipeline(cfg)
        sys_fps = bench_system(cfg)
        out = {"host": _host_fingerprint(),
               "backend": str(jax.devices()[0].platform),
               "odometry_fps": round(odo_fps, 3),
               "pipeline_fps": round(pipe_fps, 3),
               "system_fps": round(sys_fps, 3)}
        with open(BASELINE_PATH, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({"metric": "cpu_baseline", **out}), flush=True)
        return

    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)
    base = load_baselines()
    prof = "/tmp/lmono_profile" if args.profile else None
    odo_fps = bench_odometry(cfg, profile_dir=(
        prof + "/odometry" if prof else None))
    pipe_fps = bench_pipeline(cfg, profile_dir=(
        prof + "/pipeline" if prof else None))
    sys_fps = bench_system(cfg)
    if prof:
        print(f"profiler traces: {prof}", file=sys.stderr)

    out = {
        "metric": "odometry_fps",
        "value": round(odo_fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(odo_fps / base["odometry_fps"], 3),
        "pipeline_fps": round(pipe_fps, 3),
        "pipeline_vs_baseline": round(
            pipe_fps / base["pipeline_fps"], 3),
        "system_fps": round(sys_fps, 3),
    }
    if "system_fps" in base:
        out["system_vs_baseline"] = round(sys_fps / base["system_fps"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
