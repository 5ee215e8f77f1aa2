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
# system row: >1 lap of the circuit (lap = 2π·32 m / 0.8 m per frame ≈ 252
# frames) so the second lap actually revisits lap-1 keyframes and loop
# closures fire INSIDE the timed region (VERDICT r3 #1)
N_SYS_FRAMES = 340
CHUNK = 20
WARMUP_CHUNKS = 1
BASELINE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BASELINE_MEASURED.json")


def _host_fingerprint() -> str:
    return f"{platform.node()}|{platform.machine()}|{os.cpu_count()}cpu"


def _stage_frames(cfg, with_images: bool, n_frames: int = N_FRAMES):
    import jax.numpy as jnp

    from lmono_tpu.io import synthetic as syn
    from lmono_tpu.utils.lie import Pose

    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(n_frames)
    T_CL = syn.synthetic_T_CL()
    sim = jax.jit(lambda p, k: syn.simulate_lidar(
        scene, p, cfg.lidar, noise_std=0.01, key=k))
    cam_render = jax.jit(lambda p: syn.render_camera(scene, p, cfg.camera))

    frames = []
    for i in range(n_frames):
        pose = Pose(traj.t[i], traj.q[i])
        s = sim(pose, jax.random.PRNGKey(100 + i))
        fr = {k: s[k] for k in ("points", "ranges", "valid")}
        if with_images:
            fr["image"] = cam_render(pose.compose(T_CL.inverse()))
        jax.block_until_ready(fr)
        frames.append(fr)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
    n_chunks = n_frames // CHUNK
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
    loop node, map node, odometry).

    Driven through `SlamSystem.process_chunk`: front + dense-map merge +
    loop-landmark extraction compile into ONE scanned program per chunk and
    the keyframe-rate loop lane dispatches asynchronously between chunks —
    the TPU-shaped equivalent of the reference's four overlapping
    free-running processes (its throughput also comes from overlap, not
    from any lane being synchronous, `estimator_node.cc:59-66`).

    The trajectory runs >1 lap of the circuit so second-lap keyframes
    revisit lap-1 ones and closures fire INSIDE the timed region; ATE is
    gated on the retro-corrected `final_trajectory` and the run must close
    ≥1 loop."""
    import jax.numpy as jnp
    import numpy as np

    from lmono_tpu.eval.ate import ate_rmse
    from lmono_tpu.io.synthetic import synthetic_T_CL
    from lmono_tpu.pipeline import SlamSystem
    from lmono_tpu.utils.lie import Pose

    T_CL = synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    chunk_list, traj, T_CL, n_chunks = _stage_frames(
        cfg, with_images=True, n_frames=N_SYS_FRAMES)
    system = SlamSystem(cfg, enable_loop=True, enable_mapping=True)

    # warmup: first chunk compiles the chunk program + loop-lane programs
    system.process_chunk(chunk_list[0], t0=0.0)
    jax.block_until_ready(system.estimator.state.window.t)

    t0 = time.perf_counter()
    for i in range(WARMUP_CHUNKS, n_chunks):
        system.process_chunk(chunk_list[i], t0=i * CHUNK * 0.1)
    system._reap_loops()
    jax.block_until_ready(system.estimator.state.window.t)
    dt = time.perf_counter() - t0
    n_timed = (n_chunks - WARMUP_CHUNKS) * CHUNK
    fps = n_timed / dt

    from lmono_tpu.utils.lie import pose_stack

    est = system.final_trajectory()
    n = n_chunks * CHUNK
    gt = Pose(traj.t[:n], traj.q[:n])
    ate = ate_rmse(est, gt, align=True)
    # raw (loop-uncorrected) ATE over the SAME frames: the honest
    # did-closures-help comparison (the 120-frame pipeline row is a
    # different trajectory length and not comparable)
    ate_raw = ate_rmse(pose_stack(system._raw_poses), gt, align=True)
    print(f"system (loop+map): {fps:.3f} fps, ATE {ate:.4f} m "
          f"(raw {ate_raw:.4f} m without closures), "
          f"{system.n_loops} loops", file=sys.stderr, flush=True)
    # gates: the corrected trajectory must be sane AND closures must not
    # hurt (raw drift varies ~2x run-to-run with world noise; an absolute
    # 0.5 m gate on the corrected ATE was one bad draw from flaking)
    assert ate < 0.6, f"system ATE gate failed: {ate}"
    assert ate <= ate_raw * 1.05, (
        f"loop closures degraded ATE: {ate} vs raw {ate_raw}")
    assert system.n_loops >= 1, (
        "system bench closed no loops — the revisit lap must fire closures")
    return fps, system.n_loops, float(ate), float(ate_raw)


def bench_kitti_scale(n_frames: int = 1000):
    """KITTI-TRUE-scale engine row (VERDICT r3 #3): the FULL system (loop +
    map lanes on) at `kitti_scale_config` shapes — HDL-64 64×2048 scans,
    120 m range, 1241×376 images, 150 features, window 10, full bank/DB
    capacities — over a ≥1000-frame synthetic sequence (~4 laps of the
    circuit, so closures fire at scale too).

    Frames are GENERATED on the fly per chunk (staging 1000 full-scale
    frames would hold ~4 GB of HBM for no reason); only `process_chunk`
    time is in the fps clock.  Reports devkit translational drift %
    (`eval/kitti_metrics.py`) on the retro-corrected trajectory and the
    device HBM high-water mark."""
    import jax.numpy as jnp
    import numpy as np

    from lmono_tpu.config import kitti_scale_config
    from lmono_tpu.eval.kitti_metrics import kitti_odometry_errors
    from lmono_tpu.io import synthetic as syn
    from lmono_tpu.pipeline import SlamSystem
    from lmono_tpu.utils.lie import Pose

    cfg = kitti_scale_config()
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(n_frames)
    sim = jax.jit(lambda p, k: syn.simulate_lidar(
        scene, p, cfg.lidar, noise_std=0.01, key=k))
    cam_render = jax.jit(lambda p: syn.render_camera(scene, p, cfg.camera))

    def gen_chunk(i0: int):
        frames = []
        for i in range(i0, i0 + CHUNK):
            pose = Pose(traj.t[i], traj.q[i])
            s = sim(pose, jax.random.PRNGKey(300 + i))
            fr = {k: s[k] for k in ("points", "ranges", "valid")}
            fr["image"] = cam_render(pose.compose(T_CL.inverse()))
            frames.append(fr)
        ch = jax.tree.map(lambda *xs: jnp.stack(xs), *frames)
        jax.block_until_ready(ch)
        return ch

    system = SlamSystem(cfg, enable_loop=True, enable_mapping=True)
    n_chunks = n_frames // CHUNK
    system.process_chunk(gen_chunk(0), t0=0.0)        # warmup/compile
    jax.block_until_ready(system.estimator.state.window.t)

    t_proc = 0.0
    for i in range(WARMUP_CHUNKS, n_chunks):
        ch = gen_chunk(i * CHUNK)
        t0 = time.perf_counter()
        system.process_chunk(ch, t0=i * CHUNK * 0.1)
        jax.block_until_ready(system.estimator.state.window.t)
        t_proc += time.perf_counter() - t0
    t0 = time.perf_counter()
    system._reap_loops()
    t_proc += time.perf_counter() - t0
    fps = (n_chunks - WARMUP_CHUNKS) * CHUNK / t_proc

    est = system.final_trajectory()
    n = n_chunks * CHUNK
    gt = Pose(traj.t[:n], traj.q[:n])
    errs = kitti_odometry_errors(est, gt)
    mem = {}
    try:
        ms = jax.local_devices()[0].memory_stats() or {}
        if ms.get("peak_bytes_in_use", 0) > 0:
            mem = {"hbm_peak_gb": round(ms["peak_bytes_in_use"] / 2**30, 3),
                   "hbm_limit_gb": round(ms.get("bytes_limit", 0) / 2**30,
                                         3)}
        # (the axon remote plugin reports no memory stats — omit zeros)
    except Exception:
        pass
    print(f"kitti-scale: {fps:.3f} fps, drift {errs['t_err_pct']:.3f} %, "
          f"rot {errs['r_err_deg_per_m']:.5f} deg/m, "
          f"{system.n_loops} loops, hbm {mem}", file=sys.stderr, flush=True)
    return {"kitti_scale_fps": round(fps, 3),
            "kitti_scale_drift_pct": round(float(errs["t_err_pct"]), 4),
            "kitti_scale_loops": system.n_loops, **mem}


class _nullcontext:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def check_regression(out: dict) -> dict:
    """Perf-regression gate (VERDICT r3 #7): compare this run against the
    newest committed BENCH_r*.json and flag >10% drops LOUDLY.  Returns a
    dict of per-metric relative deltas for the JSON line."""
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    benches = sorted(glob.glob(os.path.join(here, "BENCH_r*.json")),
                     key=lambda p: int(re.search(r"r(\d+)", p).group(1)))
    if not benches:
        return {}
    with open(benches[-1]) as f:
        prev_doc = json.load(f)
    prev = prev_doc.get("parsed", prev_doc)
    deltas = {}
    pairs = [("odometry_fps", out.get("value")),
             ("pipeline_fps", out.get("pipeline_fps")),
             ("system_fps", out.get("system_fps"))]
    for key, cur in pairs:
        ref = prev.get("value" if key == "odometry_fps" else key)
        if not (isinstance(ref, (int, float)) and ref > 0 and cur):
            continue
        rel = cur / ref - 1.0
        deltas[key] = round(rel, 4)
        if rel < -0.10:
            print(f"PERF REGRESSION: {key} {cur:.2f} vs "
                  f"{os.path.basename(benches[-1])} {ref:.2f} "
                  f"({100*rel:+.1f}% — gate is -10%)",
                  file=sys.stderr, flush=True)
    return deltas


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
    ap.add_argument("--skip-kitti-scale", action="store_true",
                    help="skip the KITTI-true-scale row (64×2048 scans, "
                         "1000 frames)")
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
        sys_fps = bench_system(cfg)[0]
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
    sys_fps, n_loops, sys_ate, sys_ate_raw = bench_system(cfg)
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
        "system_loops": n_loops,
        "system_ate_m": round(sys_ate, 4),
        "system_ate_raw_m": round(sys_ate_raw, 4),
    }
    if "system_fps" in base:
        out["system_vs_baseline"] = round(sys_fps / base["system_fps"], 3)
    if not args.skip_kitti_scale:
        out.update(bench_kitti_scale())
    deltas = check_regression(out)
    if deltas:
        out["vs_prev_round"] = deltas
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
