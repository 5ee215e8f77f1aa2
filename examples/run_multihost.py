"""Multi-HOST distributed runs: two jax.distributed processes over localhost.

The in-suite mesh tests shard over 8 virtual devices of ONE process; this
script validates the actual multi-host path (SURVEY §7.7: "measure at
1 chip / 1 host / N hosts"): two OS processes, each owning 4 virtual CPU
devices, joined by `jax.distributed.initialize` — cross-process collectives
ride the gRPC transport (the DCN stand-in on this rig; the same program on
a real pod slice rides ICI/DCN unchanged).

Parent mode (default) spawns the two workers for BOTH phases and checks
they succeed:
    python examples/run_multihost.py
Worker mode is internal (`--worker I --port P --mode {ba,engine}`).

What runs:

* phase "ba" — the keyframe-sharded pose-graph BA (halo ppermute crosses
  the process boundary at node 32, the loop-edge all_gather spans all 8
  devices) on a 64-node drifted circuit, asserting the result matches the
  single-device optimizer computed locally in each process.
* phase "engine" — the LIVE composed engine (`dist_fused_step`: odometry
  with space-sharded voxel banks + KLT tracking + landmark-sharded window
  fusion) on a 2-D (kf=4, map=2) mesh whose kf axis SPANS THE PROCESS
  BOUNDARY, rolled over real raycast frames; each worker asserts trajectory
  parity against the single-device `FusedPipeline` computed locally, and
  logs the analytic per-frame cross-process collective volume (VERDICT r3
  #2 — the engine itself crossing a process boundary, not just the solver).
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import subprocess
import sys


def worker(idx: int, port: int, n_proc: int = 2, local_devices: int = 4):
    _os.environ["JAX_PLATFORMS"] = "cpu"
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc, process_id=idx)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding

    from lmono_tpu.loop.posegraph import optimize_posegraph
    from lmono_tpu.parallel.dist_ba import demo_graph, graph_shardings
    from lmono_tpu.parallel.dist_posegraph import make_sharded_posegraph_opt

    devs = jax.devices()
    assert len(devs) == n_proc * local_devices, devs
    mesh = Mesh(np.array(devs), ("kf",))
    nd = len(devs)

    # identical graph constructed in every process (deterministic)
    g = demo_graph(nd, nodes_per_dev=8)
    g_np = jax.tree.map(np.asarray, g)

    def to_global(x_np, sharding):
        return jax.make_array_from_callback(
            x_np.shape, sharding, lambda idx: x_np[idx])

    shardings = graph_shardings(mesh, "kf")
    g_glob = jax.tree.map(to_global, g_np, shardings)

    opt = make_sharded_posegraph_opt(mesh, iters=4, cg_iters=24, axis="kf")
    out = opt(g_glob)
    jax.block_until_ready(out)

    # per-process check against the locally-computed single-device answer
    ref = optimize_posegraph(g, iters=4, cg_iters=24)
    t_local = np.concatenate(
        [np.asarray(s.data) for s in out.t.addressable_shards])
    rows = [s.index[0] for s in out.t.addressable_shards]
    ref_local = np.concatenate([np.asarray(ref.t[r]) for r in rows])
    gap = np.abs(t_local - ref_local).max()
    corr = float(np.linalg.norm(np.asarray(g.t) - np.asarray(ref.t),
                                axis=-1).max())
    print(f"[worker {idx}] devices={nd} gap={gap:.2e} m "
          f"(correction {corr:.2f} m)", flush=True)
    assert gap < max(0.05 * corr, 1e-3), (gap, corr)
    print(f"[worker {idx}] OK", flush=True)


def worker_engine(idx: int, port: int, n_proc: int = 2,
                  local_devices: int = 4, n_frames: int = 14):
    """Run the LIVE composed engine over the 2-process mesh and assert
    trajectory parity with the single-device FusedPipeline."""
    _os.environ["JAX_PLATFORMS"] = "cpu"
    _os.environ["XLA_FLAGS"] = (
        _os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={local_devices}").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=n_proc, process_id=idx)

    import dataclasses
    from functools import partial

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from lmono_tpu.camera import camera_from_config
    from lmono_tpu.config import (CameraConfig, EstimatorConfig, LidarConfig,
                                  SystemConfig, TrackerConfig)
    from lmono_tpu.fused import FusedPipeline, FusedState
    from lmono_tpu.io import synthetic as syn
    from lmono_tpu.parallel.dist_engine import dist_fused_step, fused_specs
    from lmono_tpu.utils.lie import Pose

    devs = jax.devices()
    assert len(devs) == n_proc * local_devices, devs
    kf, mp = 4, 2
    # kf-major reshape: kf rows 0-1 live in process 0, rows 2-3 in process
    # 1 ⇒ every kf-axis collective (the window solve's psums, the feature
    # bookkeeping) crosses the process boundary each frame
    mesh = Mesh(np.array(devs).reshape(kf, mp), ("kf", "map"))

    cfg = SystemConfig(
        lidar=LidarConfig(num_rings=32, horiz_res=512, max_range=60.0,
                          max_edge_features=256, max_planar_features=512,
                          map_edge_capacity=4096, map_planar_capacity=8192,
                          scan_to_map_iters=4),
        camera=CameraConfig(width=256, height=128, fx=128.0, fy=128.0,
                            cx=128.0, cy=64.0),
        tracker=TrackerConfig(max_features=48, min_dist=12,
                              pyramid_levels=2),
        estimator=EstimatorConfig(window_size=6, max_tracks=48, gn_iters=4),
    )
    T_CL = syn.synthetic_T_CL()
    cfg = cfg.replace(laser_to_camera=tuple(
        np.asarray(T_CL.to_mat4()).reshape(-1).tolist()))
    cam = camera_from_config(cfg.camera)

    # deterministic frames, identical in both processes
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(n_frames)
    frames = []
    for i in range(n_frames):
        pw = Pose(traj.t[i], traj.q[i])
        s = syn.simulate_lidar(scene, pw, cfg.lidar, noise_std=0.01,
                               key=jax.random.PRNGKey(50 + i))
        fr = {k: s[k] for k in ("points", "ranges", "valid")}
        fr["image"] = syn.render_camera(scene, pw.compose(T_CL.inverse()),
                                        cfg.camera)
        frames.append(jax.tree.map(np.asarray, fr))

    specs = fused_specs()

    def to_global(x_np, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(
            np.shape(x_np), sh, lambda i: np.asarray(x_np)[i])

    def to_global_tree(value, spec_prefix):
        """Expand a PartitionSpec PREFIX tree over `value` (a P() covering
        a whole subtree replicates every leaf under it) and build global
        arrays leaf-by-leaf."""
        flat, sdef = jax.tree.flatten(spec_prefix,
                                      is_leaf=lambda x: isinstance(x, P))
        subs = sdef.flatten_up_to(value)
        mapped = [jax.tree.map(lambda x, sp=sp: to_global(x, sp), sub)
                  for sp, sub in zip(flat, subs)]
        return jax.tree.unflatten(sdef, mapped)

    state0 = jax.tree.map(np.asarray, FusedState.init(cfg, T_CL))
    state = to_global_tree(state0, specs)

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(specs, P()), out_specs=(specs, P()))
    def step(s, fr):
        return dist_fused_step(s, fr, cam, cfg)

    step = jax.jit(step)

    # analytic per-frame cross-process (DCN) collective volume: the kf axis
    # spans the processes, so each window-solve LM attempt psums the
    # reduced pose system S (P×P) + rhs (P) + 4 cost/scalar reductions,
    # and marginalization psums the same pair once per slide
    Pdim = 6 * (cfg.estimator.window_size + 1) + 6
    per_attempt = (Pdim * Pdim + 2 * Pdim + 8) * 4
    dcn_per_frame = (cfg.estimator.gn_iters + 1) * per_attempt
    print(f"[engine worker {idx}] kf axis spans processes: "
          f"~{dcn_per_frame / 1024:.1f} KB cross-process collectives per "
          f"frame ({cfg.estimator.gn_iters} LM attempts + marginalization, "
          f"{per_attempt} B each)", flush=True)

    fp = FusedPipeline(cfg, cam, T_CL)      # local single-device reference
    gap = 0.0
    for i, fr in enumerate(frames):
        fr_g = jax.tree.map(lambda x: to_global(x, P()), fr)
        state, out = step(state, fr_g)
        o1 = fp.process(fr)
        t_dist = np.asarray(jax.device_get(out["pose_t"].addressable_data(0)))
        gap = max(gap, float(np.linalg.norm(
            t_dist - np.asarray(o1["pose_t"]))))
    assert bool(o1["initialized"]), "engine never initialized"
    print(f"[engine worker {idx}] {n_frames} frames, "
          f"max pose gap vs single-device {gap:.2e} m", flush=True)
    assert gap < 5e-3, gap
    print(f"[engine worker {idx}] OK", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=37231)
    ap.add_argument("--mode", type=str, default="ba",
                    choices=("ba", "engine"))
    args = ap.parse_args()
    if args.worker is not None:
        if args.mode == "engine":
            worker_engine(args.worker, args.port)
        else:
            worker(args.worker, args.port)
        return

    for mode, label in (("ba", "distributed pose-graph BA"),
                        ("engine", "live composed engine")):
        procs = [subprocess.Popen(
            [sys.executable, _os.path.abspath(__file__),
             "--worker", str(i), "--port", str(args.port + (7 if mode ==
                                                            "engine" else 0)),
             "--mode", mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
            for i in range(2)]
        ok = True
        for i, p in enumerate(procs):
            out, _ = p.communicate(timeout=900)
            print(out)
            ok &= (p.returncode == 0)
        if not ok:
            raise SystemExit(f"multihost {mode} run FAILED")
        print(f"multihost {label}: both workers OK "
              "(cross-process collectives verified)", flush=True)


if __name__ == "__main__":
    main()
