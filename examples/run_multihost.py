"""Multi-HOST distributed BA: two jax.distributed processes over localhost.

The in-suite mesh tests shard over 8 virtual devices of ONE process; this
script validates the actual multi-host path (SURVEY §7.7: "measure at
1 chip / 1 host / N hosts"): two OS processes, each owning 4 virtual CPU
devices, joined by `jax.distributed.initialize` — cross-process collectives
ride the gRPC transport (the DCN stand-in on this rig; the same program on
a real pod slice rides ICI/DCN unchanged).

Parent mode (default) spawns the two workers and checks both succeed:
    python examples/run_multihost.py
Worker mode is internal (`--worker I --port P`).

What runs: the keyframe-sharded pose-graph BA (halo ppermute crosses the
process boundary at node 32, the loop-edge all_gather spans all 8 devices)
on a 64-node drifted circuit, asserting the result matches the single-
device optimizer computed locally in each process.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=int, default=None)
    ap.add_argument("--port", type=int, default=37231)
    args = ap.parse_args()
    if args.worker is not None:
        worker(args.worker, args.port)
        return

    procs = [subprocess.Popen(
        [sys.executable, _os.path.abspath(__file__),
         "--worker", str(i), "--port", str(args.port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        print(out)
        ok &= (p.returncode == 0)
    if not ok:
        raise SystemExit("multihost run FAILED")
    print("multihost distributed BA: both workers OK "
          "(cross-process ppermute/all_gather/psum verified)")


if __name__ == "__main__":
    main()
