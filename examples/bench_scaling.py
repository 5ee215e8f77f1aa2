"""Distributed BA weak-scaling benchmark over a virtual device mesh.

Measures the keyframe-sharded pose-graph GN/CG step (the BASELINE.json
config-5 workload: "keyframe/map-block-partitioned distributed BA") at
1/2/4/8 devices with the problem size per device held constant, reporting
scaling efficiency.  Runs on the forced-CPU 8-device mesh in this container;
the same `make_distributed_step` program runs unchanged on a real multi-chip
slice (the shardings map to ICI collectives).

Usage:  python examples/bench_scaling.py [--nodes-per-dev 512]
"""

import os as _os
import sys as _sys

_os.environ["XLA_FLAGS"] = (_os.environ.get("XLA_FLAGS", "")
                            + " --xla_force_host_platform_device_count=8").strip()

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from lmono_tpu.config import LidarConfig  # noqa: E402
from lmono_tpu.parallel import demo_inputs, make_distributed_step, make_mesh  # noqa: E402
from lmono_tpu.parallel.dist_ba import graph_shardings  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402


def bench(n_devices: int, nodes_per_dev: int, bank_per_dev: int,
          reps: int = 5) -> float:
    mesh = make_mesh(n_devices, axis="kf")
    lidar_cfg = LidarConfig(num_rings=16, horiz_res=256,
                            max_edge_features=128, max_planar_features=256)
    step = make_distributed_step(mesh, lidar_cfg, axis="kf")
    g, pts, rng, valid, query, bank, bank_mask = demo_inputs(
        n_devices, lidar_cfg, nodes_per_dev=nodes_per_dev,
        bank_per_dev=bank_per_dev)
    shard = NamedSharding(mesh, P("kf"))
    g = jax.tree.map(jax.device_put, g, graph_shardings(mesh, "kf"))
    pts, rng, valid, bank, bank_mask = (
        jax.device_put(x, shard) for x in (pts, rng, valid, bank, bank_mask))
    query = jax.device_put(query, NamedSharding(mesh, P()))

    out = step(g, pts, rng, valid, query, bank, bank_mask)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = step(g, pts, rng, valid, query, bank, bank_mask)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes-total", type=int, default=4096)
    ap.add_argument("--bank-total", type=int, default=32768)
    args = ap.parse_args()

    # NOTE: the 8 'devices' here are virtual shards of ONE host CPU, so
    # aggregate throughput cannot grow with device count.  The meaningful
    # quantity on this rig is *partitioning overhead*: time of the sharded
    # program vs the single-shard program on the SAME total problem.  On a
    # real slice the same program's collectives ride ICI and the overhead
    # measured here bounds the scaling loss.
    print(f"{'devices':>8} {'nodes/dev':>10} {'ms/step':>9} "
          f"{'partition overhead':>19}")
    t1 = None
    for n in (1, 2, 4, 8):
        t = bench(n, args.nodes_total // n, args.bank_total // n)
        if t1 is None:
            t1 = t
        ovh = (t - t1) / t1
        print(f"{n:8d} {args.nodes_total // n:10d} {t * 1e3:9.2f} "
              f"{100 * ovh:18.1f}%")


if __name__ == "__main__":
    main()
