"""Distributed SLAM compute step over a device mesh.

Maps the engine's three scale axes onto the mesh (SURVEY §2.6 / §7):

* **kf (time) axis** — pose-graph BA over keyframes: node states are sharded
  along the mesh; the matrix-free CG's Hv products and dot-reductions are
  partitioned by XLA, whose collectives (psum for the dots, halo exchange
  for the i→i+1 edges) ride ICI.
* **map (space) axis** — KNN correspondence over the sharded map bank
  (explicit shard_map; per-device top-k then all-gather merge).
* **dp** — per-scan feature extraction is embarrassingly parallel: a batch
  of scans shards over the same axis.

`distributed_step` is one jitted function combining all three — the function
`__graft_entry__.dryrun_multichip` compiles and runs on an N-device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmono_tpu.config import LidarConfig
from lmono_tpu.lidar.features import extract_features
from lmono_tpu.loop.posegraph import PoseGraph, optimize_posegraph
from lmono_tpu.parallel.dist_knn import sharded_knn


def make_distributed_step(mesh: Mesh, lidar_cfg: LidarConfig,
                          axis: str = "kf"):
    """Build the jitted multi-device step.

    Inputs (with shardings):
      graph arrays     — node-dim sharded over `axis`
      scans batch      — leading (batch) dim sharded over `axis` (dp)
      knn query        — replicated; bank — sharded over `axis`
    """

    def step(graph: PoseGraph, scan_points, scan_ranges, scan_valid,
             query, bank, bank_mask):
        # 1. dp feature extraction over the scan batch
        feats = jax.vmap(
            lambda p, r, v: extract_features(p, r, v, lidar_cfg)
        )(scan_points, scan_ranges, scan_valid)

        # 2. sharded KNN over the map bank
        d2, idx = sharded_knn(mesh, query, bank, bank_mask, k=5, axis=axis)

        # 3. pose-graph BA over sharded keyframe nodes
        graph2 = optimize_posegraph(graph, iters=2, cg_iters=8)

        return {
            "n_edge": jnp.sum(feats.edge_mask),
            "n_planar": jnp.sum(feats.planar_mask),
            "knn_d2": d2,
            "knn_idx": idx,
            "graph_t": graph2.t,
            "graph_ypr": graph2.ypr,
        }

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    in_shardings = (graph_shardings(mesh, axis), shard, shard, shard,
                    repl, shard, shard)
    return jax.jit(step, in_shardings=in_shardings)


def graph_shardings(mesh: Mesh, axis: str = "kf") -> PoseGraph:
    """Sharding pytree for PoseGraph: node arrays sharded, loop edges +
    counters replicated."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return PoseGraph(
        t=shard, ypr=shard, node_mask=shard,
        seq_dt=shard, seq_dyaw=shard, seq_dq=shard, seq_mask=shard,
        loop_i=repl, loop_j=repl, loop_dt=repl, loop_dyaw=repl,
        loop_dq=repl, loop_mask=repl, n_nodes=repl, n_loops=repl,
    )


def demo_inputs(n_devices: int, lidar_cfg: LidarConfig, nodes_per_dev: int = 8,
                bank_per_dev: int = 256):
    """Tiny-shape inputs for the dry run (shapes divisible by the mesh)."""
    N = n_devices * nodes_per_dev
    theta = jnp.linspace(0, 2 * jnp.pi, N)
    g = PoseGraph.empty(N, 16)
    t = jnp.stack([10 * jnp.cos(theta), 10 * jnp.sin(theta),
                   jnp.zeros(N)], -1)
    ypr = jnp.stack([theta + jnp.pi / 2, jnp.zeros(N), jnp.zeros(N)], -1)
    g = g._replace(
        t=t, ypr=ypr, node_mask=jnp.ones(N, bool),
        seq_dt=jnp.tile(jnp.array([[1.0, 0, 0]]), (N, 1)),
        seq_dyaw=jnp.full((N,), float(theta[1] - theta[0])),
        seq_mask=jnp.arange(N) < N - 1,
        n_nodes=jnp.asarray(N, jnp.int32),
    )
    B = n_devices
    R, W = lidar_cfg.num_rings, lidar_cfg.horiz_res
    key = jax.random.PRNGKey(0)
    pts = jax.random.normal(key, (B, R, W, 3)) * 5.0
    rng = jnp.linalg.norm(pts, axis=-1)
    valid = rng > 0.5
    query = jax.random.normal(jax.random.PRNGKey(1), (64, 3))
    bank = jax.random.normal(jax.random.PRNGKey(2),
                             (n_devices, bank_per_dev, 3))
    bank_mask = jnp.ones((n_devices, bank_per_dev), bool)
    return g, pts, rng, valid, query, bank, bank_mask
