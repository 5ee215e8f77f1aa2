"""Distributed SLAM compute step over a device mesh.

Maps the engine's scale axes onto the mesh (SURVEY §2.6 / §7) with
*explicit* collectives (shard_map) — no GSPMD auto-partitioning hope:

* **kf (time) axis** — pose-graph BA over keyframes
  (`dist_posegraph.make_sharded_posegraph_opt`): halo ppermute for i→i+1
  edges, all_gather for loop endpoints, psum'd CG dots.
* **landmark axis** — sliding-window fusion BA
  (`dist_window.make_sharded_solve`): per-device residual/Jacobian assembly
  and local Schur elimination of depths, psum-reduced pose system — the
  collective form of the reference's serial DENSE_SCHUR
  (`mono_lidar_mapping/src/image_process/Estimator.cc:1124-1305`).
* **map (space) axis** — KNN correspondence over the sharded map bank
  (`dist_knn.sharded_knn`: per-device top-k, all-gather merge).
* **dp** — per-scan feature extraction over a batch of scans.

`make_distributed_step` combines all four in one jitted function;
`__graft_entry__.dryrun_multichip` runs it on an N-device mesh and asserts
the sharded results match the single-device algorithms (allclose, not just
shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmono_tpu.config import EstimatorConfig, LidarConfig
from lmono_tpu.lidar.features import extract_features
from lmono_tpu.loop.posegraph import (
    PoseGraph,
    graph_add_loop,
    graph_add_node,
)
from lmono_tpu.parallel.dist_knn import sharded_knn
from lmono_tpu.parallel.dist_posegraph import make_sharded_posegraph_opt
from lmono_tpu.parallel.dist_window import (
    make_sharded_solve,
    window_shardings,
)


def make_distributed_step(mesh: Mesh, lidar_cfg: LidarConfig,
                          est_cfg: EstimatorConfig | None = None,
                          axis: str = "kf", pg_iters: int = 4,
                          pg_cg_iters: int = 24):
    """Build the jitted multi-device step.

    Inputs (with shardings):
      graph arrays     — node-dim sharded over `axis` (loop edges replicated)
      scans batch      — leading (batch) dim sharded over `axis` (dp)
      knn query        — replicated; bank — sharded over `axis`
      window state     — feature rows sharded over `axis` (poses replicated)
    """
    est_cfg = est_cfg or EstimatorConfig(window_size=6, max_tracks=48,
                                         gn_iters=4)
    pg_opt = make_sharded_posegraph_opt(mesh, iters=pg_iters,
                                        cg_iters=pg_cg_iters, axis=axis)
    win_solve = make_sharded_solve(mesh, est_cfg, axis=axis)

    def step(graph: PoseGraph, scan_points, scan_ranges, scan_valid,
             query, bank, bank_mask, window):
        # 1. dp feature extraction over the scan batch
        feats = jax.vmap(
            lambda p, r, v: extract_features(p, r, v, lidar_cfg)
        )(scan_points, scan_ranges, scan_valid)

        # 2. sharded KNN over the map bank
        d2, idx = sharded_knn(mesh, query, bank, bank_mask, k=5, axis=axis)

        # 3. keyframe-sharded pose-graph BA (explicit halo + psum CG)
        graph2 = pg_opt(graph)

        # 4. landmark-sharded window fusion BA (local Schur, psum'd poses)
        win2, diag = win_solve(window)

        return {
            "n_edge": jnp.sum(feats.edge_mask),
            "n_planar": jnp.sum(feats.planar_mask),
            "knn_d2": d2,
            "knn_idx": idx,
            "graph_t": graph2.t,
            "graph_ypr": graph2.ypr,
            "win_t": win2.t,
            "win_q": win2.q,
            "win_ex_t": win2.ex_t,
            "win_inv_depth": win2.feats.inv_depth,
            "win_cost1": diag.cost1,
            "win_iters": diag.iters,
        }

    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    in_shardings = (graph_shardings(mesh, axis), shard, shard, shard,
                    repl, shard, shard, window_shardings(mesh, axis))
    return jax.jit(step, in_shardings=in_shardings), est_cfg


def graph_shardings(mesh: Mesh, axis: str = "kf") -> PoseGraph:
    """Sharding pytree for PoseGraph: node arrays sharded, loop edges +
    counters replicated."""
    shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return PoseGraph(
        t=shard, ypr=shard, node_mask=shard,
        seq_dt=shard, seq_dyaw=shard, seq_dq=shard, seq_mask=shard,
        loop_i=repl, loop_j=repl, loop_dt=repl, loop_dyaw=repl,
        loop_dq=repl, loop_mask=repl, loop_w=repl, n_nodes=repl,
        n_loops=repl,
    )


def demo_graph(n_devices: int, nodes_per_dev: int = 8) -> PoseGraph:
    """Drifted circuit with cross-shard loop edges (a real correction to do)."""
    from lmono_tpu.utils.lie import Pose, mat_to_quat, so3_exp_quat, ypr_to_mat

    N = n_devices * nodes_per_dev
    theta = jnp.linspace(0, 2 * jnp.pi, N)
    gt_t = jnp.stack([12 * jnp.cos(theta), 12 * jnp.sin(theta),
                      jnp.zeros(N)], -1)
    gt_ypr = jnp.stack([theta + jnp.pi / 2, jnp.zeros(N), jnp.zeros(N)], -1)
    gt = [Pose(gt_t[i], mat_to_quat(ypr_to_mat(gt_ypr[i])))
          for i in range(N)]
    bias = Pose(jnp.array([0.0, 0.01, 0.0]),
                so3_exp_quat(jnp.array([0.0, 0.0, 0.002])))
    g = PoseGraph.empty(N, 16)
    g = graph_add_node(g, gt[0])
    cur = gt[0]
    for i in range(1, N):
        cur = cur.compose(gt[i - 1].between(gt[i]).compose(bias))
        g = graph_add_node(g, cur)
    g = graph_add_loop(g, 0, N - 1, gt[0].between(gt[N - 1]))
    return g


def demo_window(cfg: EstimatorConfig, key=None):
    """Self-contained perturbed window problem (smooth trajectory + landmark
    cloud, exact observations, poses/depths knocked off truth) for the
    multichip dry run."""
    from lmono_tpu.estimator.window import FeatureTable, WindowState
    from lmono_tpu.io.synthetic import synthetic_T_CL
    from lmono_tpu.utils.lie import (
        quat_mul, quat_normalize, quat_rotate, quat_rotate_inv, so3_exp_quat)

    key = key if key is not None else jax.random.PRNGKey(0)
    W1 = cfg.window_size + 1
    M = cfg.max_tracks
    ts = jnp.arange(W1, dtype=jnp.float32)
    t = jnp.stack([ts, 0.02 * ts ** 2, jnp.zeros_like(ts)], -1)
    q = so3_exp_quat(jnp.stack(
        [0.004 * ts + 0.002 * jnp.sin(1.7 * ts),
         0.01 * ts - 0.004 * jnp.cos(1.3 * ts),
         0.02 * ts + 0.006 * jnp.sin(0.9 * ts)], -1))
    T_CL = synthetic_T_CL()
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    lm = jnp.concatenate([
        jax.random.uniform(k1, (M, 1), minval=5.0, maxval=25.0),
        jax.random.uniform(k2, (M, 2), minval=-8.0, maxval=8.0),
    ], axis=-1)
    lm = lm.at[:, 2].set(lm[:, 2] * 0.3 + 1.0)

    def project(ft, fq, pts):
        p_l = quat_rotate_inv(fq, pts - ft)
        p_c = quat_rotate(T_CL.q, p_l) + T_CL.t
        return p_c[:, :2] / p_c[:, 2:3], p_c[:, 2]

    obs, masks = [], []
    for i in range(W1):
        o, z = project(t[i], q[i], lm)
        obs.append(o)
        masks.append(z > 1.0)
    obs = jnp.stack(obs, axis=1)
    obs_mask = jnp.stack(masks, axis=1)
    anchor = jnp.argmax(obs_mask, axis=1).astype(jnp.int32)
    p_l = quat_rotate_inv(q[anchor], lm - t[anchor])
    p_c = quat_rotate(T_CL.q[None], p_l) + T_CL.t[None]
    inv_depth = 1.0 / p_c[:, 2]

    feats = FeatureTable(
        ids=jnp.arange(M, dtype=jnp.int32), anchor=anchor,
        obs=obs, obs_mask=obs_mask, inv_depth=inv_depth,
        depth_ok=jnp.ones(M, bool), alive=jnp.ones(M, bool))
    state = WindowState.init(cfg, T_CL)
    state = state._replace(t=t, q=q, lt=t, lq=q, feats=feats,
                           count=jnp.asarray(W1, jnp.int32),
                           initialized=jnp.ones((), bool))
    # perturb everything but the gauge frame
    dp = 0.08 * jax.random.normal(k3, (W1, 3)).at[0].set(0.0)
    dth = 0.015 * jax.random.normal(k4, (W1, 3)).at[0].set(0.0)
    state = state._replace(
        t=state.t + dp,
        q=quat_normalize(quat_mul(state.q, so3_exp_quat(dth))),
        feats=feats._replace(inv_depth=inv_depth * (
            1.0 + 0.15 * jax.random.normal(k5, (M,)))),
    )
    return state


def demo_inputs(n_devices: int, lidar_cfg: LidarConfig,
                est_cfg: EstimatorConfig, nodes_per_dev: int = 8,
                bank_per_dev: int = 256):
    """Structured tiny-shape inputs for the dry run: scans come from the
    synthetic city raycaster (ground plane + boxes ⇒ real planar AND edge
    features), the graph is a drifted circuit with a loop edge, the window
    is a perturbed BA problem.  Shapes divisible by the mesh."""
    from lmono_tpu.io.synthetic import (
        circuit_trajectory,
        make_city_scene,
        simulate_lidar,
    )
    from lmono_tpu.utils.lie import Pose

    g = demo_graph(n_devices, nodes_per_dev)

    B = n_devices
    scene = make_city_scene()
    keys = jax.random.split(jax.random.PRNGKey(7), B)
    traj = circuit_trajectory(B)           # on the ring road, z=1.7 m
    scans = jax.vmap(lambda tt, qq, kk: simulate_lidar(
        scene, Pose(tt, qq), lidar_cfg, noise_std=0.005, key=kk)
    )(traj.t, traj.q, keys)
    pts, rng, valid = scans["points"], scans["ranges"], scans["valid"]

    # map bank: the valid points of scan 0, tiled/cropped to the bank shape
    flat = pts[0].reshape(-1, 3)
    flat_ok = valid[0].reshape(-1)
    Mbank = n_devices * bank_per_dev
    reps = -(-Mbank // flat.shape[0])
    bank = jnp.tile(flat, (reps, 1))[:Mbank].reshape(
        n_devices, bank_per_dev, 3)
    bank_mask = jnp.tile(flat_ok, (reps,))[:Mbank].reshape(
        n_devices, bank_per_dev)
    query = flat[::7][:64] + 0.05

    window = demo_window(est_cfg)
    return g, pts, rng, valid, query, bank, bank_mask, window
