"""Keyframe-sharded pose-graph BA vs the single-device optimizer.

The shard_map version must run the *same algorithm* — same residuals, GN
damping, and CG — with the work laid out by hand over the mesh (halo
ppermute for i→i+1 edges, all_gather for loop endpoints, psum'd CG dots).

Parity is asserted at the level that is numerically meaningful in f32:
the residual cost, gradient, and Gauss-Newton Hv products must agree to
float tolerance (cost/grad are bit-identical in practice), and the final
optimized trajectories must agree closely and both close the loop.  Exact
iterate equality is NOT expected: the gauge prior (weight 100²) against
1e-4 damping makes the normal system ill-conditioned enough that CG's
reduction-order rounding legitimately perturbs unconverged iterates.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from lmono_tpu.loop.posegraph import (
    PoseGraph,
    _residuals,
    graph_add_loop,
    graph_add_node,
    optimize_posegraph,
)
from lmono_tpu.parallel import make_mesh
from lmono_tpu.parallel.dist_ba import graph_shardings
from lmono_tpu.parallel.dist_posegraph import (
    _local_resid4,
    make_sharded_posegraph_opt,
)
from lmono_tpu.utils.lie import Pose, mat_to_quat, so3_exp_quat, ypr_to_mat

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _drifted_circuit(N: int, n_loops: int = 3):
    """Circuit with accumulated odometry drift + a few loop edges to truth."""
    theta = np.linspace(0, 2 * np.pi, N)
    gt_t = np.stack([12 * np.cos(theta), 12 * np.sin(theta),
                     1.5 * np.sin(2 * theta)], -1).astype(np.float32)
    gt_ypr = np.stack([theta + np.pi / 2, 0.12 * np.sin(theta),
                       0.08 * np.cos(theta)], -1).astype(np.float32)
    gt = [Pose(jnp.asarray(gt_t[i]),
               mat_to_quat(ypr_to_mat(jnp.asarray(gt_ypr[i]))))
          for i in range(N)]
    # drift mostly in translation + yaw (z is the first ypr axis ⇒ last
    # so3 component here) so the 4-DoF parameterization can express the fix
    bias = Pose(jnp.array([0.0, 0.01, 0.004]),
                so3_exp_quat(jnp.array([0.0003, 0.0003, 0.003])))
    odo = [gt[0]]
    for i in range(1, N):
        odo.append(odo[-1].compose(gt[i - 1].between(gt[i]).compose(bias)))
    g = PoseGraph.empty(N, 16)
    for p in odo:
        g = graph_add_node(g, p)
    for k in range(n_loops):
        g = graph_add_loop(g, k, N - 1 - 2 * k, gt[k].between(gt[N - 1 - 2 * k]))
    return g, gt_t


def test_sharded_residual_grad_hv_parity():
    """Cost, gradient and GN Hv of the sharded layout must equal the
    single-device ones (bit-level for cost/grad, f32-eps for Hv)."""
    N, nd = 64, 8
    g, _ = _drifted_circuit(N)
    x0 = jnp.concatenate([g.t, g.ypr[:, :1]], axis=-1)
    v = jax.random.normal(jax.random.PRNGKey(3), x0.shape)

    f1 = lambda xx: _residuals(xx, g)
    r1 = f1(x0)
    _, vjp1 = jax.vjp(f1, x0)
    grad1 = vjp1(r1)[0]
    _, jv1 = jax.jvp(f1, (x0,), (v,))
    hv1 = vjp1(jv1)[0] + 1e-4 * v

    mesh = make_mesh(nd, axis="kf")
    anchor = jnp.concatenate([g.t[0], g.ypr[0, :1]])

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P("kf"), P("kf"), P(), P("kf"), P("kf"), P("kf"),
                       P("kf"), P(), P(), P(), P(), P()),
             out_specs=(P("kf"), P("kf"), P("kf")))
    def sharded(x, v, anchor, seq_dt, seq_dyaw, seq_mask, ypr_pr,
                loop_i, loop_j, loop_dt, loop_dyaw, loop_mask):
        f = lambda xx: _local_resid4(
            xx, anchor, seq_dt, seq_dyaw, seq_mask, ypr_pr,
            loop_i, loop_j, loop_dt, loop_dyaw, loop_mask, "kf", nd)
        r = f(x)
        _, vjp = jax.vjp(f, x)
        grad = vjp(r)[0]
        _, jv = jax.jvp(f, (x,), (v,))
        hv = vjp(jv)[0] + 1e-4 * v
        cost = jax.lax.psum(jnp.sum(r * r), "kf")
        return grad, hv, jnp.full((x.shape[0],), cost)

    grad2, hv2, cost2 = sharded(
        x0, v, anchor, g.seq_dt, g.seq_dyaw, g.seq_mask, g.ypr[:, 1:],
        g.loop_i, g.loop_j, g.loop_dt, g.loop_dyaw,
        g.loop_w * g.loop_mask)

    cost1 = float(jnp.sum(r1 * r1))
    np.testing.assert_allclose(float(cost2[0]), cost1, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(grad2), np.asarray(grad1),
                               rtol=1e-5, atol=1e-5)
    scale = float(jnp.max(jnp.abs(hv1)))
    np.testing.assert_allclose(np.asarray(hv2) / scale,
                               np.asarray(hv1) / scale,
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("four_dof", [True, False])
def test_sharded_posegraph_matches_single_device(four_dof):
    N = 64                      # 8 nodes per device on the 8-dev mesh
    g, gt_t = _drifted_circuit(N)

    ref = optimize_posegraph(g, iters=8, cg_iters=60, four_dof=four_dof)

    mesh = make_mesh(8, axis="kf")
    opt = make_sharded_posegraph_opt(mesh, iters=8, cg_iters=60,
                                     four_dof=four_dof, axis="kf")
    g_sh = jax.tree.map(jax.device_put, g, graph_shardings(mesh, "kf"))
    out = opt(g_sh)
    jax.block_until_ready(out)

    # solutions agree to well under the correction scale (cm on a 24 m
    # circuit whose input drift is metres)
    err_in = np.linalg.norm(np.asarray(g.t) - gt_t, axis=-1).max()
    gap = np.linalg.norm(np.asarray(out.t) - np.asarray(ref.t), axis=-1).max()
    assert gap < 0.05 * err_in, (gap, err_in)

    # and the distributed solve improves the graph exactly as the single-
    # device one does (8 GN / 60 CG is far from full convergence — the
    # quality bar for the optimizer itself lives in tests/test_loop.py)
    err_ref = np.linalg.norm(np.asarray(ref.t) - gt_t, axis=-1).max()
    err_out = np.linalg.norm(np.asarray(out.t) - gt_t, axis=-1).max()
    assert err_out < 0.8 * err_in, (err_in, err_out)
    assert err_out < err_ref + 0.05 * err_in


def test_sharded_posegraph_loop_edges_cross_shards():
    """Loop edges whose endpoints live on different devices must still pull
    the graph together (exercises the all_gather path + its vjp)."""
    N = 64
    g, gt_t = _drifted_circuit(N, n_loops=5)
    li = np.asarray(g.loop_i)[:5] // 8
    lj = np.asarray(g.loop_j)[:5] // 8
    assert np.all(li != lj)

    mesh = make_mesh(8, axis="kf")
    opt = make_sharded_posegraph_opt(mesh, iters=8, cg_iters=60, axis="kf")
    g_sh = jax.tree.map(jax.device_put, g, graph_shardings(mesh, "kf"))
    out = opt(g_sh)
    err_in = np.linalg.norm(np.asarray(g.t) - gt_t, axis=-1).max()
    err_out = np.linalg.norm(np.asarray(out.t) - gt_t, axis=-1).max()
    assert err_out < 0.8 * err_in


def test_mesh_posegraph_crossover_fallback():
    """Mesh-mode SlamSystem uses the single-device pose-graph optimizer
    below the measured crossover and the sharded one above it
    (VERDICT r4 #6; SCALING.json posegraph_size_sweep)."""
    import dataclasses

    import numpy as np

    from lmono_tpu.config import synthetic_config
    from lmono_tpu.loop.posegraph import PoseGraph
    from lmono_tpu.pipeline import DIST_POSEGRAPH_CROSSOVER, SlamSystem

    cfg = synthetic_config()
    cfg = cfg.replace(parallel=dataclasses.replace(
        cfg.parallel, kf_shards=2, map_shards=1))
    system = SlamSystem(cfg, enable_loop=True, enable_mapping=False)
    small = PoseGraph.empty(512)
    assert system._choose_posegraph_opt(small) is system._opt_graph_plain
    big = PoseGraph.empty(DIST_POSEGRAPH_CROSSOVER)
    assert system._choose_posegraph_opt(big) is system._opt_graph_sharded
