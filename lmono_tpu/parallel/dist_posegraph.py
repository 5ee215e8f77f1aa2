"""Keyframe-sharded pose-graph BA with explicit collectives (SURVEY §7.7).

The single-device optimizer (`lmono_tpu.loop.posegraph.optimize_posegraph`)
is matrix-free GN+CG over all edges; here the *same algorithm* is laid out
over the mesh's keyframe axis by hand — no GSPMD auto-partitioning:

* node states are block-sharded: device d owns nodes [d·Nl, (d+1)·Nl);
* sequential i→i+1 edges are owned by the source node's device; the one
  remote endpoint (the next device's first node) arrives by a **halo
  exchange** (`lax.ppermute` of a single row);
* loop edges (arbitrary i,j; few of them) read endpoints from one
  `lax.all_gather` of the tiny (N, C) state and are masked so exactly the
  owner of node i contributes each edge's residual;
* CG dot products are `lax.psum` reductions;
* the Hv = Jᵀ(Jv) product differentiates *through the collectives*
  (the transpose of all_gather is psum_scatter, of ppermute the inverse
  permutation), so gradients of remote-endpoint terms flow back to their
  owner automatically and the distributed iterates match the single-device
  ones to float tolerance (`tests/test_dist_posegraph.py`).

Communication per CG step: one (N, C) all_gather + one row ppermute + two
scalar psums — all O(N) bytes on the graph, independent of edge count.

Replaces (at scale) the reference's single-threaded scaffolded pose graph
(`mono_lidar_mapping/include/loop_detection/Loop_Detector.h:100-168`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmono_tpu.loop.posegraph import PoseGraph, _wrap
from lmono_tpu.utils.lie import (
    mat_to_quat,
    mat_to_ypr,
    quat_conj,
    quat_mul,
    quat_rotate_inv,
    quat_to_mat,
    so3_exp_quat,
    so3_log_quat,
    ypr_to_mat,
)

LOOP_WEIGHT = 5.0  # matches posegraph._residuals default


def _halo_next_row(x_loc: jax.Array, axis: str, nd: int) -> jax.Array:
    """Give every device the first row of its right neighbor (device d
    receives row 0 of device d+1; device nd-1 receives device 0's — that
    wrap edge is always masked since edge N-1 does not exist)."""
    perm = [(i, (i - 1) % nd) for i in range(nd)]
    return jax.lax.ppermute(x_loc[:1], axis, perm)[0]


def _local_resid4(x_loc, anchor, seq_dt, seq_dyaw, seq_mask, ypr_pr,
                  loop_i, loop_j, loop_dt, loop_dyaw, loop_mask,
                  axis: str, nd: int):
    """Per-device 4-DoF residuals; union over devices == `_residuals`."""
    Nl = x_loc.shape[0]
    my = jax.lax.axis_index(axis)

    x_next = _halo_next_row(x_loc, axis, nd)              # (4,)
    x_ext = jnp.concatenate([x_loc, x_next[None]], 0)     # (Nl+1, 4)
    t = x_ext[:, :3]
    yaw = x_ext[:, 3]
    ypr_i = jnp.stack([yaw[:-1], ypr_pr[:, 0], ypr_pr[:, 1]], -1)
    R_i = ypr_to_mat(ypr_i)                               # (Nl,3,3)
    dt_est = jnp.einsum("nij,nj->ni", R_i.transpose(0, 2, 1),
                        t[1:] - t[:-1])
    r_seq_t = (dt_est - seq_dt) * seq_mask[:, None]
    r_seq_y = _wrap(yaw[1:] - yaw[:-1] - seq_dyaw) * seq_mask

    # loop edges from the gathered (tiny) node state, owner-masked
    x_all = jax.lax.all_gather(x_loc, axis, axis=0, tiled=True)   # (N,4)
    pr_all = jax.lax.all_gather(ypr_pr, axis, axis=0, tiled=True)
    own = ((loop_i // Nl) == my)
    w = LOOP_WEIGHT * loop_mask * own
    t_all, yaw_all = x_all[:, :3], x_all[:, 3]
    ypr_li = jnp.stack([yaw_all[loop_i], pr_all[loop_i, 0],
                        pr_all[loop_i, 1]], -1)
    R_li = ypr_to_mat(ypr_li)
    dt_est_l = jnp.einsum("lij,lj->li", R_li.transpose(0, 2, 1),
                          t_all[loop_j] - t_all[loop_i])
    r_loop_t = (dt_est_l - loop_dt) * w[:, None]
    r_loop_y = _wrap(yaw_all[loop_j] - yaw_all[loop_i] - loop_dyaw) * w

    # gauge on node 0, contributed by its owner only
    r_fix = 100.0 * (x_all[0] - anchor) * (my == 0)
    return jnp.concatenate([
        r_seq_t.reshape(-1), r_seq_y, r_loop_t.reshape(-1), r_loop_y, r_fix])


def _local_resid6(x_loc, q0_loc, anchor_t, seq_dt, seq_dq, seq_mask,
                  loop_i, loop_j, loop_dt, loop_dq, loop_mask,
                  axis: str, nd: int):
    """Per-device 6-DoF residuals; union over devices == `_residuals6`."""
    Nl = x_loc.shape[0]
    my = jax.lax.axis_index(axis)

    q_loc = quat_mul(q0_loc, so3_exp_quat(x_loc[:, 3:]))  # (Nl,4)
    x_next = _halo_next_row(x_loc, axis, nd)
    q0_next = _halo_next_row(q0_loc, axis, nd)
    q_next = quat_mul(q0_next, so3_exp_quat(x_next[3:]))
    t_ext = jnp.concatenate([x_loc[:, :3], x_next[None, :3]], 0)
    q_ext = jnp.concatenate([q_loc, q_next[None]], 0)

    dt_est = quat_rotate_inv(q_ext[:-1], t_ext[1:] - t_ext[:-1])
    r_seq_t = (dt_est - seq_dt) * seq_mask[:, None]
    dq_est = quat_mul(quat_conj(q_ext[:-1]), q_ext[1:])
    r_seq_r = so3_log_quat(quat_mul(quat_conj(seq_dq), dq_est)) \
        * seq_mask[:, None]

    t_all = jax.lax.all_gather(x_loc[:, :3], axis, axis=0, tiled=True)
    q_all = jax.lax.all_gather(q_loc, axis, axis=0, tiled=True)
    dth0_all = jax.lax.all_gather(x_loc[:, 3:], axis, axis=0, tiled=True)
    own = ((loop_i // Nl) == my)
    w = LOOP_WEIGHT * loop_mask * own
    dt_est_l = quat_rotate_inv(q_all[loop_i], t_all[loop_j] - t_all[loop_i])
    r_loop_t = (dt_est_l - loop_dt) * w[:, None]
    dq_est_l = quat_mul(quat_conj(q_all[loop_i]), q_all[loop_j])
    r_loop_r = so3_log_quat(quat_mul(quat_conj(loop_dq), dq_est_l)) \
        * w[:, None]

    r_fix = 100.0 * jnp.concatenate(
        [t_all[0] - anchor_t, dth0_all[0]]) * (my == 0)
    return jnp.concatenate([
        r_seq_t.reshape(-1), r_seq_r.reshape(-1),
        r_loop_t.reshape(-1), r_loop_r.reshape(-1), r_fix])


def _pcg(Av, b, iters: int, axis: str):
    """CG with psum-reduced dot products (b, x sharded per device)."""

    def pdot(a, c):
        return jax.lax.psum(jnp.sum(a * c), axis)

    x = jnp.zeros_like(b)
    r = b
    p = r
    rs = pdot(r, r)

    def body(carry, _):
        x, r, p, rs = carry
        Ap = Av(p)
        alpha = rs / jnp.maximum(pdot(p, Ap), 1e-12)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = pdot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-12)
        p = r + beta * p
        return (x, r, p, rs_new), None

    (x, _, _, _), _ = jax.lax.scan(body, (x, r, p, rs), None, length=iters)
    return x


def make_sharded_posegraph_opt(mesh: Mesh, iters: int = 10,
                               cg_iters: int = 50, four_dof: bool = True,
                               axis: str = "kf"):
    """Build a jitted keyframe-sharded `optimize_posegraph` equivalent.

    Input PoseGraph must have node capacity divisible by the mesh axis size;
    device_put with `graph_shardings` (node arrays sharded, loop arrays
    replicated) before calling.
    """
    nd = mesh.shape[axis]
    node_spec, rep = P(axis), P()
    in_specs = (
        node_spec,  # x0 (N, C)
        rep,        # anchor
        node_spec, node_spec, node_spec,   # seq_dt, seq_dyaw|seq_dq, seq_mask
        node_spec,  # ypr_pr (4dof) / q0 (6dof)
        node_spec,  # node_mask
        rep, rep, rep, rep, rep,           # loop_i/j/dt/dyaw|dq/mask
    )

    if four_dof:

        @partial(jax.shard_map, mesh=mesh, check_vma=False,
                 in_specs=in_specs, out_specs=(node_spec,))
        def run(x0, anchor, seq_dt, seq_dyaw, seq_mask, ypr_pr, node_mask,
                loop_i, loop_j, loop_dt, loop_dyaw, loop_mask):
            def gn_step(x, _):
                f = lambda xx: _local_resid4(
                    xx, anchor, seq_dt, seq_dyaw, seq_mask, ypr_pr,
                    loop_i, loop_j, loop_dt, loop_dyaw, loop_mask, axis, nd)
                r = f(x)
                _, vjp = jax.vjp(f, x)
                grad = vjp(r)[0]

                def Hv(v):
                    _, jv = jax.jvp(f, (x,), (v,))
                    return vjp(jv)[0] + 1e-4 * v

                dx = _pcg(Hv, -grad, cg_iters, axis)
                return x + jnp.where(node_mask[:, None], dx, 0.0), None

            x, _ = jax.lax.scan(gn_step, x0, None, length=iters)
            return (x,)

        def optimize(g: PoseGraph) -> PoseGraph:
            x0 = jnp.concatenate([g.t, g.ypr[:, :1]], axis=-1)
            anchor = jnp.concatenate([g.t[0], g.ypr[0, :1]])
            (x,) = run(x0, anchor, g.seq_dt, g.seq_dyaw, g.seq_mask,
                       g.ypr[:, 1:], g.node_mask,
                       g.loop_i, g.loop_j, g.loop_dt, g.loop_dyaw,
                       g.loop_mask)
            new_ypr = jnp.stack([x[:, 3], g.ypr[:, 1], g.ypr[:, 2]], -1)
            return g._replace(t=x[:, :3], ypr=new_ypr)

    else:

        @partial(jax.shard_map, mesh=mesh, check_vma=False,
                 in_specs=in_specs, out_specs=(node_spec, node_spec))
        def run(x0, anchor_t, seq_dt, seq_dq, seq_mask, q0, node_mask,
                loop_i, loop_j, loop_dt, loop_dq, loop_mask):
            def gn_step(carry, _):
                x, q0 = carry
                f = lambda xx: _local_resid6(
                    xx, q0, anchor_t, seq_dt, seq_dq, seq_mask,
                    loop_i, loop_j, loop_dt, loop_dq, loop_mask, axis, nd)
                r = f(x)
                _, vjp = jax.vjp(f, x)
                grad = vjp(r)[0]

                def Hv(v):
                    _, jv = jax.jvp(f, (x,), (v,))
                    return vjp(jv)[0] + 1e-4 * v

                dx = _pcg(Hv, -grad, cg_iters, axis)
                x = x + jnp.where(node_mask[:, None], dx, 0.0)
                q0 = quat_mul(q0, so3_exp_quat(x[:, 3:]))
                x = x.at[:, 3:].set(0.0)
                return (x, q0), None

            (x, q0), _ = jax.lax.scan(gn_step, (x0, q0), None, length=iters)
            return x, q0

        def optimize(g: PoseGraph) -> PoseGraph:
            N = g.t.shape[0]
            q0 = mat_to_quat(ypr_to_mat(g.ypr))
            x0 = jnp.concatenate([g.t, jnp.zeros((N, 3), g.t.dtype)], -1)
            x, q0 = run(x0, g.t[0], g.seq_dt, g.seq_dq, g.seq_mask, q0,
                        g.node_mask, g.loop_i, g.loop_j, g.loop_dt,
                        g.loop_dq, g.loop_mask)
            return g._replace(t=x[:, :3], ypr=mat_to_ypr(quat_to_mat(q0)))

    return jax.jit(optimize)
