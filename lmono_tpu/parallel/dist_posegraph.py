"""Keyframe-sharded pose-graph BA with explicit collectives (SURVEY §7.7).

The single-device optimizer (`lmono_tpu.loop.posegraph.optimize_posegraph`)
is matrix-free GN+CG over all edges; here the *same algorithm* is laid out
over the mesh's keyframe axis by hand — no GSPMD auto-partitioning:

* node states are block-sharded: device d owns nodes [d·Nl, (d+1)·Nl);
* the only remote rows any residual reads are (a) each device's *next*
  block's first row (the halo endpoint of its last sequential edge),
  (b) the loop-edge endpoint rows (few), and (c) node 0 (gauge) — so one
  **psum'd row pack** of (2L + 1 + D, C) rebuilds every remote value on
  every device: each owner contributes its rows, zeros elsewhere, one
  `lax.psum`.  Bytes per evaluation are O(L + D), *independent of N*
  (round 2 all-gathered the full (N, C) state instead — 98 KB/eval at
  N=4096 vs 12 KB now — and paid an extra ppermute for the halo);
* loop residuals are masked so exactly the owner of node i contributes;
* CG dot products are `lax.psum` reductions; the Hv = Jᵀ(Jv) product uses
  `jax.linearize` (tangent-only re-evaluation — one psum per Hv, the
  primal is not recomputed) and differentiates *through* the collectives
  (psum's transpose is communication-free cotangent reuse), so the
  distributed iterates match the single-device ones to float tolerance
  (`tests/test_dist_posegraph.py`).

Collectives per CG step: one (2L+1+D, C) psum inside Hv + two scalar psums
for the dot products — 3 tiny latency-bound collectives (a fused-reduction
variant was tried and rejected for f32 stability, see `_pcg`); SCALING.md
has the measured partition efficiency and the ICI latency model.

Replaces (at scale) the reference's single-threaded scaffolded pose graph
(`mono_lidar_mapping/include/loop_detection/Loop_Detector.h:100-168`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmono_tpu.loop.posegraph import PoseGraph, _gnc_c, _robust_w, _wrap
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

# loop-edge weights are per-edge (PoseGraph.loop_w); LiDAR-refined
# closures weigh ~5x sequential edges, PnP-only ones ~1.5x


def _gather_rows(vals_loc: jax.Array, rows: jax.Array, axis: str,
                 nd: int) -> jax.Array:
    """Replicated copy of global rows from a block-sharded (Nl, C) array.

    Each device contributes the rows it owns (zeros elsewhere); one psum
    makes the pack identical everywhere.  Exact: every row is the sum of
    one owner contribution and zeros."""
    Nl = vals_loc.shape[0]
    my = jax.lax.axis_index(axis)
    loc = rows - my * Nl
    own = (loc >= 0) & (loc < Nl)
    v = vals_loc[jnp.clip(loc, 0, Nl - 1)] * own[:, None]
    return jax.lax.psum(v, axis)


def _pack_remote(vals_loc: jax.Array, loop_i, loop_j, axis: str, nd: int):
    """One psum for every remote row any residual needs: loop endpoints,
    node 0 (gauge), and each device block's first row (sequential halo).

    Returns (ei (L,C), ej (L,C), e0 (C,), nxt (C,) — this device's halo)."""
    Nl = vals_loc.shape[0]
    L = loop_i.shape[0]
    firsts = jnp.arange(nd, dtype=loop_i.dtype) * Nl
    rows = jnp.concatenate(
        [loop_i, loop_j, jnp.zeros((1,), loop_i.dtype), firsts])
    pack = _gather_rows(vals_loc, rows, axis, nd)
    my = jax.lax.axis_index(axis)
    nxt = pack[2 * L + 1 + (my + 1) % nd]   # first row of the next block
    return pack[:L], pack[L:2 * L], pack[2 * L], nxt


def _local_resid4(x_loc, anchor, seq_dt, seq_dyaw, seq_mask, ypr_pr,
                  loop_i, loop_j, loop_dt, loop_dyaw, loop_w,
                  axis: str, nd: int, robust_c=None):
    """Per-device 4-DoF residuals; union over devices == `_residuals`."""
    Nl = x_loc.shape[0]
    my = jax.lax.axis_index(axis)

    ext_loc = jnp.concatenate([x_loc, ypr_pr], -1)        # (Nl, 6)
    ei, ej, e0, nxt = _pack_remote(ext_loc, loop_i, loop_j, axis, nd)

    x_ext = jnp.concatenate([x_loc, nxt[None, :4]], 0)    # (Nl+1, 4)
    t = x_ext[:, :3]
    yaw = x_ext[:, 3]
    ypr_i = jnp.stack([yaw[:-1], ypr_pr[:, 0], ypr_pr[:, 1]], -1)
    R_i = ypr_to_mat(ypr_i)                               # (Nl,3,3)
    dt_est = jnp.einsum("nij,nj->ni", R_i.transpose(0, 2, 1),
                        t[1:] - t[:-1])
    r_seq_t = (dt_est - seq_dt) * seq_mask[:, None]
    r_seq_y = _wrap(yaw[1:] - yaw[:-1] - seq_dyaw) * seq_mask

    # loop edges from the psum'd endpoint rows, owner-masked
    own = ((loop_i // Nl) == my)
    ypr_li = jnp.stack([ei[:, 3], ei[:, 4], ei[:, 5]], -1)
    R_li = ypr_to_mat(ypr_li)
    dt_est_l = jnp.einsum("lij,lj->li", R_li.transpose(0, 2, 1),
                          ej[:, :3] - ei[:, :3])
    raw_t = dt_est_l - loop_dt
    raw_y = _wrap(ej[:, 3] - ei[:, 3] - loop_dyaw)
    w = loop_w * own * _robust_w(jnp.linalg.norm(raw_t, axis=-1),
                                 jnp.abs(raw_y),
                                 0.3 if robust_c is None else robust_c)
    r_loop_t = raw_t * w[:, None]
    r_loop_y = raw_y * w

    # gauge on node 0, contributed by its owner only
    r_fix = 100.0 * (e0[:4] - anchor) * (my == 0)
    return jnp.concatenate([
        r_seq_t.reshape(-1), r_seq_y, r_loop_t.reshape(-1), r_loop_y, r_fix])


def _local_resid6(x_loc, q0_loc, anchor_t, seq_dt, seq_dq, seq_mask,
                  loop_i, loop_j, loop_dt, loop_dq, loop_w,
                  axis: str, nd: int, robust_c=None):
    """Per-device 6-DoF residuals; union over devices == `_residuals6`."""
    Nl = x_loc.shape[0]
    my = jax.lax.axis_index(axis)

    q_loc = quat_mul(q0_loc, so3_exp_quat(x_loc[:, 3:]))  # (Nl,4)
    ext_loc = jnp.concatenate([x_loc, q_loc], -1)         # (Nl, 10)
    ei, ej, e0, nxt = _pack_remote(ext_loc, loop_i, loop_j, axis, nd)

    t_ext = jnp.concatenate([x_loc[:, :3], nxt[None, :3]], 0)
    q_ext = jnp.concatenate([q_loc, nxt[None, 6:10]], 0)

    dt_est = quat_rotate_inv(q_ext[:-1], t_ext[1:] - t_ext[:-1])
    r_seq_t = (dt_est - seq_dt) * seq_mask[:, None]
    dq_est = quat_mul(quat_conj(q_ext[:-1]), q_ext[1:])
    r_seq_r = so3_log_quat(quat_mul(quat_conj(seq_dq), dq_est)) \
        * seq_mask[:, None]

    own = ((loop_i // Nl) == my)
    q_li, q_lj = ei[:, 6:10], ej[:, 6:10]
    dt_est_l = quat_rotate_inv(q_li, ej[:, :3] - ei[:, :3])
    raw_t = dt_est_l - loop_dt
    dq_est_l = quat_mul(quat_conj(q_li), q_lj)
    raw_r = so3_log_quat(quat_mul(quat_conj(loop_dq), dq_est_l))
    w = loop_w * own * _robust_w(jnp.linalg.norm(raw_t, axis=-1),
                                 jnp.linalg.norm(raw_r, axis=-1),
                                 0.3 if robust_c is None else robust_c)
    r_loop_t = raw_t * w[:, None]
    r_loop_r = raw_r * w[:, None]

    r_fix = 100.0 * jnp.concatenate(
        [e0[:3] - anchor_t, e0[3:6]]) * (my == 0)
    return jnp.concatenate([
        r_seq_t.reshape(-1), r_seq_r.reshape(-1),
        r_loop_t.reshape(-1), r_loop_r.reshape(-1), r_fix])


def _pcg(Av, b, iters: int, axis: str):
    """CG with psum-reduced dot products (b, x sharded per device).

    Note on communication-avoiding CG: fusing the two scalar reductions
    into one psum via the expansion r'·r' = r·r − 2α(r·Ap) + α²(Ap·Ap)
    (Chronopoulos–Gear style) was tried and REJECTED — on the gauge-prior
    pose-graph system (condition ~1e8) the expansion cancels
    catastrophically in f32 whenever a step reduces the residual sharply,
    degrading the search directions: the dryrun parity gap went from
    8.7e-5 m to 6.7e-2 m on a 1.48 m correction.  The classic two-dot CG
    below (3 collectives/step with the Hv row pack) matches the
    single-device solver to float tolerance; on real ICI the extra
    ~1 µs collective is negligible (SCALING.md)."""

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


def _gn_step_factory(f, node_mask, cg_iters, axis):
    """One GN step: linearize once, matrix-free damped-CG on JᵀJ."""

    def gn(x):
        r = f(x)
        _, f_lin = jax.linearize(f, x)     # tangent-only: 1 psum per Hv
        _, vjp = jax.vjp(f, x)
        grad = vjp(r)[0]

        def Hv(v):
            return vjp(f_lin(v))[0] + 1e-4 * v

        dx = _pcg(Hv, -grad, cg_iters, axis)
        return x + jnp.where(node_mask[:, None], dx, 0.0)

    return gn


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
                loop_i, loop_j, loop_dt, loop_dyaw, loop_w):
            def gn_it(x, it):
                f = lambda xx: _local_resid4(
                    xx, anchor, seq_dt, seq_dyaw, seq_mask, ypr_pr,
                    loop_i, loop_j, loop_dt, loop_dyaw, loop_w, axis, nd,
                    robust_c=_gnc_c(it))
                gn = _gn_step_factory(f, node_mask, cg_iters, axis)
                return gn(x), None

            x, _ = jax.lax.scan(gn_it, x0, jnp.arange(iters))
            return (x,)

        def optimize(g: PoseGraph) -> PoseGraph:
            x0 = jnp.concatenate([g.t, g.ypr[:, :1]], axis=-1)
            anchor = jnp.concatenate([g.t[0], g.ypr[0, :1]])
            (x,) = run(x0, anchor, g.seq_dt, g.seq_dyaw, g.seq_mask,
                       g.ypr[:, 1:], g.node_mask,
                       g.loop_i, g.loop_j, g.loop_dt, g.loop_dyaw,
                       g.loop_w * g.loop_mask)
            new_ypr = jnp.stack([x[:, 3], g.ypr[:, 1], g.ypr[:, 2]], -1)
            return g._replace(t=x[:, :3], ypr=new_ypr)

    else:

        @partial(jax.shard_map, mesh=mesh, check_vma=False,
                 in_specs=in_specs, out_specs=(node_spec, node_spec))
        def run(x0, anchor_t, seq_dt, seq_dq, seq_mask, q0, node_mask,
                loop_i, loop_j, loop_dt, loop_dq, loop_w):
            def gn_step(carry, it):
                x, q0 = carry
                f = lambda xx: _local_resid6(
                    xx, q0, anchor_t, seq_dt, seq_dq, seq_mask,
                    loop_i, loop_j, loop_dt, loop_dq, loop_w, axis, nd,
                    robust_c=_gnc_c(it))
                gn = _gn_step_factory(f, node_mask, cg_iters, axis)
                x = gn(x)
                q0 = quat_mul(q0, so3_exp_quat(x[:, 3:]))
                x = x.at[:, 3:].set(0.0)
                return (x, q0), None

            (x, q0), _ = jax.lax.scan(gn_step, (x0, q0), jnp.arange(iters))
            return x, q0

        def optimize(g: PoseGraph) -> PoseGraph:
            N = g.t.shape[0]
            q0 = mat_to_quat(ypr_to_mat(g.ypr))
            x0 = jnp.concatenate([g.t, jnp.zeros((N, 3), g.t.dtype)], -1)
            x, q0 = run(x0, g.t[0], g.seq_dt, g.seq_dq, g.seq_mask, q0,
                        g.node_mask, g.loop_i, g.loop_j, g.loop_dt,
                        g.loop_dq, g.loop_w * g.loop_mask)
            return g._replace(t=x[:, :3], ypr=mat_to_ypr(quat_to_mat(q0)))

    return jax.jit(optimize)
