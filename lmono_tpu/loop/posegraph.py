"""Global pose-graph optimization (4-DoF or 6-DoF), matrix-free on TPU.

The reference only *scaffolds* this (yaw-parameterized Ceres templates and an
`optimize_buf` thread member exist but no optimize function is implemented —
`include/loop_detection/Loop_Detector.h:100-168`, SURVEY §2.2); loop
correction there is just a rigid window re-anchor.  Here the pose graph is
real: sequential odometry edges + loop edges over all keyframes, solved by
Gauss-Newton with **matrix-free conjugate gradient** — Hv products come from
`jvp`/`vjp` through the residual function, so no sparse matrix is ever
materialized and the cost per CG step is two residual-graph evaluations,
which XLA fuses across all edges.

4-DoF mode (VINS-style): optimize (x, y, z, yaw) per keyframe, holding
pitch/roll at their odometry values (gravity-observable axes).
6-DoF mode (`LoopConfig.posegraph_4dof=False`): optimize full SE(3) per
keyframe — position plus a local rotation tangent around the stored node
rotation — with full relative-rotation edge residuals; same matrix-free CG.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import LoopConfig
from lmono_tpu.utils.lie import (
    Pose,
    mat_to_ypr,
    quat_conj,
    quat_mul,
    quat_rotate_inv,
    quat_to_mat,
    so3_exp_quat,
    so3_log_quat,
    ypr_to_mat,
    mat_to_quat,
)


class PoseGraph(NamedTuple):
    """Fixed-capacity graph state (masked)."""
    t: jax.Array          # (N, 3) keyframe positions
    ypr: jax.Array        # (N, 3) yaw/pitch/roll (pitch/roll held fixed)
    node_mask: jax.Array  # (N,)
    # sequential edges i→i+1 (relative in frame i), from odometry
    seq_dt: jax.Array     # (N, 3)
    seq_dyaw: jax.Array   # (N,)
    seq_dq: jax.Array     # (N, 4) full relative rotation (6-DoF edges)
    seq_mask: jax.Array   # (N,)
    # loop edges
    loop_i: jax.Array     # (L,) int32 older node
    loop_j: jax.Array     # (L,) int32 newer node
    loop_dt: jax.Array    # (L, 3) measured t_j in frame i
    loop_dyaw: jax.Array  # (L,)
    loop_dq: jax.Array    # (L, 4) full relative rotation (6-DoF edges)
    loop_mask: jax.Array  # (L,)
    loop_w: jax.Array     # (L,) per-edge weight (0 where unset; LiDAR-GN
                          # refined closures are cm-grade and weigh more
                          # than PnP-only ones)
    n_nodes: jax.Array    # ()
    n_loops: jax.Array    # ()

    @staticmethod
    def empty(capacity: int, max_loops: int = 256) -> "PoseGraph":
        ident = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (capacity, 1))
        return PoseGraph(
            t=jnp.zeros((capacity, 3), jnp.float32),
            ypr=jnp.zeros((capacity, 3), jnp.float32),
            node_mask=jnp.zeros((capacity,), bool),
            seq_dt=jnp.zeros((capacity, 3), jnp.float32),
            seq_dyaw=jnp.zeros((capacity,), jnp.float32),
            seq_dq=ident,
            seq_mask=jnp.zeros((capacity,), bool),
            loop_i=jnp.zeros((max_loops,), jnp.int32),
            loop_j=jnp.zeros((max_loops,), jnp.int32),
            loop_dt=jnp.zeros((max_loops, 3), jnp.float32),
            loop_dyaw=jnp.zeros((max_loops,), jnp.float32),
            loop_dq=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32),
                             (max_loops, 1)),
            loop_mask=jnp.zeros((max_loops,), bool),
            loop_w=jnp.zeros((max_loops,), jnp.float32),
            n_nodes=jnp.zeros((), jnp.int32),
            n_loops=jnp.zeros((), jnp.int32),
        )


def graph_add_node(g: PoseGraph, pose: Pose) -> PoseGraph:
    """Append a keyframe node; the sequential edge to the previous node is
    derived from the supplied (odometry) pose."""
    i = g.n_nodes
    ypr = mat_to_ypr(quat_to_mat(pose.q))
    prev = jnp.maximum(i - 1, 0)
    # relative measurement in the previous node's (full-rotation) frame
    R_prev = ypr_to_mat(g.ypr[prev])
    q_prev = mat_to_quat(R_prev)
    dt = jnp.where(i > 0,
                   R_prev.T @ (pose.t - g.t[prev]),
                   jnp.zeros(3))
    dyaw = jnp.where(i > 0, ypr[0] - g.ypr[prev, 0], 0.0)
    dq = jnp.where(i > 0, quat_mul(quat_conj(q_prev), pose.q),
                   jnp.array([1.0, 0, 0, 0]))
    return g._replace(
        t=g.t.at[i].set(pose.t),
        ypr=g.ypr.at[i].set(ypr),
        node_mask=g.node_mask.at[i].set(True),
        seq_dt=g.seq_dt.at[prev].set(jnp.where(i > 0, dt, g.seq_dt[prev])),
        seq_dyaw=g.seq_dyaw.at[prev].set(
            jnp.where(i > 0, dyaw, g.seq_dyaw[prev])),
        seq_dq=g.seq_dq.at[prev].set(
            jnp.where(i > 0, dq, g.seq_dq[prev])),
        seq_mask=g.seq_mask.at[prev].set((i > 0) | g.seq_mask[prev]),
        n_nodes=i + 1,
    )


def graph_add_loop(g: PoseGraph, i, j, rel: Pose,
                   weight: float = 5.0) -> PoseGraph:
    """Add loop edge: rel = T_ci_cj (newer j seen from older i).

    weight: edge weight relative to sequential odometry edges — use high
    values only for closures whose relative pose is refined beyond
    PnP grade (e.g. LiDAR GN), else the edge noise pollutes a low-drift
    chain.

    The yaw measurement must match the node parameterization: predict node
    j's world pose through node i (T_w_j' = T_w_i ∘ rel) and take the
    *world-yaw difference* — taking ypr of `rel` itself is wrong for camera
    frames, whose ~90° roll mixes the axes.
    """
    k = g.n_loops % g.loop_mask.shape[0]
    i = jnp.asarray(i, jnp.int32)
    R_i = ypr_to_mat(g.ypr[i])
    R_j_pred = R_i @ quat_to_mat(rel.q)
    dyaw = _wrap(mat_to_ypr(R_j_pred)[0] - g.ypr[i, 0])
    return g._replace(
        loop_i=g.loop_i.at[k].set(i),
        loop_j=g.loop_j.at[k].set(jnp.asarray(j, jnp.int32)),
        loop_dt=g.loop_dt.at[k].set(rel.t),
        loop_dyaw=g.loop_dyaw.at[k].set(dyaw),
        loop_dq=g.loop_dq.at[k].set(rel.q),
        loop_mask=g.loop_mask.at[k].set(True),
        loop_w=g.loop_w.at[k].set(jnp.asarray(weight, jnp.float32)),
        n_loops=g.n_loops + 1,
    )



# robust loop-edge kernel: Geman-McClure IRLS weight from the edge's
# current combined error (meters + yaw-equivalent), lagged via
# stop_gradient so the matrix-free GN linearizes with frozen weights at
# each iterate.  One gross loop edge (a verification false-accept at the
# meter level) is then effectively switched off (w ~ (c/e)² for e ≫ c)
# instead of dragging the whole chain — measured: a single 2.4 m edge
# among 7 cm-grade ones cost 0.4 m node ATE under the softer Cauchy
# kernel.  This is the switchable-constraints idea (Sünderhauf) in IRLS
# form.
ROBUST_C = 0.3
# graduated non-convexity: anneal the kernel scale from wide (effectively
# non-robust, so LEGITIMATE meter-scale corrections are pulled in) down to
# ROBUST_C over the first GNC_STEPS GN iterations — without this the GM
# kernel resists any correction larger than c from iteration 0
GNC_STEPS = 6


def _robust_w(e_t, e_r, c=ROBUST_C):
    e = jax.lax.stop_gradient(e_t + 3.0 * e_r)
    return 1.0 / (1.0 + (e / c) ** 2)


def _gnc_c(it):
    """Kernel scale at GN iteration `it` (traced or static)."""
    return ROBUST_C * 2.0 ** jnp.clip(
        jnp.float32(GNC_STEPS) - jnp.asarray(it, jnp.float32), 0.0, 10.0)

def _residuals(x: jax.Array, g: PoseGraph, robust_c=ROBUST_C):
    """x: (N, 4) = (t, yaw) for all nodes.  Returns stacked residuals."""
    N = g.t.shape[0]
    t = x[:, :3]
    yaw = x[:, 3]
    ypr = jnp.stack([yaw, g.ypr[:, 1], g.ypr[:, 2]], -1)
    R = ypr_to_mat(ypr)                                   # (N,3,3)

    # sequential edges i → i+1
    i = jnp.arange(N - 1)
    dt_est = jnp.einsum("nij,nj->ni", R[i].transpose(0, 2, 1),
                        t[i + 1] - t[i])
    r_seq_t = (dt_est - g.seq_dt[i]) * g.seq_mask[i, None]
    r_seq_y = _wrap(yaw[i + 1] - yaw[i] - g.seq_dyaw[i]) * g.seq_mask[i]

    # loop edges
    li, lj = g.loop_i, g.loop_j
    dt_est_l = jnp.einsum("lij,lj->li", R[li].transpose(0, 2, 1),
                          t[lj] - t[li])
    raw_t = dt_est_l - g.loop_dt
    raw_y = _wrap(yaw[lj] - yaw[li] - g.loop_dyaw)
    w = g.loop_w * g.loop_mask \
        * _robust_w(jnp.linalg.norm(raw_t, axis=-1), jnp.abs(raw_y),
                    robust_c)
    r_loop_t = raw_t * w[:, None]
    r_loop_y = raw_y * w

    # gauge: pin node 0 at its stored (pre-optimization) pose
    anchor = jnp.concatenate([g.t[0], g.ypr[0, :1]])
    r_fix = 100.0 * (x[0] - anchor)
    return jnp.concatenate([
        r_seq_t.reshape(-1), r_seq_y, r_loop_t.reshape(-1), r_loop_y, r_fix])


def _wrap(a):
    return jnp.arctan2(jnp.sin(a), jnp.cos(a))


def _residuals6(x: jax.Array, g: PoseGraph, q0: jax.Array,
                robust_c=ROBUST_C):
    """Full SE(3) edge residuals.  x: (N, 6) = (t_abs, δθ) per node, with
    rotation locally parameterized as R = R0·exp(δθ) around the stored node
    rotation q0 (the boxplus the window solver uses too)."""
    N = g.t.shape[0]
    t = x[:, :3]
    q = quat_mul(q0, so3_exp_quat(x[:, 3:]))              # (N,4)

    i = jnp.arange(N - 1)
    dt_est = quat_rotate_inv(q[i], t[i + 1] - t[i])
    r_seq_t = (dt_est - g.seq_dt[i]) * g.seq_mask[i, None]
    dq_est = quat_mul(quat_conj(q[i]), q[i + 1])
    r_seq_r = so3_log_quat(quat_mul(quat_conj(g.seq_dq[i]), dq_est)) \
        * g.seq_mask[i, None]

    li, lj = g.loop_i, g.loop_j
    dt_est_l = quat_rotate_inv(q[li], t[lj] - t[li])
    raw_t = dt_est_l - g.loop_dt
    dq_est_l = quat_mul(quat_conj(q[li]), q[lj])
    raw_r = so3_log_quat(quat_mul(quat_conj(g.loop_dq), dq_est_l))
    w = g.loop_w * g.loop_mask \
        * _robust_w(jnp.linalg.norm(raw_t, axis=-1),
                    jnp.linalg.norm(raw_r, axis=-1), robust_c)
    r_loop_t = raw_t * w[:, None]
    r_loop_r = raw_r * w[:, None]

    # gauge: pin node 0 at its stored pose (position and rotation tangent)
    r_fix = 100.0 * jnp.concatenate([x[0, :3] - g.t[0], x[0, 3:]])
    return jnp.concatenate([
        r_seq_t.reshape(-1), r_seq_r.reshape(-1),
        r_loop_t.reshape(-1), r_loop_r.reshape(-1), r_fix])


# GN early exit: converged once the normal-equation gradient ∞-norm
# drops below this (meters-grade residual scale; a reap with no new
# meter-scale closure converges in 1-2 GN steps past the GNC window)
_GN_GRAD_TOL = 1e-4


def optimize_posegraph(g: PoseGraph, iters: int = 10,
                       cg_iters: int = 50,
                       four_dof: bool = True) -> PoseGraph:
    """Damped GN, normal equations solved by matrix-free CG.

    Hv = Jᵀ(Jv) is computed with one jvp + one vjp through the residual
    function — O(edges) per CG step, no materialized Jacobian.
    `four_dof=True` optimizes (t, yaw) per node (VINS-style, pitch/roll
    gravity-pinned); `four_dof=False` optimizes full SE(3).

    Both loops early-exit (`lax.while_loop`): CG stops at 1e-3 relative
    residual, GN stops when the gradient ∞-norm clears _GN_GRAD_TOL after
    the GNC annealing window — per-reap wall drops ~5x on an already-
    converged graph (the common case: one new closure per reap) while a
    fresh meter-scale correction still gets the full budget.
    """
    if not four_dof:
        return _optimize_posegraph6(g, iters, cg_iters)
    N = g.t.shape[0]
    x0 = jnp.concatenate([g.t, g.ypr[:, :1]], axis=-1)    # (N,4)

    def gn_body(carry):
        x, it, _ = carry
        f = lambda xx: _residuals(xx, g, _gnc_c(it))
        r = f(x)
        _, vjp = jax.vjp(f, x)
        grad = vjp(r)[0]

        def Hv(v):
            _, jv = jax.jvp(f, (x,), (v,))
            hv = vjp(jv)[0]
            return hv + 1e-4 * v                          # LM damping

        dx = _cg(Hv, -grad, cg_iters)
        mask = g.node_mask[:, None]
        gnorm = jnp.max(jnp.abs(jnp.where(mask, grad, 0.0)))
        return x + jnp.where(mask, dx, 0.0), it + 1, gnorm

    def gn_cond(carry):
        _, it, gnorm = carry
        # never exit inside the GNC annealing window: the kernel scale is
        # still widening its basin and the gradient can be transiently tiny
        return (it < iters) & ((it <= GNC_STEPS) | (gnorm > _GN_GRAD_TOL))

    x, _, _ = jax.lax.while_loop(
        gn_cond, gn_body, (x0, jnp.zeros((), jnp.int32), jnp.float32(1e9)))
    new_ypr = jnp.stack([x[:, 3], g.ypr[:, 1], g.ypr[:, 2]], -1)
    return g._replace(t=x[:, :3], ypr=new_ypr)


def _optimize_posegraph6(g: PoseGraph, iters: int, cg_iters: int
                         ) -> PoseGraph:
    """6-DoF variant: same GN+CG machinery over (N, 6) local coords.

    Each GN iteration re-centers the rotation parameterization (q0 ← q0·
    exp(δθ), δθ ← 0) so exp stays near identity and the linearization is
    well-conditioned even for large loop corrections."""
    N = g.t.shape[0]
    q0_init = mat_to_quat(ypr_to_mat(g.ypr))              # (N,4)
    x0 = jnp.concatenate([g.t, jnp.zeros((N, 3), g.t.dtype)], axis=-1)

    def gn_body(carry):
        x, q0, it, _ = carry
        f = lambda xx: _residuals6(xx, g, q0, _gnc_c(it))
        r = f(x)
        _, vjp = jax.vjp(f, x)
        grad = vjp(r)[0]

        def Hv(v):
            _, jv = jax.jvp(f, (x,), (v,))
            hv = vjp(jv)[0]
            return hv + 1e-4 * v                          # LM damping

        dx = _cg(Hv, -grad, cg_iters)
        mask = g.node_mask[:, None]
        x = x + jnp.where(mask, dx, 0.0)
        # re-center: fold the rotation tangent into q0
        q0 = quat_mul(q0, so3_exp_quat(x[:, 3:]))
        x = x.at[:, 3:].set(0.0)
        gnorm = jnp.max(jnp.abs(jnp.where(mask, grad, 0.0)))
        return x, q0, it + 1, gnorm

    def gn_cond(carry):
        _, _, it, gnorm = carry
        return (it < iters) & ((it <= GNC_STEPS) | (gnorm > _GN_GRAD_TOL))

    x, q0, _, _ = jax.lax.while_loop(
        gn_cond, gn_body,
        (x0, q0_init, jnp.zeros((), jnp.int32), jnp.float32(1e9)))
    return g._replace(t=x[:, :3], ypr=mat_to_ypr(quat_to_mat(q0)))


def _cg(Av, b, iters: int, rtol: float = 1e-3):
    """Conjugate gradient for SPD Av with relative-residual early exit."""
    x = jnp.zeros_like(b)
    r = b
    p = r
    rs0 = jnp.sum(r * r)

    def body(carry):
        x, r, p, rs, it = carry
        Ap = Av(p)
        alpha = rs / jnp.maximum(jnp.sum(p * Ap), 1e-12)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.maximum(rs, 1e-12)
        p = r + beta * p
        return x, r, p, rs_new, it + 1

    def cond(carry):
        _, _, _, rs, it = carry
        return (it < iters) & (rs > rtol * rtol * rs0)

    x, _, _, _, _ = jax.lax.while_loop(
        cond, body, (x, r, p, rs0, jnp.zeros((), jnp.int32)))
    return x


def graph_poses(g: PoseGraph) -> Pose:
    """Current optimized keyframe poses as a batched Pose."""
    return Pose(g.t, mat_to_quat(ypr_to_mat(g.ypr)))
