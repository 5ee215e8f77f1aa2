"""Distributed sliding-window BA over the device mesh (SURVEY §7.7).

The window problem's Schur structure — depths are the eliminated block,
poses the reduced system, which the reference exploits *serially* via Ceres
DENSE_SCHUR (`mono_lidar_mapping/src/image_process/Estimator.cc:1124-1305`,
`src/factor/MarginalizationFactor.cc:176-272`) — maps onto the mesh as:

* the landmark axis M is sharded: every device assembles the reprojection
  residuals + Jacobians of its own feature rows only (`shard_map`, explicit);
* each device Schur-eliminates its own depth block locally (the depth block
  is diagonal, so elimination never crosses shards);
* the reduced pose system (P = 6·(W+1)+6 dims) is `psum`-reduced over ICI
  and solved replicated — it is tiny;
* depth back-substitution is purely local.

Communication per LM attempt: one psum of (P, P) + (P,) arrays — a few tens
of KB, independent of the landmark count.  The adaptive-LM accept/reject
loop runs *inside* the shard_map, so control flow stays on-device and the
collectives sit inside one compiled while_loop.

Numerics match `solver.solve_window` bit-for-bit in structure (same robust
weights, same λ-damping, same Schur elimination, same accept/reject
schedule); `tests/test_dist_window.py` asserts allclose between the sharded
and single-device solves on the 8-device mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmono_tpu.config import EstimatorConfig
from lmono_tpu.estimator import factors
from lmono_tpu.estimator.solver import SolveDiag, _apply_delta
from lmono_tpu.estimator.window import FeatureTable, MargPrior, WindowState


def window_specs(axis: str) -> WindowState:
    """PartitionSpec pytree: feature rows sharded, everything else replicated."""
    s, r = P(axis), P()
    return WindowState(
        t=r, q=r, lt=r, lq=r,
        ex_t=r, ex_q=r, ex_ref_t=r, ex_ref_q=r,
        feats=FeatureTable(ids=s, anchor=s, obs=s, obs_mask=s,
                           inv_depth=s, depth_ok=s, alive=s),
        prior=MargPrior(J=r, r0=r, lin_t=r, lin_q=r,
                        lin_ex_t=r, lin_ex_q=r, valid=r),
        count=r, initialized=r, ex_refines=r,
    )


def _local_lm_step(st: WindowState, lam: jax.Array, cfg: EstimatorConfig,
                   axis: str):
    """One LM attempt on the landmark-sharded window problem.

    `st.feats` holds this device's M/D feature rows; poses are replicated.
    Returns (candidate_state, cost0, cost1) — costs are global (psum'd).
    """
    w1 = st.t.shape[0]
    Ml = st.feats.inv_depth.shape[0]
    Pd = 6 * w1 + 6
    D = Pd + Ml

    rw = factors.cauchy_weights(st, cfg)          # local rows only

    def rep_resid(d):
        t, q, ex_t, ex_q, inv_depth = factors.retract_window(st, d)
        r, _ = factors.reprojection_residuals(
            t, q, ex_t, ex_q, inv_depth, st, cfg)
        return (r * rw[..., None]).reshape(-1)

    def pose_resid(dp):
        d = jnp.concatenate([dp, jnp.zeros(Ml, dp.dtype)])
        t, q, ex_t, ex_q, _ = factors.retract_window(st, d)
        return jnp.concatenate([
            factors.laser_residuals(t, q, st, cfg).reshape(-1),
            factors.extrinsic_prior_residual(ex_t, ex_q, st, cfg),
            factors.marg_prior_residuals(t, q, ex_t, ex_q, st),
            factors.gauge_residual(t, q, st),
        ])

    zero = jnp.zeros(D, st.t.dtype)
    r_rep = rep_resid(zero)
    J_rep = jax.jacfwd(rep_resid)(zero)           # (R_loc, Pd + Ml)
    zp = jnp.zeros(Pd, st.t.dtype)
    r_pose = pose_resid(zp)                       # identical on every device
    J_pose = jax.jacfwd(pose_resid)(zp)

    Jp, Jl = J_rep[:, :Pd], J_rep[:, Pd:]
    # reduced pose system: psum landmark contributions, add the (replicated)
    # pose-only factors once — every device holds the identical global H/g
    Hpp = jax.lax.psum(Jp.T @ Jp, axis) + J_pose.T @ J_pose
    gp = jax.lax.psum(Jp.T @ r_rep, axis) + J_pose.T @ r_pose
    Hpl = Jp.T @ Jl                               # (Pd, Ml) local
    Hll = jnp.sum(Jl * Jl, axis=0)                # diagonal depth block, local
    gl = Jl.T @ r_rep

    # λ-damping identical to the dense single-device solver
    Hpp_d = Hpp + jnp.diag(lam * (1.0 + jnp.diagonal(Hpp)))
    Hll_d = Hll + lam * (1.0 + Hll)
    inv_ll = 1.0 / jnp.maximum(Hll_d, 1e-8)

    S = Hpp_d - jax.lax.psum((Hpl * inv_ll[None, :]) @ Hpl.T, axis)
    rhs = gp - jax.lax.psum(Hpl @ (inv_ll * gl), axis)
    dp = -jnp.linalg.solve(S, rhs)                # replicated (identical)
    dl = -inv_ll * (gl + Hpl.T @ dp)              # local back-substitution

    bad_local = (~jnp.all(jnp.isfinite(dl))).astype(jnp.float32)
    ok = jnp.all(jnp.isfinite(dp)) & (jax.lax.psum(bad_local, axis) == 0)
    norm = jnp.sqrt(jnp.sum(dp * dp) + jax.lax.psum(jnp.sum(dl * dl), axis))
    scale = jnp.minimum(1.0, cfg.lm_step_max / jnp.maximum(norm, 1e-12))
    scale = jnp.where(ok, scale, 0.0)
    delta = jnp.concatenate([dp, dl]) * scale

    cost0 = jax.lax.psum(jnp.sum(r_rep * r_rep), axis) \
        + jnp.sum(r_pose * r_pose)
    r_rep_new = rep_resid(delta)
    r_pose_new = pose_resid(delta[:Pd])
    cost1 = jax.lax.psum(jnp.sum(r_rep_new * r_rep_new), axis) \
        + jnp.sum(r_pose_new * r_pose_new)
    return _apply_delta(st, delta), cost0, cost1


def _lm_loop(st: WindowState, cfg: EstimatorConfig, axis: str):
    """Adaptive LM accept/reject loop (mirrors `solver.solve_window`)."""

    def cond(carry):
        _, lam, _, it, done, _ = carry
        return (~done) & (it < cfg.gn_iters)

    def body(carry):
        st, lam, cost_prev, it, done, cost_first = carry
        cand, cost0, cost1 = _local_lm_step(st, lam, cfg, axis)
        accept = (cost1 < cost0) & jnp.isfinite(cost1)
        st = jax.tree.map(lambda a, b: jnp.where(accept, a, b), cand, st)
        lam = jnp.where(accept,
                        jnp.maximum(lam * 0.33, cfg.lm_lambda_min),
                        jnp.minimum(lam * 6.0, cfg.lm_lambda_max))
        rel = (cost0 - cost1) / jnp.maximum(cost0, 1e-12)
        done = accept & (rel < cfg.lm_cost_tol)
        done = done | (~accept & (lam >= cfg.lm_lambda_max))
        cost_first = jnp.where(it == 0, cost0, cost_first)
        cost_cur = jnp.where(accept, cost1, cost0)
        return st, lam, cost_cur, it + 1, done, cost_first

    lam0 = jnp.asarray(cfg.lm_lambda_init, st.t.dtype)
    zero = jnp.zeros((), st.t.dtype)
    st, lam, cost, it, done, cost_first = jax.lax.while_loop(
        cond, body,
        (st, lam0, zero, jnp.zeros((), jnp.int32),
         jnp.zeros((), bool), zero))
    return st, SolveDiag(cost0=cost_first, cost1=cost, iters=it)


def make_sharded_solve(mesh: Mesh, cfg: EstimatorConfig, axis: str = "kf"):
    """Build the jitted landmark-sharded window solver.

    Returns f(state) -> (state, SolveDiag); `state.feats` arrays must have
    their leading (landmark) dim divisible by the mesh axis size, and inputs
    should be device_put with `window_shardings(mesh, axis)`.
    """
    nd = mesh.shape[axis]
    if cfg.max_tracks % nd != 0:
        raise ValueError(
            f"max_tracks={cfg.max_tracks} not divisible by mesh axis "
            f"'{axis}' size {nd}")
    specs = window_specs(axis)

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(specs,), out_specs=(specs, P()))
    def solve(state):
        return _lm_loop(state, cfg, axis)

    return jax.jit(solve)


def window_shardings(mesh: Mesh, axis: str = "kf") -> WindowState:
    """NamedSharding pytree for device_put of a WindowState."""
    return jax.tree.map(lambda sp: NamedSharding(mesh, sp),
                        window_specs(axis),
                        is_leaf=lambda x: isinstance(x, P))
