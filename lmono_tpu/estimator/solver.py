"""Dense Levenberg-Marquardt window solver with Schur elimination of depths.

Replaces the reference's Ceres DENSE_SCHUR + DOGLEG solve
(`Estimator.cc:1260-1277`): the window system is small (6·(W+1)+6 pose/
extrinsic dims + ≤max_tracks depths), so the whole Jacobian is materialized
densely by one `jacfwd` over the flat local delta — XLA turns that into a
single batched evaluation — and the normal equations are solved by Schur
complement on the depth block (diagonal), mirroring DENSE_SCHUR's
elimination order.

The outer loop is adaptive LM with accept/reject (the reference's Dogleg
adapts its trust region the same way): a step is taken only if it lowers
the robustified cost; otherwise λ is inflated and the step retried.  The
loop exits early once the relative cost decrease falls under
`lm_cost_tol` — like Ceres' function-tolerance stop — so steady-state
frames pay ~2-3 iterations instead of the full budget.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import EstimatorConfig
from lmono_tpu.estimator import factors
from lmono_tpu.estimator.window import WindowState


class SolveDiag(NamedTuple):
    cost0: jax.Array
    cost1: jax.Array
    iters: jax.Array


def _apply_delta(state: WindowState, delta: jax.Array) -> WindowState:
    t, q, ex_t, ex_q, inv_depth = factors.retract_window(state, delta)
    return state._replace(
        t=t, q=q, ex_t=ex_t, ex_q=ex_q,
        feats=state.feats._replace(inv_depth=inv_depth),
    )


def _lm_step(state: WindowState, lam: jax.Array, cfg: EstimatorConfig):
    """One LM attempt: assemble J at `state`, solve the λ-damped Schur
    system, and return (candidate, cost_at_state, cost_at_candidate)."""
    w1 = state.t.shape[0]
    M = state.feats.inv_depth.shape[0]
    P = 6 * w1 + 6          # pose+extrinsic dims
    D = P + M

    rw = factors.cauchy_weights(state, cfg)
    resid_fn = lambda d: factors.all_residuals(d, state, cfg, rw)
    zero = jnp.zeros(D, state.t.dtype)
    r = resid_fn(zero)
    J = jax.jacfwd(resid_fn)(zero)            # (R, D)
    H = J.T @ J
    g = J.T @ r
    damp = lam * (1.0 + jnp.diagonal(H))
    Hd = H + jnp.diag(damp)

    # Schur complement on the depth block (diagonal in theory; solved
    # as block elimination: depths x_l = D⁻¹(g_l − Hlpᵀ x_p))
    Hpp = Hd[:P, :P]
    Hpl = Hd[:P, P:]
    Hll_diag = jnp.diagonal(Hd)[P:]
    gl = g[P:]
    gp = g[:P]
    inv_ll = 1.0 / jnp.maximum(Hll_diag, 1e-8)
    S = Hpp - (Hpl * inv_ll[None, :]) @ Hpl.T
    rhs = gp - Hpl @ (inv_ll * gl)
    dp = -jnp.linalg.solve(S, rhs)
    dl = -inv_ll * (gl + Hpl.T @ dp)
    delta = jnp.concatenate([dp, dl])
    ok = jnp.all(jnp.isfinite(delta))
    delta = jnp.where(ok, delta, 0.0)
    # safety clamp only (pathological steps); LM reject handles the rest
    norm = jnp.linalg.norm(delta)
    delta = delta * jnp.minimum(1.0, cfg.lm_step_max / jnp.maximum(norm, 1e-12))

    cost0 = jnp.sum(r * r)
    r_new = resid_fn(delta)                   # same robust weights: fair compare
    cost1 = jnp.sum(r_new * r_new)
    candidate = _apply_delta(state, delta)
    return candidate, cost0, cost1


def solve_window(state: WindowState, cfg: EstimatorConfig
                 ) -> tuple[WindowState, SolveDiag]:
    """Adaptive LM on the full window problem: up to cfg.gn_iters attempts,
    accept/reject with λ schedule, early exit on cost-decrease tolerance."""

    def cond(carry):
        _, lam, _, it, done, _ = carry
        return (~done) & (it < cfg.gn_iters)

    def body(carry):
        st, lam, cost_prev, it, done, cost_first = carry
        cand, cost0, cost1 = _lm_step(st, lam, cfg)
        accept = (cost1 < cost0) & jnp.isfinite(cost1)
        st = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), cand, st)
        lam = jnp.where(accept,
                        jnp.maximum(lam * 0.33, cfg.lm_lambda_min),
                        jnp.minimum(lam * 6.0, cfg.lm_lambda_max))
        # converged: accepted step barely moved the cost
        rel = (cost0 - cost1) / jnp.maximum(cost0, 1e-12)
        done = accept & (rel < cfg.lm_cost_tol)
        # stuck: λ saturated with no acceptance
        done = done | (~accept & (lam >= cfg.lm_lambda_max))
        cost_first = jnp.where(it == 0, cost0, cost_first)
        cost_cur = jnp.where(accept, cost1, cost0)
        return st, lam, cost_cur, it + 1, done, cost_first

    lam0 = jnp.asarray(cfg.lm_lambda_init, state.t.dtype)
    zero = jnp.zeros((), state.t.dtype)
    st, lam, cost, it, done, cost_first = jax.lax.while_loop(
        cond, body,
        (state, lam0, zero, jnp.zeros((), jnp.int32),
         jnp.zeros((), bool), zero))
    return st, SolveDiag(cost0=cost_first, cost1=cost, iters=it)


def outlier_rejection(state: WindowState, cfg: EstimatorConfig) -> WindowState:
    """Disable features whose mean reprojection error exceeds the gate
    (reference `Estimator::outliersRejection`, Estimator.cc:134-190)."""
    r, active = factors.reprojection_residuals(
        state.t, state.q, state.ex_t, state.ex_q, state.feats.inv_depth,
        state, cfg)
    # r is scaled by FACTOR_WEIGHT ⇒ pixel error at the virtual focal is
    # |r| / factor_weight · focal (the reference gates ave_err·FACTOR_WEIGHT
    # directly, Estimator.cc:179,455)
    err_px = jnp.linalg.norm(r, axis=-1) * (cfg.focal_length
                                            / cfg.factor_weight)
    sum_err = jnp.sum(jnp.where(active, err_px, 0.0), axis=-1)
    cnt = jnp.maximum(jnp.sum(active, axis=-1), 1)
    mean_err = sum_err / cnt
    bad = (mean_err > cfg.outlier_reproj_px) & (jnp.sum(active, axis=-1) > 0)
    neg_depth = state.feats.depth_ok & (state.feats.inv_depth < 0.0)
    drop = bad | neg_depth
    feats = state.feats._replace(
        depth_ok=state.feats.depth_ok & ~drop,
        alive=state.feats.alive & ~drop,
    )
    return state._replace(feats=feats)
