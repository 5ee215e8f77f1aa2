"""Dense Gauss-Newton window solver with Schur elimination of depths.

Replaces the reference's Ceres DENSE_SCHUR + DOGLEG solve
(`Estimator.cc:1260-1277`): the window system is small (6·(W+1)+6 pose/
extrinsic dims + ≤max_tracks depths), so the whole Jacobian is materialized
densely by one `jacfwd` over the flat local delta — XLA turns that into a
single batched evaluation — and the normal equations are solved by Schur
complement on the depth block (diagonal), mirroring DENSE_SCHUR's
elimination order, with Levenberg damping.
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


def solve_window(state: WindowState, cfg: EstimatorConfig) -> tuple[WindowState, SolveDiag]:
    """Run cfg.gn_iters damped GN iterations on the full window problem."""
    w1 = state.t.shape[0]
    M = state.feats.inv_depth.shape[0]
    P = 6 * w1 + 6          # pose+extrinsic dims
    D = P + M

    def gn_iter(state: WindowState, _):
        rw = factors.cauchy_weights(state, cfg)
        resid_fn = lambda d: factors.all_residuals(d, state, cfg, rw)
        zero = jnp.zeros(D, state.t.dtype)
        r = resid_fn(zero)
        J = jax.jacfwd(resid_fn)(zero)            # (R, D)
        H = J.T @ J
        g = J.T @ r
        lam = cfg.gn_damping_init
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
        # trust region: clamp the step so flat directions can't explode
        norm = jnp.linalg.norm(delta)
        delta = delta * jnp.minimum(1.0, 1.0 / jnp.maximum(norm, 1e-12))
        new_state = _apply_delta(state, delta)
        # cost for diagnostics (unweighted refresh next iter)
        cost = jnp.sum(r * r)
        return new_state, cost

    state1, costs = jax.lax.scan(gn_iter, state, None, length=cfg.gn_iters)
    return state1, SolveDiag(cost0=costs[0], cost1=costs[-1],
                             iters=jnp.asarray(cfg.gn_iters))


def outlier_rejection(state: WindowState, cfg: EstimatorConfig) -> WindowState:
    """Disable features whose mean reprojection error exceeds the gate
    (reference `Estimator::outliersRejection`, Estimator.cc:134-190)."""
    r, active = factors.reprojection_residuals(
        state.t, state.q, state.ex_t, state.ex_q, state.feats.inv_depth,
        state, cfg)
    # r is scaled by FOCAL/1.5 ⇒ pixel err ≈ |r| · 1.5
    err_px = jnp.linalg.norm(r, axis=-1) * 1.5
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
