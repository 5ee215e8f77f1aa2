"""Sliding-window marginalization: Schur complement → linearized FEJ prior.

Rebuild of the reference's VINS-style marginalization
(`src/factor/MarginalizationFactor.cc:176-272`): gather every factor that
touches the departing oldest pose (the 0↔1 laser factor, reprojection factors
of features anchored at slot 0, the existing prior, the gauge prior), form
the dense normal equations via one `jacfwd`, Schur-eliminate the dropped
block (pose 0 + anchored depths), and convert the reduced information back
into a √-form linear factor via eigendecomposition — evaluated at
first-estimate Jacobians thereafter (`Marginalization::Evaluate`,
`MarginalizationFactor.cc:309-373`).

The produced prior is expressed directly in *post-slide* indexing (old slot
i+1 → new slot i), so `slide_old` can be applied right after.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lmono_tpu.config import EstimatorConfig
from lmono_tpu.estimator import factors
from lmono_tpu.estimator.window import MargPrior, WindowState


def _marg_residuals(delta, state: WindowState, cfg: EstimatorConfig,
                    reproj_weights):
    """Residuals of only the factors that touch pose 0."""
    t, q, ex_t, ex_q, inv_depth = factors.retract_window(state, delta)

    r_laser_all = factors.laser_residuals(t, q, state, cfg)
    r_laser0 = r_laser_all[0]                              # factor (0,1)

    r_rep, active = factors.reprojection_residuals(
        t, q, ex_t, ex_q, inv_depth, state, cfg)
    anchored0 = (state.feats.anchor == 0) & state.feats.alive \
        & state.feats.depth_ok
    r_rep = jnp.where(anchored0[:, None, None],
                      r_rep * reproj_weights[..., None], 0.0).reshape(-1)

    r_marg = factors.marg_prior_residuals(t, q, ex_t, ex_q, state)
    r_gauge = factors.gauge_residual(t, q, state)
    return jnp.concatenate([r_laser0, r_rep, r_marg, r_gauge])


def marginalize_oldest(state: WindowState, cfg: EstimatorConfig) -> MargPrior:
    """Compute the post-slide prior from marginalizing pose 0 (+ depths of
    features anchored there)."""
    w1 = state.t.shape[0]
    M = state.feats.inv_depth.shape[0]
    P = 6 * w1 + 6
    D = P + M

    rw = factors.cauchy_weights(state, cfg)
    zero = jnp.zeros(D, state.t.dtype)
    resid = lambda d: _marg_residuals(d, state, cfg, rw)
    r = resid(zero)
    J = jax.jacfwd(resid)(zero)
    H = J.T @ J
    b = J.T @ r

    # dropped: pose0 local coords [0:6) and ALL depth coords [P:D) — depths
    # not anchored at 0 carry no information in these factors, so eliminating
    # them (with damping) is a no-op for the Schur complement.
    keep = jnp.concatenate([jnp.arange(6, P)])
    drop = jnp.concatenate([jnp.arange(0, 6), jnp.arange(P, D)])

    Hkk = H[jnp.ix_(keep, keep)]
    Hkd = H[jnp.ix_(keep, drop)]
    Hdd = H[jnp.ix_(drop, drop)] + 1e-8 * jnp.eye(drop.shape[0], dtype=H.dtype)
    bk = b[keep]
    bd = b[drop]

    Hdd_inv = jnp.linalg.inv(Hdd)
    S = Hkk - Hkd @ Hdd_inv @ Hkd.T
    bs = bk - Hkd @ (Hdd_inv @ bd)

    # √-form via eigendecomposition (MarginalizationFactor.cc:254-266)
    S = 0.5 * (S + S.T)
    lam, U = jnp.linalg.eigh(S)
    lam_pos = jnp.where(lam > 1e-8, lam, 0.0)
    sqrt_l = jnp.sqrt(lam_pos)
    inv_sqrt_l = jnp.where(lam > 1e-8, 1.0 / jnp.sqrt(jnp.maximum(lam, 1e-8)),
                           0.0)
    J_lin = (U * sqrt_l[None, :]).T                        # (K, K)
    r_lin = (U * inv_sqrt_l[None, :]).T @ bs               # (K,)

    # re-index to post-slide coordinates: kept dims are [pose1..poseW | ex].
    # new pose slot i ← old slot i+1 for i in 0..W-1; new slot W gets no info.
    K = P - 6
    J_full = jnp.zeros((P, P), H.dtype)
    r_full = jnp.zeros((P,), H.dtype)
    # kept block occupies the first 6*(w1-1) pose dims and the last 6 ex dims
    pose_dims = 6 * (w1 - 1)
    J_full = J_full.at[:K, :pose_dims].set(J_lin[:, :pose_dims])
    J_full = J_full.at[:K, 6 * w1:].set(J_lin[:, pose_dims:])
    r_full = r_full.at[:K].set(r_lin)

    # linearization point: post-slide poses (shifted) + extrinsic
    def shift_left(x):
        return jnp.concatenate([x[1:], x[-1:]], axis=0)

    return MargPrior(
        J=J_full, r0=r_full,
        lin_t=shift_left(state.t), lin_q=shift_left(state.q),
        lin_ex_t=state.ex_t, lin_ex_q=state.ex_q,
        valid=jnp.ones((), bool),
    )
