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

The dropped block is eliminated in two stages — depths first (their block is
diagonal: each depth only appears in its own feature's rows), then pose 0
from the reduced (P, P) system.  Schur complements compose, so this equals
the joint elimination; staging it this way makes the landmark axis shardable:
with `axis` set (inside `shard_map`), each device assembles only its own
feature rows' contributions and two `psum`s of (P, P)/(P,) arrays rebuild the
identical global reduced system (the collective counterpart of the pthread
H-assembly fan-out the reference scaffolds but never uses,
`MarginalizationFactor.cc:143-174`).

The produced prior is expressed directly in *post-slide* indexing (old slot
i+1 → new slot i), so `slide_old` can be applied right after.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lmono_tpu.config import EstimatorConfig
from lmono_tpu.estimator import factors
from lmono_tpu.estimator.window import MargPrior, WindowState


def marginalize_oldest(state: WindowState, cfg: EstimatorConfig,
                       axis: str | None = None) -> MargPrior:
    """Compute the post-slide prior from marginalizing pose 0 (+ depths of
    features anchored there).  With `axis`, `state.feats` holds this
    device's landmark rows (poses replicated) and the result is replicated.
    """
    w1 = state.t.shape[0]
    Ml = state.feats.inv_depth.shape[0]
    P = 6 * w1 + 6

    rw = factors.cauchy_weights(state, cfg)
    anchored0 = (state.feats.anchor == 0) & state.feats.alive \
        & state.feats.depth_ok

    def rep_resid(d):
        """Reprojection rows of slot-0-anchored features (landmark-local)."""
        t, q, ex_t, ex_q, inv_depth = factors.retract_window(state, d)
        r, _ = factors.reprojection_residuals(
            t, q, ex_t, ex_q, inv_depth, state, cfg)
        return jnp.where(anchored0[:, None, None],
                         r * rw[..., None], 0.0).reshape(-1)

    def pose_resid(dp):
        """Pose-only factors touching pose 0 (identical on every device)."""
        d = jnp.concatenate([dp, jnp.zeros(Ml, dp.dtype)])
        t, q, ex_t, ex_q, _ = factors.retract_window(state, d)
        r_laser0 = factors.laser_residuals(t, q, state, cfg)[0]
        r_marg = factors.marg_prior_residuals(t, q, ex_t, ex_q, state)
        r_gauge = factors.gauge_residual(t, q, state)
        return jnp.concatenate([r_laser0, r_marg, r_gauge])

    zero = jnp.zeros(P + Ml, state.t.dtype)
    r_rep = rep_resid(zero)
    J_rep = jax.jacfwd(rep_resid)(zero)                # (R_loc, P + Ml)
    zp = jnp.zeros(P, state.t.dtype)
    r_pose = pose_resid(zp)
    J_pose = jax.jacfwd(pose_resid)(zp)

    Jp, Jl = J_rep[:, :P], J_rep[:, P:]
    Hpp = Jp.T @ Jp
    gp = Jp.T @ r_rep
    Hpl = Jp.T @ Jl                                    # (P, Ml) local
    Hll = jnp.sum(Jl * Jl, axis=0)                     # diagonal depth block
    gl = Jl.T @ r_rep

    # stage 1: eliminate depths (local, diagonal) → reduced (P, P) system
    inv_ll = 1.0 / (Hll + 1e-8)
    S_P = Hpp - (Hpl * inv_ll[None, :]) @ Hpl.T
    b_P = gp - Hpl @ (inv_ll * gl)
    if axis is not None:
        S_P = jax.lax.psum(S_P, axis)
        b_P = jax.lax.psum(b_P, axis)
    S_P = S_P + J_pose.T @ J_pose
    b_P = b_P + J_pose.T @ r_pose

    # stage 2: eliminate pose 0 (first 6 local coords) from the reduced sys
    Hdd = S_P[:6, :6] + 1e-8 * jnp.eye(6, dtype=S_P.dtype)
    Hkd = S_P[6:, :6]
    Hdd_inv = jnp.linalg.inv(Hdd)
    S = S_P[6:, 6:] - Hkd @ Hdd_inv @ Hkd.T
    bs = b_P[6:] - Hkd @ (Hdd_inv @ b_P[:6])

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
    J_full = jnp.zeros((P, P), S.dtype)
    r_full = jnp.zeros((P,), S.dtype)
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
