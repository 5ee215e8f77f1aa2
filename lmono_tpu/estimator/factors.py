"""Residual functions for the sliding-window fusion problem.

One flat local-perturbation vector δ parameterizes the whole window
(6 per pose + 6 extrinsic + 1 per feature depth); every factor is written as
a function of the *retracted* state, so `jax.jacfwd` at δ=0 yields exactly
the analytic Jacobians the reference hand-derives in
`include/factor/LaserFactor.h:45-100` (laser relative pose),
`src/factor/MonoProjectionFactor.cc:40-174` (reprojection w.r.t. poses,
extrinsic, inverse depth), `include/factor/PriorFactor.h:25-74` (extrinsic
prior), and `src/factor/MarginalizationFactor.cc:309-373` (linearized prior)
— without transcribing any of them.

Residual weighting matches the reference:
  laser:  sqrt_info = LASER_W · FACTOR_WEIGHT · I₆    (Estimator.cc:95)
  reproj: sqrt_info = FACTOR_WEIGHT · I₂ + Cauchy(1) IRLS  (Estimator.cc:94,
          loss at :1130 — the robust scale applies to the *weighted* residual)
  prior:  diag(PRIOR_T·I₃, PRIOR_R·I₃)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lmono_tpu.config import EstimatorConfig
from lmono_tpu.estimator.window import WindowState
from lmono_tpu.utils.lie import (
    Pose,
    boxminus,
    boxplus,
    quat_conj,
    quat_mul,
    quat_rotate,
    quat_rotate_inv,
)


def retract_window(state: WindowState, delta: jax.Array):
    """Apply flat local delta: (W1*6 poses | 6 extrinsic | M depths)."""
    w1 = state.t.shape[0]
    M = state.feats.inv_depth.shape[0]
    dp = delta[: w1 * 6].reshape(w1, 6)
    t = state.t + dp[:, :3]
    q = boxplus(state.q, dp[:, 3:6])
    dex = delta[w1 * 6: w1 * 6 + 6]
    ex_t = state.ex_t + dex[:3]
    ex_q = boxplus(state.ex_q, dex[3:6])
    dl = delta[w1 * 6 + 6: w1 * 6 + 6 + M]
    inv_depth = state.feats.inv_depth + dl
    return t, q, ex_t, ex_q, inv_depth


def laser_residuals(t, q, state: WindowState, cfg: EstimatorConfig):
    """Relative-pose residuals between consecutive window frames from laser
    odometry.  (W1-1, 6), masked by window occupancy."""
    w1 = state.t.shape[0]
    i = jnp.arange(w1 - 1)
    j = i + 1
    # measured relative (laser odometry frame)
    dq_meas = quat_mul(quat_conj(state.lq[i]), state.lq[j])
    dp_meas = quat_rotate_inv(state.lq[i], state.lt[j] - state.lt[i])
    # estimated relative
    dp_est = quat_rotate_inv(q[i], t[j] - t[i])
    dq_est = quat_mul(quat_conj(q[i]), q[j])
    r_p = dp_est - dp_meas
    r_q = 2.0 * quat_mul(quat_conj(dq_meas), dq_est)[..., 1:4]
    r = jnp.concatenate([r_p, r_q], axis=-1)
    active = (j < state.count)[:, None]
    w = cfg.laser_w * cfg.factor_weight
    return jnp.where(active, w * r, 0.0)


def reprojection_residuals(t, q, ex_t, ex_q, inv_depth,
                           state: WindowState, cfg: EstimatorConfig):
    """Inverse-depth reprojection residuals for every (feature, frame) obs.

    Feature m anchored at frame a with normalized obs n_a and inverse depth
    λ: 3D point in anchor camera = [n_a, 1]/λ; reprojected into every other
    observing frame j through T_W_C = T_W_L ∘ T_CL⁻¹.
    Returns ((M, W1, 2) residuals, (M, W1) active mask).
    """
    feats = state.feats
    M, W1 = feats.obs_mask.shape

    anchor = feats.anchor                                     # (M,)
    n_a = jnp.take_along_axis(
        feats.obs, anchor[:, None, None].astype(jnp.int32), axis=1)[:, 0]  # (M,2)
    depth = 1.0 / jnp.maximum(inv_depth, 1e-4)                # (M,)
    p_anchor_cam = jnp.concatenate(
        [n_a, jnp.ones((M, 1), n_a.dtype)], axis=-1) * depth[:, None]

    # anchor camera → laser → world
    t_a = t[anchor]
    q_a = q[anchor]
    # T_W_C = T_W_L ∘ T_CL⁻¹ ⇒ x_W = R_wl (R_cl⁻¹ (x_C − t_cl)) + t_wl
    p_l = quat_rotate_inv(ex_q, p_anchor_cam - ex_t)
    p_w = quat_rotate(q_a, p_l) + t_a                         # (M,3)

    # world → each frame j camera
    p_lj = quat_rotate_inv(q[None, :, :], p_w[:, None, :] - t[None, :, :])
    p_cj = quat_rotate(ex_q, p_lj) + ex_t                     # (M, W1, 3)
    z = p_cj[..., 2]
    proj = p_cj[..., :2] / jnp.maximum(z[..., None], 1e-4)
    r = proj - feats.obs                                      # (M, W1, 2)

    frame_idx = jnp.arange(W1)[None, :]
    active = (feats.obs_mask
              & feats.alive[:, None]
              & feats.depth_ok[:, None]
              & (frame_idx != anchor[:, None])
              & (frame_idx < state.count)
              & (z > 0.1))
    # sqrt_info = FACTOR_WEIGHT · I₂ exactly as the reference sets it at
    # Estimator.cc:94 (NOT focal-scaled): with factor_weight=1000 and
    # laser sqrt_info = laser_w·factor_weight = 2000 (Estimator.cc:95), the
    # laser:vision weight ratio is 2:1 per unit — this balance is what lets
    # the vision factors actually pull pose error out of the laser odometry.
    w = cfg.factor_weight
    return jnp.where(active[..., None], w * r, 0.0), active


def extrinsic_prior_residual(ex_t, ex_q, state: WindowState,
                             cfg: EstimatorConfig):
    """6-dim prior pinning T_CL after FINE_TIMES refinements
    (reference PriorFactor added at Estimator.cc:1155-1165).  With
    estimate_laser==0 the prior is active from the start, freezing the
    extrinsic at its seed."""
    r_t = ex_t - state.ex_ref_t
    r_q = boxminus(state.ex_ref_q, ex_q)
    frozen = (state.ex_refines >= cfg.fine_times) | (cfg.estimate_laser == 0)
    # while refining, keep a weak anchor: the extrinsic has a flat direction
    # under near-constant-twist motion (screw symmetry), and an unregularized
    # GN walks away along it.  σ≈7 cm / 2° vs the hard freeze afterwards.
    w = jnp.where(frozen, 1.0, 0.015)
    return w * jnp.concatenate([cfg.prior_t * r_t, cfg.prior_r * r_q])


def marg_prior_residuals(t, q, ex_t, ex_q, state: WindowState):
    """r = r0 + J · (x ⊟ x0) with first-estimate Jacobians."""
    pr = state.prior
    w1 = state.t.shape[0]
    d_pose = jnp.concatenate(
        [t - pr.lin_t, boxminus(pr.lin_q, q)], axis=-1).reshape(w1 * 6)
    d_ex = jnp.concatenate([ex_t - pr.lin_ex_t,
                            boxminus(pr.lin_ex_q, ex_q)])
    dx = jnp.concatenate([d_pose, d_ex])
    r = pr.r0 + pr.J @ dx
    return jnp.where(pr.valid, r, 0.0)


def gauge_residual(t, q, state: WindowState, weight: float = 1e4):
    """Soft gauge fix: pin pose 0 at its current linearization value when no
    marginalization prior exists yet (the prior fixes the gauge afterwards).
    """
    r = jnp.concatenate([t[0] - state.t[0], boxminus(state.q[0], q[0])])
    w = jnp.where(state.prior.valid, 1e2, weight)
    return w * r


def all_residuals(delta: jax.Array, state: WindowState,
                  cfg: EstimatorConfig, reproj_weights: jax.Array):
    """Stacked residual vector for the GN solver.

    reproj_weights: (M, W1) IRLS robust weights (√Cauchy), computed outside
    the differentiated function so the robustified problem stays GN.
    """
    t, q, ex_t, ex_q, inv_depth = retract_window(state, delta)
    r_laser = laser_residuals(t, q, state, cfg).reshape(-1)
    r_rep, active = reprojection_residuals(
        t, q, ex_t, ex_q, inv_depth, state, cfg)
    r_rep = (r_rep * reproj_weights[..., None]).reshape(-1)
    r_ex = extrinsic_prior_residual(ex_t, ex_q, state, cfg)
    r_marg = marg_prior_residuals(t, q, ex_t, ex_q, state)
    r_gauge = gauge_residual(t, q, state)
    return jnp.concatenate([r_laser, r_rep, r_ex, r_marg, r_gauge])


def cauchy_weights(state: WindowState, cfg: EstimatorConfig):
    """IRLS √weights for the Cauchy loss on current reprojection residuals
    (reference wraps MonoProjectionFactor in ceres::CauchyLoss(1)).."""
    r, active = reprojection_residuals(
        state.t, state.q, state.ex_t, state.ex_q, state.feats.inv_depth,
        state, cfg)
    # r already carries the FACTOR_WEIGHT scaling; Cauchy scale c=1 applies
    # to the weighted residual exactly like ceres::CauchyLoss(1.0) at
    # Estimator.cc:1130
    s2 = jnp.sum(r * r, axis=-1)
    w = 1.0 / jnp.sqrt(1.0 + s2 / (cfg.cauchy_c ** 2))
    return jnp.where(active, jnp.sqrt(w), 0.0)
