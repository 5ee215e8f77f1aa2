"""Initialization: hand-eye extrinsic rotation (AX=XB) + relative pose from
the essential matrix.

Rebuild of the reference's `AXXBSolver` (`src/initial/AxxbSolver.cc:14-147`)
and `MotionEstimator` 5-pt path (`src/initial/Solve_5pts.cc`): camera
relative rotations come from essential-matrix decomposition of the tracked
correspondences (8-point RANSAC on normalized coords instead of Nistér
5-point — equivalent information, batched-friendly); the extrinsic rotation
solves the stacked quaternion Kronecker system with Huber angular weighting,
gated on the second-smallest singular value > 0.25 exactly as the reference
(`AxxbSolver.cc:140-146`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.ops.ransac import ransac_fundamental
from lmono_tpu.utils.lie import (
    mat_to_quat,
    quat_conj,
    quat_mul,
    quat_to_mat,
    so3_log_quat,
)


def decompose_essential(E: jax.Array):
    """E → (R1, R2, t) candidates (standard SVD factorization)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


def _cheirality_count(R, t, x0, x1, mask):
    """Count correspondences triangulating in front of both cameras for
    candidate (R, t) with x1 ≈ proj(R x0 + t) (cam1-from-cam0)."""
    d0 = jnp.concatenate([x0, jnp.ones_like(x0[..., :1])], -1)
    d1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], -1)
    # two-view midpoint triangulation in cam0 frame
    d1_in0 = d1 @ R          # rows: Rᵀ d1
    # z0·R d0 − z1·d1 = −t  ⇒  2x2 normal equations per correspondence
    a00 = jnp.sum(d0 * d0, -1)
    a01 = -jnp.sum(d0 * d1_in0, -1)
    a11 = jnp.sum(d1_in0 * d1_in0, -1)
    Rt_t = (R.T @ t)[None, :]
    rhs0 = -jnp.sum(d0 * Rt_t, -1)
    rhs1 = jnp.sum(d1_in0 * Rt_t, -1)
    det = a00 * a11 - a01 * a01
    z0 = (rhs0 * a11 - a01 * rhs1) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z1 = (a00 * rhs1 - a01 * rhs0) / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    ok = (z0 > 0) & (z1 > 0) & mask
    return jnp.sum(ok)


def relative_pose_from_tracks(x0: jax.Array, x1: jax.Array, mask: jax.Array,
                              key: jax.Array):
    """Camera rotation q_c (cam1-from-cam0) from tracked normalized coords.

    Returns (q_c, ok): ok requires ≥ 15 inliers and a clear cheirality vote.
    """
    inl, F = ransac_fundamental(x0, x1, mask, key, iters=96,
                                thresh=(1.5 / 460.0) ** 2)
    R1, R2, t = decompose_essential(F)
    cands_R = jnp.stack([R1, R1, R2, R2])
    cands_t = jnp.stack([t, -t, t, -t])
    votes = jax.vmap(lambda R, tt: _cheirality_count(R, tt, x0, x1, inl))(
        cands_R, cands_t)
    best = jnp.argmax(votes)
    R = cands_R[best]
    n_inl = jnp.sum(inl)
    ok = (n_inl >= 15) & (votes[best] > 0.7 * n_inl)
    # note: R maps cam0→cam1 directions; the relative rotation of frames is Rᵀ
    return mat_to_quat(R.T), ok


class HandEyeState(NamedTuple):
    """Fixed-capacity accumulator of rotation pairs."""
    q_cam: jax.Array   # (K, 4) camera relative rotations
    q_las: jax.Array   # (K, 4) laser relative rotations
    mask: jax.Array    # (K,)
    n: jax.Array       # () int32 write cursor
    q_ex: jax.Array    # (4,) current estimate R_CL
    converged: jax.Array  # () bool
    stable: jax.Array  # () int32 — consecutive updates with the estimate
                       # moving <0.2°; the convergence criterion that
                       # actually tracks identification quality (σ₂ crosses
                       # its gate long before the weak direction is pinned:
                       # measured 38° error at the σ₂ gate, 3-4° once the
                       # estimate stops moving)

    @staticmethod
    def init(capacity: int = 512) -> "HandEyeState":
        """capacity: rotation-pair ring size.  σ₂ of the stacked system
        grows like √K·sin(θ/2), so the reference's σ₂>0.25 gate
        (`AxxbSolver.cc:140-146`) is only reachable if enough pairs
        accumulate — the reference keeps ALL pairs since start; 512 ≈ 51 s
        of 10 Hz pairs bounds that without saturating below the gate."""
        return HandEyeState(
            q_cam=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (capacity, 1)),
            q_las=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (capacity, 1)),
            mask=jnp.zeros((capacity,), bool),
            n=jnp.zeros((), jnp.int32),
            q_ex=jnp.array([1.0, 0, 0, 0], jnp.float32),
            converged=jnp.zeros((), bool),
            stable=jnp.zeros((), jnp.int32),
        )


def _quat_left(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([w, -x, -y, -z], -1),
        jnp.stack([x, w, -z, y], -1),
        jnp.stack([y, z, w, -x], -1),
        jnp.stack([z, -y, x, w], -1),
    ], axis=-2)


def _quat_right(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([w, -x, -y, -z], -1),
        jnp.stack([x, w, z, -y], -1),
        jnp.stack([y, -z, w, x], -1),
        jnp.stack([z, y, -x, w], -1),
    ], axis=-2)


def handeye_update(st: HandEyeState, q_cam: jax.Array, q_las: jax.Array,
                   pair_ok: jax.Array) -> HandEyeState:
    """Insert one rotation pair and re-solve the stacked AX=XB system.

    Solves q_cam ⊗ q_ex = q_ex ⊗ q_las for q_ex = R_CL via the smallest
    singular vector of Σ w_i (L(q_cam_i) − R(q_las_i)), with Huber angular
    weights from the current estimate (reference `CalibrationExRotation`,
    AxxbSolver.cc:89-147).
    """
    K = st.mask.shape[0]
    # physical pair filter: X-conjugate rotations have EQUAL angles
    # (|log(q_cam)| = |log(q_las)| exactly, for any X).  Epipolar garbage
    # from tracking collapse produces large-angle q_cam against small
    # laser deltas — such pairs cleared σ₂ AND the residual gate by sheer
    # magnitude (measured: a stable 57°-wrong "converged" estimate from
    # 22 garbage pairs); the angle-consistency gate removes them at the
    # source.
    th_c = jnp.linalg.norm(so3_log_quat(q_cam), axis=-1)
    th_l = jnp.linalg.norm(so3_log_quat(q_las), axis=-1)
    pair_ok = pair_ok & (jnp.abs(th_c - th_l)
                         < jnp.maximum(0.01, 0.15 * th_l))
    slot = st.n % K
    q_cam_b = st.q_cam.at[slot].set(jnp.where(pair_ok, q_cam, st.q_cam[slot]))
    q_las_b = st.q_las.at[slot].set(jnp.where(pair_ok, q_las, st.q_las[slot]))
    mask_b = st.mask.at[slot].set(st.mask[slot] | pair_ok)
    n_b = st.n + pair_ok.astype(jnp.int32)

    # angular residual under the current estimate, per pair
    pred = quat_mul(quat_mul(quat_conj(st.q_ex), q_cam_b), st.q_ex)
    ang = jnp.linalg.norm(so3_log_quat(quat_mul(quat_conj(q_las_b), pred)),
                          axis=-1)
    deg = jnp.rad2deg(ang)
    huber = jnp.where(deg > 5.0, 5.0 / jnp.maximum(deg, 1e-6), 1.0)
    w = huber * mask_b.astype(jnp.float32)

    A = (w[:, None, None]
         * (_quat_left(q_cam_b) - _quat_right(q_las_b)))   # (K,4,4)
    A = A.reshape(-1, 4)
    _, S, Vt = jnp.linalg.svd(A, full_matrices=False)
    q_ex = Vt[-1]
    q_ex = q_ex * jnp.sign(q_ex[0] + 1e-12)
    q_ex = q_ex / jnp.linalg.norm(q_ex)
    # residual-consistency gate ON TOP of the reference's σ₂>0.25: σ₂
    # measures excitation but grows with √K for NOISE pairs too, so a
    # fixed-capacity ring of noisy epipolar rotations can clear it while
    # the solution is garbage (measured: 57° error with converged=true).
    # A real solution explains the pairs — the weighted mean angular
    # residual under the NEW estimate must be small.
    pred_new = quat_mul(quat_mul(quat_conj(q_ex), q_cam_b), q_ex)
    ang_new = jnp.linalg.norm(
        so3_log_quat(quat_mul(quat_conj(q_las_b), pred_new)), axis=-1)
    wsum = jnp.maximum(jnp.sum(w), 1e-6)
    mean_res_deg = jnp.rad2deg(jnp.sum(w * ang_new) / wsum)
    # stability: the estimate's motion per accepted pair, in degrees
    move_deg = jnp.rad2deg(jnp.linalg.norm(
        so3_log_quat(quat_mul(quat_conj(st.q_ex), q_ex))))
    stable = jnp.where(pair_ok,
                       jnp.where(move_deg < 1.0, st.stable + 1,
                                 jnp.zeros((), jnp.int32)),
                       st.stable)
    # thresholds tuned on the LIVE pipeline (real scan-to-map odometry
    # rotations, full-scale KITTI camera; /tmp probes r5): σ₂ grows only
    # ~√K·θ̄·axis-spread ≈ 0.01/pair there, so the reference's 0.25 value
    # alone would demand ~800 frames while the estimate already sits at
    # its 4-8° identification floor (pair residuals 0.6°) after ~100
    # pairs.  Adoption is instead gated on the ENSEMBLE: excitation
    # (σ₂ > 0.1), volume (n ≥ 60), fit (residual < 3°), and stability
    # (15 quiet updates) — the window BA's ∂reprojection/∂T_CL refinement
    # then takes over (2.0° final in tests/test_fusion.py).  This is a
    # deliberate deviation from the reference's bare σ₂>0.25
    # (AxxbSolver.cc:140-146), which on our pair scale fires either never
    # (clean pairs) or on noise (see the 57° failure note above).
    conv = ((S[-2] > 0.1) & (n_b >= 60) & (mean_res_deg < 3.0)
            & (stable >= 15))
    # keep old estimate until we have data
    q_ex = jnp.where(n_b >= 5, q_ex, st.q_ex)
    return HandEyeState(q_cam=q_cam_b, q_las=q_las_b, mask=mask_b, n=n_b,
                        q_ex=q_ex, converged=st.converged | conv,
                        stable=stable)
