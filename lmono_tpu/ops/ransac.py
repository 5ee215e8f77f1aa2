"""Vmapped-hypothesis RANSAC solvers: fundamental matrix and PnP.

Replaces the reference's `cv::findFundamentalMat` outlier gate
(`FeatureTracker::rejectWithF`, `FeatureTracker.cc:435-503`) and
`cv::solvePnPRansac` (`KeyFrame::PnPRANSAC`, `KeyFrame.cc:296-351`): instead
of sequential hypothesis loops, all hypotheses are drawn up front and solved
as one batched linear-algebra program (8-point / DLT), scored in parallel,
and the best refit on its inliers — the shape TPUs like.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lmono_tpu.utils.lie import Pose, mat_to_quat


# --------------------------------------------------------------------------
# Fundamental / essential matrix
# --------------------------------------------------------------------------

def _eight_point(x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Normalized 8-point: x0,x1 (8,2) normalized coords → F (3,3)."""
    u0, v0 = x0[:, 0], x0[:, 1]
    u1, v1 = x1[:, 0], x1[:, 1]
    A = jnp.stack([u1 * u0, u1 * v0, u1, v1 * u0, v1 * v0, v1, u0, v0,
                   jnp.ones_like(u0)], axis=-1)      # (8,9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    # rank-2 projection
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return (U * S[None, :]) @ Vt2


def _sampson(F: jax.Array, x0: jax.Array, x1: jax.Array) -> jax.Array:
    """Sampson distance per correspondence (normalized coords)."""
    ones = jnp.ones_like(x0[..., :1])
    p0 = jnp.concatenate([x0, ones], -1)
    p1 = jnp.concatenate([x1, ones], -1)
    Fx0 = p0 @ F.T          # (N,3)
    Ftx1 = p1 @ F           # (N,3)
    num = jnp.sum(p1 * Fx0, axis=-1) ** 2
    den = Fx0[..., 0] ** 2 + Fx0[..., 1] ** 2 + Ftx1[..., 0] ** 2 + Ftx1[..., 1] ** 2
    return num / jnp.maximum(den, 1e-12)


def ransac_fundamental(x0: jax.Array, x1: jax.Array, mask: jax.Array,
                       key: jax.Array, iters: int = 64,
                       thresh: float = 1e-4) -> tuple[jax.Array, jax.Array]:
    """RANSAC F-matrix on normalized coords.

    x0,x1: (N,2); mask: (N,) valid correspondences.  thresh is squared
    Sampson distance in normalized units ((px/f)² — the reference gates at
    F_THRESHOLD px with a 460 virtual focal).
    Returns (inlier_mask (N,), best_F (3,3)).
    """
    N = x0.shape[0]
    # weighted sampling without replacement approximated by categorical draws
    logits = jnp.where(mask, 0.0, -1e9)
    samp = jax.random.categorical(key, logits[None, :], shape=(iters, 8))

    def hyp(idx):
        return _eight_point(x0[idx], x1[idx])

    Fs = jax.vmap(hyp)(samp)                              # (iters,3,3)
    d = jax.vmap(lambda F: _sampson(F, x0, x1))(Fs)       # (iters,N)
    inl = (d < thresh) & mask[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    # guard: degenerate sample sets (few valid) → accept everything valid
    enough = jnp.sum(mask) >= 9
    inlier_mask = jnp.where(enough, inl[best], mask)
    return inlier_mask, Fs[best]


# --------------------------------------------------------------------------
# PnP (3D → normalized 2D) via DLT hypotheses + GN refinement
# --------------------------------------------------------------------------

def _dlt_pnp(X: jax.Array, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """DLT pose from 6 3D-2D correspondences.  X (6,3), x (6,2) normalized.
    Returns (R (3,3), t (3,)) with x ~ project(R X + t).

    Hartley-normalized: the raw 12×12 DLT mixes world coordinates of
    magnitude ~30 m with unit-scale image coordinates, and its smallest
    singular vector is garbage under even 1-px noise (measured: 0.5-6 m
    pose error from PERFECT minimal samples).  Centering X and scaling to
    ~unit spread conditions A; the pose is recovered in normalized world
    coordinates and unscaled exactly."""
    ctr = jnp.mean(X, axis=0)
    scale = jnp.sqrt(jnp.mean(jnp.sum((X - ctr) ** 2, -1))) + 1e-9
    Xn = (X - ctr) / scale
    zeros = jnp.zeros((6, 4))
    Xh = jnp.concatenate([Xn, jnp.ones((6, 1))], axis=-1)  # (6,4)
    r1 = jnp.concatenate([Xh, zeros, -x[:, 0:1] * Xh], axis=-1)
    r2 = jnp.concatenate([zeros, Xh, -x[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)                  # (12,12)
    _, _, Vt = jnp.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    M = P[:, :3]
    # orthogonalize: SVD-project M to a rotation, recover scale
    U, S, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt2)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(det)
    R = U @ D @ Vt2
    pscale = jnp.sum(S * jnp.diagonal(D)) / 3.0
    # t in normalized world coords, then undo the Hartley normalization:
    # project(R·(X-ctr)/s + tn) = project(R·X + (s·tn - R·ctr))
    t_n = P[:, 3] / jnp.where(jnp.abs(pscale) < 1e-12, 1e-12, pscale)
    t = scale * t_n - R @ ctr
    # resolve sign so points land in front of the camera
    z = (X @ R.T + t)[:, 2]
    flip = jnp.sum(z > 0) < 3
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    # re-orthonormalize after potential flip (det must stay +1)
    U3, _, Vt3 = jnp.linalg.svd(R)
    det3 = jnp.linalg.det(U3 @ Vt3)
    R = U3 @ jnp.diag(jnp.array([1.0, 1.0, 1.0]).at[2].set(det3)) @ Vt3
    return R, t


def _reproj_err2(R, t, X, x):
    Pc = X @ R.T + t
    z = jnp.maximum(Pc[..., 2], 1e-6)
    proj = Pc[..., :2] / z[..., None]
    behind = Pc[..., 2] <= 1e-6
    e2 = jnp.sum((proj - x) ** 2, axis=-1)
    return jnp.where(behind, 1e9, e2)


def _pnp_gn_refine(R, t, X, x, w, iters: int = 5):
    """Damped GN on SE(3) minimizing reprojection error (weights w)."""
    q = mat_to_quat(R)
    pose = Pose(t, q)

    def resid(p6, pose_lin: Pose):
        pp = pose_lin.retract(p6)
        Pc = pp.apply(X)
        z = jnp.maximum(Pc[..., 2], 1e-6)
        proj = Pc[..., :2] / z[..., None]
        return ((proj - x) * w[:, None]).reshape(-1)

    def step(pose, _):
        J = jax.jacfwd(lambda d: resid(d, pose))(jnp.zeros(6))
        r = resid(jnp.zeros(6), pose)
        H = J.T @ J + 1e-6 * jnp.eye(6)
        delta = -jnp.linalg.solve(H, J.T @ r)
        ok = jnp.all(jnp.isfinite(delta))
        delta = jnp.where(ok, delta, 0.0)
        return pose.retract(delta), None

    pose, _ = jax.lax.scan(step, pose, None, length=iters)
    return pose


def ransac_pnp(X: jax.Array, x: jax.Array, mask: jax.Array, key: jax.Array,
               iters: int = 128, thresh: float = 1e-4,
               min_inliers: int = 5,
               prior_pose: Pose | None = None) -> tuple[Pose, jax.Array, jax.Array]:
    """RANSAC PnP: world points X (N,3) ↔ normalized obs x (N,2).

    prior_pose: optional extra hypothesis scored alongside the sampled DLT
    hypotheses (e.g. the drift-free revisit pose in loop verification — a
    near-correct guess that wins immediately when sampling struggles with
    mixed-quality 3D).
    Returns (camera-from-world Pose, inlier_mask, ok flag).
    """
    from lmono_tpu.utils.lie import quat_to_mat

    logits = jnp.where(mask, 0.0, -1e9)
    samp = jax.random.categorical(key, logits[None, :], shape=(iters, 6))

    def hyp(idx):
        """Minimal 6-point hypothesis: Hartley-normalized DLT, then GN on
        the sample itself.  The raw 6-point DLT is noise-fragile (measured
        0.5-6 m pose error from perfect minimal samples); GN from the DLT
        init converges to the exact pose for clean samples, so RANSAC
        scoring sees at least one sharp hypothesis whenever a clean sample
        is drawn — without this, only the prior hypothesis ever verified,
        which is exactly what broke under viewpoint perturbation."""
        R, t = _dlt_pnp(X[idx], x[idx])
        w = jnp.zeros((X.shape[0],), X.dtype).at[idx].set(1.0)
        pose = _pnp_gn_refine(R, t, X, x, w, iters=8)
        return quat_to_mat(pose.q), pose.t

    def lo_refine(R, t, widen):
        """LO-RANSAC inner loop: re-estimate inliers at a shrinking
        threshold and GN-refine on them — pulls a basin-adjacent
        hypothesis (e.g. a revisit prior that is meters off under
        viewpoint change) onto the true pose instead of rejecting it."""
        pose = Pose.from_Rt(R, t)
        for f in widen:
            Pc = pose.apply(X)
            z = jnp.maximum(Pc[..., 2], 1e-6)
            e2 = jnp.sum((Pc[..., :2] / z[..., None] - x) ** 2, axis=-1)
            w = ((e2 < f * thresh) & mask & (Pc[..., 2] > 1e-6)).astype(
                X.dtype)
            pose = _pnp_gn_refine(quat_to_mat(pose.q), pose.t, X, x, w)
        return pose

    Rs, ts = jax.vmap(hyp)(samp)
    if prior_pose is not None:
        # pre-refine the prior at a wide gate before it competes: at a true
        # revisit the prior is right up to accumulated drift + viewpoint
        # offset, which puts its raw reprojections outside `thresh` but
        # well inside the widened basin
        pri = lo_refine(quat_to_mat(prior_pose.q), prior_pose.t,
                        (16.0, 4.0))
        Rs = jnp.concatenate([Rs, quat_to_mat(prior_pose.q)[None],
                              quat_to_mat(pri.q)[None]], axis=0)
        ts = jnp.concatenate([ts, prior_pose.t[None], pri.t[None]], axis=0)
    e2 = jax.vmap(lambda R, t: _reproj_err2(R, t, X, x))(Rs, ts)  # (it,N)
    inl = (e2 < thresh) & mask[None, :]
    scores = jnp.sum(inl, axis=-1)
    best = jnp.argmax(scores)
    pose = lo_refine(Rs[best], ts[best], (4.0, 2.0, 1.0))
    # recount inliers after refinement
    Pc = pose.apply(X)
    z = jnp.maximum(Pc[..., 2], 1e-6)
    e2f = jnp.sum((Pc[..., :2] / z[..., None] - x) ** 2, axis=-1)
    inlier_mask = (e2f < thresh) & mask & (Pc[..., 2] > 1e-6)
    ok = jnp.sum(inlier_mask) >= min_inliers
    return pose, inlier_mask, ok
