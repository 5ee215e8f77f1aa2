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
    # nullspace via unrolled Householder QR (no LAPACK custom call — see
    # the small-linalg section below); rank-2 projection = remove the
    # smallest right-singular component:  F(I − nnᵀ) with n = argmin ‖F n‖
    # (power iteration is fine HERE: an exact-8-point F is near rank-2, so
    # the spectral gap at the bottom is wide)
    F = _qr_nullvec(A).reshape(3, 3)
    n = _nullvec(F, iters=24)
    return F - jnp.outer(F @ n, n)


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
# Hand-rolled small linear algebra (TPU-fast)
#
# jnp.linalg.{svd,solve,cholesky} on small batched matrices lower to
# LAPACK-style custom calls that run OFF the vector units — profiled on
# the v5e they were the loop lane's top cost (SVD/LU/Cholesky custom
# calls ≈ 35 ms of the 76 ms per-keyframe detection program).  The
# replacements below are unrolled elementwise programs (Cholesky 6×6,
# power-iteration nullspace, Newton polar decomposition) that fuse into
# the surrounding vmapped RANSAC math.
# --------------------------------------------------------------------------


def _chol_solve6(H: jax.Array, g: jax.Array) -> jax.Array:
    """Solve H x = g for SPD H (..., 6, 6) via unrolled Cholesky."""
    n = 6
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = H[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(jnp.maximum(s, 1e-12))
            else:
                L[i][j] = s / L[j][j]
    y = [None] * n
    for i in range(n):
        s = g[..., i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x, axis=-1)


def _nullvec(A: jax.Array, iters: int = 48) -> jax.Array:
    """Unit vector minimizing ‖A v‖ when the spectral GAP is healthy (e.g.
    projecting a near-rank-2 3×3 F): power iteration on  M = c·I − AᵀA
    with c = tr(AᵀA) ≥ λmax.  For systems with an exact nullspace and
    clustered remaining spectrum (the DLT designs), use `_qr_nullvec` —
    power iteration stalls there (rate 1 − λ₂/c)."""
    AtA = jnp.einsum("...ji,...jk->...ik", A, A)
    n = AtA.shape[-1]
    c = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
    M = c * jnp.eye(n, dtype=A.dtype) - AtA
    # deterministic full-spectrum init (no zero component in any basis dir)
    v = jnp.ones(AtA.shape[:-2] + (n,), A.dtype) \
        + 0.1 * jnp.arange(n, dtype=A.dtype)
    for _ in range(iters):
        v = jnp.einsum("...ij,...j->...i", M, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                            1e-12)
    return v


def _qr_nullvec(A: jax.Array) -> jax.Array:
    """Nullspace vector of A (..., m, n) with m ∈ {n−1, n} and nullity 1
    (the minimal-sample DLT systems): unrolled Householder QR — pure
    broadcast arithmetic, no LAPACK custom call — then back-substitution
    with the last variable free.  Returns a unit (..., n) vector."""
    m, n = A.shape[-2], A.shape[-1]
    R = A
    r = min(m, n - 1)              # columns to eliminate
    for k in range(r):
        col = R[..., k:, k]                              # (..., m-k)
        nrm = jnp.sqrt(jnp.sum(col * col, axis=-1, keepdims=True))
        s = jnp.where(col[..., :1] >= 0, 1.0, -1.0)
        v = col + s * nrm * jnp.eye(m - k, dtype=A.dtype)[0]
        vn2 = jnp.maximum(jnp.sum(v * v, axis=-1, keepdims=True), 1e-30)
        sub = R[..., k:, :]                              # (..., m-k, n)
        proj = jnp.einsum("...i,...ij->...j", v, sub)    # (..., n)
        sub = sub - (2.0 / vn2)[..., None] * v[..., :, None] \
            * proj[..., None, :]
        R = jnp.concatenate([R[..., :k, :], sub], axis=-2)
    # back-substitution: x[n-1] = 1, solve the r×r upper block
    x = [None] * n
    for j in range(r, n):
        x[j] = jnp.ones(A.shape[:-2], A.dtype)
    for i in reversed(range(r)):
        s = jnp.zeros(A.shape[:-2], A.dtype)
        for j2 in range(i + 1, n):
            s = s + R[..., i, j2] * x[j2]
        d = R[..., i, i]
        d = jnp.where(jnp.abs(d) < 1e-12, jnp.where(d < 0, -1e-12, 1e-12),
                      d)
        x[i] = -s / d
    v = jnp.stack(x, axis=-1)
    return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True),
                           1e-12)


def _det3(M: jax.Array) -> jax.Array:
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _inv3(M: jax.Array) -> jax.Array:
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    adj = jnp.stack([
        jnp.stack([A, B, C], -1),
        jnp.stack([D, E, F], -1),
        jnp.stack([G, H, I], -1)], -2)
    return adj / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)[..., None, None]


def _polar3(M: jax.Array, iters: int = 9) -> tuple[jax.Array, jax.Array]:
    """Nearest rotation (polar factor) of 3×3 M with det(R) = +1, plus the
    mean singular value (the DLT scale).  Newton iteration
    R ← (R + R⁻ᵀ)/2 converges quadratically to the orthogonal factor."""
    sgn = jnp.sign(_det3(M))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    Ms = M * sgn[..., None, None]
    # scale to unit Frobenius-ish norm for a well-conditioned start
    nrm = jnp.sqrt(jnp.sum(Ms * Ms, axis=(-2, -1), keepdims=True) / 3.0)
    R = Ms / jnp.maximum(nrm, 1e-12)
    for _ in range(iters):
        R = 0.5 * (R + jnp.swapaxes(_inv3(R), -1, -2))
    scale = jnp.einsum("...ij,...ij->...", R, Ms) / 3.0
    return R, scale


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
    # nullspace by unrolled QR + polar orthogonalization — NOT
    # jnp.linalg.svd: LAPACK-style custom calls were the profiled top cost
    # of the whole loop lane (see the small-linalg section above)
    P = _qr_nullvec(A).reshape(3, 4)
    M = P[:, :3]
    R, pscale = _polar3(M)
    # t in normalized world coords, then undo the Hartley normalization:
    # project(R·(X-ctr)/s + tn) = project(R·X + (s·tn - R·ctr))
    # (_polar3 absorbed det sign into scale sign via M·sgn — recover it)
    sgn = jnp.sign(_det3(M))
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    t_n = sgn * P[:, 3] / jnp.where(jnp.abs(pscale) < 1e-12, 1e-12, pscale)
    t = scale * t_n - R @ ctr
    # Projective ± ambiguity of the nullspace vector is resolved above by
    # canonicalizing det(M) > 0 (a true pose has P = s[R|t] with s > 0, so
    # det(M) = s³ > 0).  Samples that still put the board behind the
    # camera are geometrically degenerate hypotheses — they score zero
    # inliers (behind-camera reprojections cost 1e9) and lose the vote,
    # which replaces the old SVD-based flip salvage.
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
        delta = -_chol_solve6(H, J.T @ r)   # unrolled SPD solve, no LAPACK
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
