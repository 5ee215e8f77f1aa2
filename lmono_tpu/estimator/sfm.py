"""Global SfM over a window: PnP chaining + two-view triangulation + full BA.

TPU-native rebuild of the reference's `GlobalSFM`
(`mono_lidar_mapping/src/initial/SFM.cc:1-310`: `construct`,
`solveFrameByPnP`, `triangulateTwoFrames`, plus the Ceres full-BA block at
the end of `construct`).  In the reference this vision-only initializer is
only reachable from the commented-out init path (`Estimator.cc:855-969`) —
the live system initializes the window from laser poses — but it is part of
the component inventory, and a camera-only bootstrap is genuinely useful
when the laser stream drops out, so it is implemented for real here.

Differences from the C++ (all shape-stability driven, not semantic):
  * dynamic `map<int, SFMFeature>` → fixed (M, W1) masked observation table;
  * per-frame `cv::solvePnP` chain → the same chain order, but each solve is
    an all-inlier DLT + damped GN refine (`lmono_tpu.ops.ransac`) over every
    currently-triangulated point, batched on the MXU;
  * per-point `triangulatePoint` SVD loop → one vmapped two-view DLT;
  * Ceres AutoDiff BA → one `jacfwd` dense Gauss-Newton with the gauge fixed
    exactly as the reference does (frame l pose constant, last translation
    constant, `SFM.cc` parameter-block `SetParameterBlockConstant` calls).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.ops.ransac import _pnp_gn_refine
from lmono_tpu.utils.lie import Pose, quat_normalize, quat_to_mat, so3_exp_quat, quat_mul

class SfmResult(NamedTuple):
    poses: Pose        # (W1,) world-from-camera (world = frame l)
    points: jax.Array  # (M, 3) world
    point_ok: jax.Array  # (M,)
    ok: jax.Array      # () bool — enough PnP/triangulation support


def _triangulate_two(pose_i: Pose, pose_j: Pose, xi: jax.Array, xj: jax.Array):
    """Two-view DLT triangulation, vmapped over points.

    pose_*: world-from-camera.  xi/xj: (M,2) normalized image coords.
    Returns (X (M,3) world, depth_i, depth_j).
    Mirrors `GlobalSFM::triangulatePoint` (SFM.cc) — same 4-row DLT.
    """
    # projection matrices: camera-from-world
    Pi = pose_i.inverse()
    Pj = pose_j.inverse()
    Ri, ti = quat_to_mat(Pi.q), Pi.t
    Rj, tj = quat_to_mat(Pj.q), Pj.t
    Mi = jnp.concatenate([Ri, ti[:, None]], axis=1)       # (3,4)
    Mj = jnp.concatenate([Rj, tj[:, None]], axis=1)

    def tri(xi1, xj1):
        A = jnp.stack([
            xi1[0] * Mi[2] - Mi[0],
            xi1[1] * Mi[2] - Mi[1],
            xj1[0] * Mj[2] - Mj[0],
            xj1[1] * Mj[2] - Mj[1],
        ])
        _, _, Vt = jnp.linalg.svd(A)
        Xh = Vt[-1]
        X = Xh[:3] / jnp.where(jnp.abs(Xh[3]) < 1e-12, 1e-12, Xh[3])
        return X

    X = jax.vmap(tri)(xi, xj)
    zi = (X @ Ri.T + ti)[:, 2]
    zj = (X @ Rj.T + tj)[:, 2]
    return X, zi, zj


def _pnp_all_inlier(X: jax.Array, x: jax.Array, w: jax.Array,
                    init: Pose) -> Pose:
    """Weighted GN PnP from an initial guess (`solveFrameByPnP` semantics:
    the reference seeds cv::solvePnP with the neighbouring frame's pose and
    iterates; here the same damped GN, batched)."""
    R0 = quat_to_mat(init.q)
    return _pnp_gn_refine(R0.T, -(R0.T @ init.t), X, x, w, iters=8)


def global_sfm(obs: jax.Array, obs_mask: jax.Array, l: int,
               rel_pose: Pose, ba_iters: int = 8) -> SfmResult:
    """Reconstruct window poses + sparse points from tracks alone.

    obs: (M, W1, 2) normalized observations; obs_mask: (M, W1) validity.
    l: anchor frame index (the reference's parallax-chosen frame);
    rel_pose: pose of frame l in the last frame's camera (cam_last-from-cam_l
    — the reference passes `relative_R/relative_T` meaning the same edge).
    Returns world-from-camera poses with world = camera l.
    """
    M, W1, _ = obs.shape

    # ---- initial two frames: l at identity, last from the relative pose
    pose_l = Pose.identity()
    pose_last = rel_pose.inverse()     # world(=l)-from-cam_last

    poses = [None] * W1
    poses[l] = pose_l
    poses[W1 - 1] = pose_last

    pts = jnp.zeros((M, 3), obs.dtype)
    ok = jnp.zeros((M,), bool)

    def tri_merge(pts, ok, pa: Pose, pb: Pose, ia: int, ib: int):
        seen = obs_mask[:, ia] & obs_mask[:, ib]
        X, za, zb = _triangulate_two(pa, pb, obs[:, ia], obs[:, ib])
        good = seen & (za > 0.1) & (zb > 0.1) & jnp.all(jnp.isfinite(X), -1)
        new = good & ~ok
        return jnp.where(new[:, None], X, pts), ok | new

    pts, ok = tri_merge(pts, ok, pose_l, pose_last, l, W1 - 1)

    # ---- forward chain: l+1 .. W1-2 — PnP vs current cloud, then
    # triangulate with the last frame (SFM.cc construct step 1)
    for i in range(l + 1, W1 - 1):
        w = (ok & obs_mask[:, i]).astype(obs.dtype)
        pose_cw = _pnp_all_inlier(pts, obs[:, i], w, poses[i - 1])
        poses[i] = pose_cw.inverse()
        pts, ok = tri_merge(pts, ok, poses[i], pose_last, i, W1 - 1)

    # step 2: triangulate everything between l and i (fills tracks that
    # don't reach the last frame)
    for i in range(l + 1, W1 - 1):
        pts, ok = tri_merge(pts, ok, pose_l, poses[i], l, i)

    # step 3: backward chain l-1 .. 0 — PnP, triangulate with l
    for i in range(l - 1, -1, -1):
        w = (ok & obs_mask[:, i]).astype(obs.dtype)
        pose_cw = _pnp_all_inlier(pts, obs[:, i], w, poses[i + 1])
        poses[i] = pose_cw.inverse()
        pts, ok = tri_merge(pts, ok, poses[i], pose_l, i, l)

    # step 4: triangulate any track seen by ≥2 solved frames (first/last
    # observation pair, as the reference's step 4 does with its begin/end)
    first_idx = jnp.argmax(obs_mask, axis=1)
    last_idx = W1 - 1 - jnp.argmax(obs_mask[:, ::-1], axis=1)
    pstack = Pose(jnp.stack([p.t for p in poses]), jnp.stack([p.q for p in poses]))

    def tri_pair(fi, li, xrow, mrow):
        pa = Pose(pstack.t[fi], pstack.q[fi])
        pb = Pose(pstack.t[li], pstack.q[li])
        X, za, zb = _triangulate_two(
            pa, pb, xrow[fi][None], xrow[li][None])
        good = (fi != li) & (za[0] > 0.1) & (zb[0] > 0.1) & \
            jnp.all(jnp.isfinite(X[0])) & mrow[fi] & mrow[li]
        return X[0], good

    Xr, okr = jax.vmap(tri_pair)(first_idx, last_idx, obs, obs_mask)
    new = okr & ~ok
    pts = jnp.where(new[:, None], Xr, pts)
    ok = ok | new

    # ---- full BA (SFM.cc construct's Ceres block): optimize all poses and
    # points; gauge: frame l fully fixed, last frame translation fixed.
    t0 = pstack.t
    q0 = pstack.q
    D = 6 * W1 + 3 * M

    w_obs = (obs_mask & ok[:, None]).astype(obs.dtype)

    def residuals(delta, lin):
        t0l, q0l, X0l = lin
        dp = delta[: 6 * W1].reshape(W1, 6)
        dx = delta[6 * W1:].reshape(M, 3)
        dp = dp.at[l].set(0.0)
        dp = dp.at[W1 - 1, 0:3].set(0.0)
        t = t0l + dp[:, :3]
        q = quat_normalize(quat_mul(q0l, so3_exp_quat(dp[:, 3:])))
        X = X0l + dx
        # camera-from-world per frame
        Rcw = jnp.transpose(quat_to_mat(q), (0, 2, 1))        # (W1,3,3)
        tcw = -jnp.einsum("wij,wj->wi", Rcw, t)
        Pc = jnp.einsum("wij,mj->mwi", Rcw, X) + tcw[None]    # (M,W1,3)
        z = Pc[..., 2]
        proj = Pc[..., :2] / jnp.maximum(z, 1e-3)[..., None]
        r = (proj - obs) * w_obs[..., None]
        return r.reshape(-1)

    def gn_step(state, _):
        zero = jnp.zeros(D, obs.dtype)
        r = residuals(zero, state)
        J = jax.jacfwd(lambda d: residuals(d, state))(zero)
        H = J.T @ J
        g = J.T @ r
        Hd = H + 1e-4 * jnp.diag(1.0 + jnp.diagonal(H))
        delta = -jnp.linalg.solve(Hd, g)
        delta = jnp.where(jnp.all(jnp.isfinite(delta)), delta, 0.0)
        dp = delta[: 6 * W1].reshape(W1, 6)
        dx = delta[6 * W1:].reshape(M, 3)
        dp = dp.at[l].set(0.0)
        dp = dp.at[W1 - 1, 0:3].set(0.0)
        t = state[0] + dp[:, :3]
        q = quat_normalize(quat_mul(state[1], so3_exp_quat(dp[:, 3:])))
        X = state[2] + dx
        return (t, q, X), jnp.sum(r * r)

    state, _costs = jax.lax.scan(gn_step, (t0, q0, pts), None,
                                 length=ba_iters)

    t, q, X = state
    n_tri = jnp.sum(ok)
    result_ok = n_tri >= max(10, M // 8)
    return SfmResult(poses=Pose(t, q), points=X, point_ok=ok, ok=result_ok)
