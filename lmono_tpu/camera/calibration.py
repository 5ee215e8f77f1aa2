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
# Chessboard corner detection (reference `camera_models/src/chessboard/`)
# --------------------------------------------------------------------------

def find_chessboard_corners(image: jax.Array, rows: int, cols: int):
    """Detect inner chessboard corners and order them row-major.

    Approach: X-junction response (checkerboard kernel convolution) → NMS →
    take top rows·cols → order by board axes (PCA of corner cloud).
    Suitable for calibration-grade images (near-frontal to moderate tilt),
    which matches the reference CLI's use (`intrinsic_calib.cc`).
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
    flat_idx = jnp.argsort(-resp_nms.reshape(-1))[:n]
    W = image.shape[1]
    uv = jnp.stack([(flat_idx % W).astype(jnp.float32),
                    (flat_idx // W).astype(jnp.float32)], -1)
    strengths = resp_nms.reshape(-1)[flat_idx]
    ok = bool(strengths[-1] > 0.25 * strengths[0])

    # order into a grid: project onto principal axes and lexsort
    pts = np.asarray(uv, np.float64)
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
