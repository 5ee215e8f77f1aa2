"""Trajectory evaluation: ATE RMSE (with optional SE(3)/Sim(3) alignment) + RPE.

The reference only dumps TUM-format trajectories for external comparison
(`mono_lidar_mapping/src/image_process/Estimator.cc:16-19,642-644`); this
module provides the in-repo evaluation the reference lacks.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lmono_tpu.utils.lie import Pose, quat_to_mat


def umeyama_alignment(src: np.ndarray, dst: np.ndarray,
                      with_scale: bool = False):
    """Least-squares similarity transform aligning src→dst (both (N,3)).

    Returns (s, R, t) with dst ≈ s * R @ src + t.
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    mu_s, mu_d = src.mean(0), dst.mean(0)
    xs, xd = src - mu_s, dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / var_s)
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est: Pose, gt: Pose, align: bool = True,
             with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE in meters after optional alignment."""
    p_est = np.asarray(est.t, np.float64)
    p_gt = np.asarray(gt.t, np.float64)
    n = min(len(p_est), len(p_gt))
    p_est, p_gt = p_est[:n], p_gt[:n]
    if align:
        s, R, t = umeyama_alignment(p_est, p_gt, with_scale)
        p_est = (s * (R @ p_est.T)).T + t
    err = p_est - p_gt
    return float(np.sqrt((err ** 2).sum(axis=1).mean()))


def rpe(est: Pose, gt: Pose, delta: int = 1) -> dict:
    """Relative pose error over `delta`-frame steps: translational RMSE (m)
    and rotational RMSE (deg)."""
    n = min(est.t.shape[0], gt.t.shape[0])

    def rel(p: Pose, i, j):
        pi = Pose(p.t[i], p.q[i])
        pj = Pose(p.t[j], p.q[j])
        return pi.between(pj)

    i = jnp.arange(0, n - delta)
    j = i + delta
    import jax
    rel_est = jax.vmap(lambda a, b: rel(est, a, b))(i, j)
    rel_gt = jax.vmap(lambda a, b: rel(gt, a, b))(i, j)
    diff = jax.vmap(lambda a_t, a_q, b_t, b_q: Pose(a_t, a_q).between(
        Pose(b_t, b_q)))(rel_gt.t, rel_gt.q, rel_est.t, rel_est.q)
    t_err = np.asarray(jnp.linalg.norm(diff.t, axis=-1))
    R = quat_to_mat(diff.q)
    cos_a = (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0
    ang = np.asarray(jnp.rad2deg(jnp.arccos(jnp.clip(cos_a, -1, 1))))
    return {
        "trans_rmse": float(np.sqrt((t_err ** 2).mean())),
        "rot_rmse_deg": float(np.sqrt((ang ** 2).mean())),
    }


def save_tum(path: str, poses: Pose, times=None) -> None:
    """Write TUM-format `t x y z qx qy qz qw` rows (reference parity:
    `Estimator.cc:642-644` writes the same layout for offline eval)."""
    t_arr = np.asarray(poses.t)
    q_arr = np.asarray(poses.q)  # (w,x,y,z) internally
    n = len(t_arr)
    times = np.arange(n, dtype=np.float64) * 0.1 if times is None else times
    with open(path, "w") as f:
        for i in range(n):
            x, y, z = t_arr[i]
            w, qx, qy, qz = q_arr[i]
            f.write(f"{times[i]:.6f} {x:.6f} {y:.6f} {z:.6f} "
                    f"{qx:.6f} {qy:.6f} {qz:.6f} {w:.6f}\n")


def load_tum(path: str):
    """Read TUM rows → (times, Pose)."""
    data = np.loadtxt(path)
    times = data[:, 0]
    t = jnp.asarray(data[:, 1:4], jnp.float32)
    qxyzw = data[:, 4:8]
    q = jnp.asarray(
        np.stack([qxyzw[:, 3], qxyzw[:, 0], qxyzw[:, 1], qxyzw[:, 2]], -1),
        jnp.float32)
    return times, Pose(t, q)
