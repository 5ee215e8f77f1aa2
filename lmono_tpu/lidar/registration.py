"""Scan registration: point-to-line / point-to-plane Gauss-Newton on TPU.

TPU-native rebuild of the LOAM-family registration the reference outsources
to A-LOAM (`/root/reference/README.md:50-60`): correspondences come from the
streaming brute-force KNN (`lmono_tpu.ops.knn`) instead of PCL KD-trees, line
and plane fits are closed-form batched PCA/least-squares instead of Ceres
autodiff factors, and the 6-DoF damped Gauss-Newton runs entirely inside one
jitted `lax.scan` — fixed shapes, masked residuals, no host round-trips.

Residual conventions (match the LOAM formulation):
  edge point  p with line (c, d̂):  r = (I − d̂d̂ᵀ)(T·p − c)      (3-vector, rank 2)
  planar point p with plane (n̂, ρ): r = n̂ᵀ(T·p) + ρ            (scalar)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import LidarConfig
from lmono_tpu.ops.knn import knn
from lmono_tpu.utils.lie import Pose, quat_rotate, so3_exp_quat, quat_mul, quat_normalize


# --------------------------------------------------------------------------
# Batched geometric fits
# --------------------------------------------------------------------------

def fit_lines(nbrs: jax.Array, nbr_ok: jax.Array):
    """PCA line fit per query: nbrs (Q, k, 3), nbr_ok (Q, k).

    Returns (centroid (Q,3), dir (Q,3) unit, line_ok (Q,)).
    Line-ness gate: dominant eigenvalue ≥ 3× second (A-LOAM's criterion).
    Dominant eigenvector via a few power iterations (no symmetric eig on TPU
    hot path).
    """
    w = nbr_ok.astype(nbrs.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    c = jnp.sum(nbrs * w, axis=1) / cnt
    x = (nbrs - c[:, None, :]) * w
    cov = jnp.einsum("qki,qkj->qij", x, x) / cnt[..., None]

    # power iteration for the dominant eigenpair
    v = jnp.ones((nbrs.shape[0], 3), nbrs.dtype) / jnp.sqrt(3.0)
    for _ in range(8):
        v = jnp.einsum("qij,qj->qi", cov, v)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
    lam1 = jnp.einsum("qi,qij,qj->q", v, cov, v)
    # bound on the remaining eigenvalues via the trace
    tr = jnp.trace(cov, axis1=-2, axis2=-1)
    lam_rest = jnp.maximum(tr - lam1, 0.0)
    line_ok = (jnp.sum(nbr_ok, axis=1) >= 3) & (lam1 > 1.5 * lam_rest) & (lam1 > 1e-6)
    return c, v, line_ok


def fit_planes(nbrs: jax.Array, nbr_ok: jax.Array, plane_tol: float = 0.2):
    """PCA plane fit per query: normal = smallest-eigenvalue direction of the
    neighbor covariance (origin-independent, unlike A-LOAM's A·n=-1 trick,
    which is singular for planes through the map origin — e.g. the ground).

    Returns (normal (Q,3) unit, rho (Q,), plane_ok (Q,)) with the plane
    n·x + rho = 0.  plane_ok requires every inlier within `plane_tol`.
    """
    w = nbr_ok.astype(nbrs.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    c = jnp.sum(nbrs * w, axis=1) / cnt
    x = (nbrs - c[:, None, :]) * w
    cov = jnp.einsum("qki,qkj->qij", x, x) / cnt[..., None]
    # smallest eigenvector via power iteration on (tr·I − cov)
    tr = jnp.trace(cov, axis1=-2, axis2=-1)
    shifted = tr[:, None, None] * jnp.eye(3, dtype=nbrs.dtype) - cov
    v = jnp.ones((nbrs.shape[0], 3), nbrs.dtype) / jnp.sqrt(3.0)
    for _ in range(12):
        v = jnp.einsum("qij,qj->qi", shifted, v)
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
    n_unit = v
    rho = -jnp.einsum("qi,qi->q", n_unit, c)
    d = jnp.abs(jnp.einsum("qki,qi->qk", nbrs, n_unit) + rho[:, None])
    d = jnp.where(nbr_ok, d, 0.0)
    plane_ok = (jnp.sum(nbr_ok, axis=1) >= 3) & (jnp.max(d, axis=1) < plane_tol)
    return n_unit, rho, plane_ok


# --------------------------------------------------------------------------
# Correspondence targets (recomputed between GN iterations)
# --------------------------------------------------------------------------

class EdgeCorr(NamedTuple):
    centroid: jax.Array  # (Qe, 3)
    direction: jax.Array # (Qe, 3)
    ok: jax.Array        # (Qe,)


class PlaneCorr(NamedTuple):
    normal: jax.Array    # (Qp, 3)
    rho: jax.Array       # (Qp,)
    ok: jax.Array        # (Qp,)


def find_edge_corr(query_w: jax.Array, qmask: jax.Array,
                   bank: jax.Array, bank_mask: jax.Array,
                   cfg: LidarConfig) -> EdgeCorr:
    d2, idx = knn(query_w, bank, bank_mask, cfg.knn_k)
    nbrs = bank[idx]                                 # (Q, k, 3)
    nbr_ok = (d2 < cfg.corr_max_dist ** 2) & qmask[:, None]
    c, v, ok = fit_lines(nbrs, nbr_ok)
    return EdgeCorr(c, v, ok & qmask)


def find_plane_corr(query_w: jax.Array, qmask: jax.Array,
                    bank: jax.Array, bank_mask: jax.Array,
                    cfg: LidarConfig) -> PlaneCorr:
    d2, idx = knn(query_w, bank, bank_mask, cfg.knn_k)
    nbrs = bank[idx]
    nbr_ok = (d2 < cfg.corr_max_dist ** 2) & qmask[:, None]
    n, rho, ok = fit_planes(nbrs, nbr_ok)
    return PlaneCorr(n, rho, ok & qmask)


# --------------------------------------------------------------------------
# Damped Gauss-Newton over SE(3)
# --------------------------------------------------------------------------

def _transform(pose: Pose, pts: jax.Array) -> jax.Array:
    return quat_rotate(pose.q[None, :], pts) + pose.t


def _huber_w(r_norm: jax.Array, delta: float) -> jax.Array:
    """IRLS weight for the Huber loss."""
    return jnp.where(r_norm <= delta, 1.0, delta / jnp.maximum(r_norm, 1e-12))


def build_normal_equations(pose: Pose,
                           edge_pts: jax.Array, ec: EdgeCorr,
                           plane_pts: jax.Array, pc: PlaneCorr,
                           huber_delta: float):
    """Assemble H (6,6), b (6,), cost, and inlier count for the current pose.

    Jacobians are analytic w.r.t. the local delta (dp global, dθ right-mul):
      d(T·p)/d(dp) = I;  d(T·p)/d(dθ) = −R [p]× ... using right perturbation
      T(δ)·p = R·exp(dθ)·p + t + dp ⇒ ∂/∂dθ = −R·[p]×.
    """
    Rm = Pose(pose.t, pose.q).R

    # ---- edges: r = P_perp (T p − c), P_perp = I − d d^T
    pw_e = _transform(pose, edge_pts)                 # (Qe,3)
    P = (jnp.eye(3) - jnp.einsum("qi,qj->qij", ec.direction, ec.direction))
    r_e = jnp.einsum("qij,qj->qi", P, pw_e - ec.centroid)   # (Qe,3)
    # hard-zero masked rows BEFORE any product: masked garbage (e.g. huge
    # rho from degenerate fits) would otherwise poison sums via inf*0=nan
    r_e = jnp.where(ec.ok[:, None], r_e, 0.0)
    Jp_e = P                                          # ∂r/∂dp  (Qe,3,3)
    Rp = -jnp.einsum("ij,qjk->qik", Rm, _skew_batch(edge_pts))
    Jt_e = jnp.einsum("qij,qjk->qik", P, Rp)          # ∂r/∂dθ  (Qe,3,3)
    J_e = jnp.concatenate([Jp_e, Jt_e], axis=-1)      # (Qe,3,6)
    rn_e = jnp.linalg.norm(r_e, axis=-1)
    w_e = _huber_w(rn_e, huber_delta) * ec.ok.astype(r_e.dtype)

    # ---- planes: r = n·(T p) + rho (scalar)
    pw_p = _transform(pose, plane_pts)
    r_p = jnp.einsum("qi,qi->q", pc.normal, pw_p) + pc.rho
    r_p = jnp.where(pc.ok, r_p, 0.0)
    Jp_p = pc.normal                                  # (Qp,3)
    Jt_p = jnp.einsum("qi,qij->qj", pc.normal, -jnp.einsum(
        "ij,qjk->qik", Rm, _skew_batch(plane_pts)))
    J_p = jnp.concatenate([Jp_p, Jt_p], axis=-1)      # (Qp,6)
    w_p = _huber_w(jnp.abs(r_p), huber_delta) * pc.ok.astype(r_p.dtype)

    H = (jnp.einsum("qai,q,qaj->ij", J_e, w_e, J_e)
         + jnp.einsum("qi,q,qj->ij", J_p, w_p, J_p))
    b = (jnp.einsum("qai,q,qa->i", J_e, w_e, r_e)
         + jnp.einsum("qi,q->i", J_p * r_p[:, None], w_p))
    cost = (jnp.sum(w_e * rn_e ** 2) + jnp.sum(w_p * r_p ** 2))
    n_inlier = jnp.sum(ec.ok) + jnp.sum(pc.ok)
    return H, b, cost, n_inlier


def _skew_batch(v: jax.Array) -> jax.Array:
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def register(init_pose: Pose,
             edge_pts: jax.Array, edge_mask: jax.Array,
             plane_pts: jax.Array, plane_mask: jax.Array,
             edge_bank: jax.Array, edge_bank_mask: jax.Array,
             plane_bank: jax.Array, plane_bank_mask: jax.Array,
             cfg: LidarConfig, iters: int) -> tuple[Pose, dict]:
    """Register a feature scan against target banks.  Jit-safe.

    Correspondences are re-found every iteration (LOAM re-associates per
    iteration too); the GN update is damped by `cfg.gn_damping`.
    Returns (refined map-from-scan pose, diagnostics).
    """

    def gn_update(pose, ec, pc):
        H, b, cost, n_in = build_normal_equations(
            pose, edge_pts, ec, plane_pts, pc, cfg.huber_delta)
        damp = cfg.gn_damping * (1.0 + jnp.diagonal(H))
        delta = -jnp.linalg.solve(H + jnp.diag(damp), b)
        # guard: reject non-finite updates (degenerate geometry)
        ok = jnp.all(jnp.isfinite(delta)) & (n_in > 10)
        delta = jnp.where(ok, delta, jnp.zeros_like(delta))
        new_pose = Pose(
            pose.t + delta[:3],
            quat_normalize(quat_mul(pose.q, so3_exp_quat(delta[3:6]))),
        )
        return new_pose, cost, n_in

    def step(carry, _):
        pose = carry
        # correspondence search is the expensive half (KNN over the map);
        # re-associating every 2 GN updates matches LOAM practice and
        # halves the KNN traffic
        pw_e = _transform(pose, edge_pts)
        pw_p = _transform(pose, plane_pts)
        ec = find_edge_corr(pw_e, edge_mask, edge_bank, edge_bank_mask, cfg)
        pc = find_plane_corr(pw_p, plane_mask, plane_bank, plane_bank_mask, cfg)
        pose, cost, n_in = gn_update(pose, ec, pc)
        pose, cost, n_in = gn_update(pose, ec, pc)
        return pose, (cost, n_in)

    n_outer = max(1, (iters + 1) // 2)
    pose, (costs, n_in) = jax.lax.scan(step, init_pose, None, length=n_outer)
    return pose, {"costs": costs, "inliers": n_in}
