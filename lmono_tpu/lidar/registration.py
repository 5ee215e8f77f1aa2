"""Scan registration: point-to-line / point-to-plane Gauss-Newton on TPU.

TPU-native rebuild of the LOAM-family registration the reference outsources
to A-LOAM (`/root/reference/README.md:50-60`): correspondences come from the
streaming brute-force KNN (`lmono_tpu.ops.knn`) instead of PCL KD-trees, line
and plane fits are closed-form batched 3×3 eigendecompositions instead of
Ceres autodiff factors, and the 6-DoF damped Gauss-Newton runs entirely
inside one jitted `lax.scan` — fixed shapes, masked residuals, no host
round-trips.

Residual conventions (match the LOAM formulation) — both are expressed in
the unified form  r = A·(T·p − c)  so edges and planes share one batched
Jacobian/normal-equation assembly (fewer, larger device ops):
  edge point  p with line (c, d̂):  A = I − d̂d̂ᵀ (rank-2 projector)
  planar point p with plane (n̂, ρ): A = n̂n̂ᵀ, c = −ρ·n̂
    (then A(Tp − c) = n̂·(n̂ᵀTp + ρ), the classic scalar plane residual as a
     3-vector along n̂ — identical cost and normal equations.)
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import LidarConfig
from lmono_tpu.ops.knn import knn
from lmono_tpu.utils.lie import Pose, quat_rotate, so3_exp_quat, quat_mul, quat_normalize


# --------------------------------------------------------------------------
# Closed-form batched symmetric 3×3 eigendecomposition
# --------------------------------------------------------------------------

def _sym3x3_eigvals(A: jax.Array) -> jax.Array:
    """Eigenvalues (descending) of symmetric (..., 3, 3), analytic
    (trigonometric/Smith method) — no iteration, pure elementwise ops."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=A.dtype)
    B = A - q[..., None, None] * I
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    # clamp keeps p³ ≥ 1e-30 — representable in f32, so the degenerate
    # (isotropic/empty) case yields r = 0/(tiny) = 0, never 0/0 = NaN
    p = jnp.sqrt(jnp.maximum(p2, 1e-20))
    detB = jnp.linalg.det(B)
    r = detB / (2.0 * p ** 3)
    r = jnp.clip(r, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    l1 = q + 2.0 * p * jnp.cos(phi)
    l3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    l2 = 3.0 * q - l1 - l3
    return jnp.stack([l1, l2, l3], axis=-1)


def _eigvec_for(A: jax.Array, lam_a: jax.Array, lam_b: jax.Array) -> jax.Array:
    """Unit eigenvector of symmetric A for the eigenvalue NOT in {lam_a,
    lam_b}: columns of (A−λₐI)(A−λᵦI) span it; pick the largest column."""
    I = jnp.eye(3, dtype=A.dtype)
    M = jnp.matmul(A - lam_a[..., None, None] * I,
                   A - lam_b[..., None, None] * I)
    n2 = jnp.sum(M * M, axis=-2)                     # (..., 3) column norms²
    col = jnp.argmax(n2, axis=-1)
    v = jnp.take_along_axis(M, col[..., None, None], axis=-1)[..., 0]
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)


def _weighted_cov(nbrs: jax.Array, nbr_ok: jax.Array):
    w = nbr_ok.astype(nbrs.dtype)[..., None]
    cnt = jnp.maximum(jnp.sum(w, axis=1), 1.0)
    c = jnp.sum(nbrs * w, axis=1) / cnt
    x = (nbrs - c[:, None, :]) * w
    cov = jnp.einsum("qki,qkj->qij", x, x) / cnt[..., None]
    return c, cov


def fit_lines(nbrs: jax.Array, nbr_ok: jax.Array):
    """Line fit per query: nbrs (Q, k, 3), nbr_ok (Q, k).

    Returns (centroid (Q,3), dir (Q,3) unit, line_ok (Q,)).
    Line-ness gate: dominant eigenvalue ≥ 1.5× the rest (A-LOAM uses 3× the
    second; with k=5 neighbors the trace bound is the robust equivalent).
    """
    c, cov = _weighted_cov(nbrs, nbr_ok)
    lam = _sym3x3_eigvals(cov)
    v = _eigvec_for(cov, lam[..., 1], lam[..., 2])   # dominant
    lam1 = lam[..., 0]
    lam_rest = jnp.maximum(lam[..., 1] + lam[..., 2], 0.0)
    line_ok = (jnp.sum(nbr_ok, axis=1) >= 3) & (lam1 > 1.5 * lam_rest) & (lam1 > 1e-6)
    return c, v, line_ok


def fit_planes(nbrs: jax.Array, nbr_ok: jax.Array, plane_tol: float = 0.2):
    """Plane fit per query: normal = smallest-eigenvalue direction of the
    neighbor covariance (origin-independent, unlike A-LOAM's A·n=-1 trick,
    which is singular for planes through the map origin — e.g. the ground).

    Returns (normal (Q,3) unit, rho (Q,), plane_ok (Q,)) with the plane
    n·x + rho = 0.  plane_ok requires every inlier within `plane_tol`.
    """
    c, cov = _weighted_cov(nbrs, nbr_ok)
    lam = _sym3x3_eigvals(cov)
    n_unit = _eigvec_for(cov, lam[..., 0], lam[..., 1])  # smallest
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


def _knn_cfg(query_w, bank, bank_mask, cfg: LidarConfig, center,
             axis: str | None = None):
    # "pallas" routes to the exact streaming kernel (ops/pallas/knn.py).
    # Default is XLA everywhere: profiled IN-PROGRAM on the v5e (trace
    # 2026-08-21), the fused broadcast-diff + approx_min_k runs 0.07 ms at
    # Q=1024/M=16k inside the odometry scan vs 0.28 ms for the Pallas
    # custom call at the same shape — the kernel wins standalone-dispatch
    # microbenches but the custom-call boundary blocks XLA fusion with the
    # surrounding gather/fit ops.  shard_map lanes (axis set) and non-TPU
    # backends always use XLA.
    use_pallas = (cfg.knn_impl == "pallas"
                  or (cfg.knn_impl == "auto" and axis is None
                      and jax.default_backend() == "tpu"))
    if use_pallas and axis is None:
        from lmono_tpu.ops.pallas.knn import knn_pallas
        return knn_pallas(query_w, bank, bank_mask, cfg.knn_k)
    sel = jnp.bfloat16 if cfg.knn_select == "bf16" else None
    prec = (jax.lax.Precision.HIGH if cfg.knn_select == "bf16x3" else None)
    return knn(query_w, bank, bank_mask, cfg.knn_k,
               center=center, select_dtype=sel, select_precision=prec)


def _knn_nbrs(query_w, bank, bank_mask, cfg: LidarConfig, center,
              axis: str | None):
    """k nearest neighbor COORDS (d2 (Q,k), nbrs (Q,k,3)).

    axis: inside `shard_map`, `bank` is this device's shard of the map
    bank; the per-shard top-k candidates are all-gathered over the mesh
    axis and reduced to the global top-k — exact (the global winners are
    contained in the union of per-shard winners), O(Q·k·D) bytes on ICI
    vs the O(Q·M/D) local distance work (see parallel/dist_knn.py).
    """
    d2, idx = _knn_cfg(query_w, bank, bank_mask, cfg, center, axis)
    nbrs = bank[idx]                                 # (Q, k, 3)
    if axis is None:
        return d2, nbrs
    d2_all = jax.lax.all_gather(d2, axis, axis=1, tiled=True)     # (Q, D·k)
    nbrs_all = jax.lax.all_gather(nbrs, axis, axis=1, tiled=True)  # (Q,D·k,3)
    neg, sel = jax.lax.top_k(-d2_all, cfg.knn_k)
    return -neg, jnp.take_along_axis(nbrs_all, sel[..., None], axis=1)


def find_edge_corr(query_w: jax.Array, qmask: jax.Array,
                   bank: jax.Array, bank_mask: jax.Array,
                   cfg: LidarConfig, center: jax.Array | None = None,
                   axis: str | None = None) -> EdgeCorr:
    d2, nbrs = _knn_nbrs(query_w, bank, bank_mask, cfg, center, axis)
    nbr_ok = (d2 < cfg.corr_max_dist ** 2) & qmask[:, None]
    c, v, ok = fit_lines(nbrs, nbr_ok)
    return EdgeCorr(c, v, ok & qmask)


def find_plane_corr(query_w: jax.Array, qmask: jax.Array,
                    bank: jax.Array, bank_mask: jax.Array,
                    cfg: LidarConfig, center: jax.Array | None = None,
                    axis: str | None = None) -> PlaneCorr:
    d2, nbrs = _knn_nbrs(query_w, bank, bank_mask, cfg, center, axis)
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


def _unified_targets(ec: EdgeCorr, pc: PlaneCorr):
    """Stack edge and plane correspondences into one (Q, ...) batch of the
    unified residual r = A(Tp − c)."""
    I = jnp.eye(3, dtype=ec.centroid.dtype)
    A_e = I - jnp.einsum("qi,qj->qij", ec.direction, ec.direction)
    c_e = ec.centroid
    A_p = jnp.einsum("qi,qj->qij", pc.normal, pc.normal)
    c_p = -pc.rho[:, None] * pc.normal
    A = jnp.concatenate([A_e, A_p], axis=0)
    c = jnp.concatenate([c_e, c_p], axis=0)
    ok = jnp.concatenate([ec.ok, pc.ok], axis=0)
    return A, c, ok


def build_normal_equations(pose: Pose, pts: jax.Array,
                           A: jax.Array, c: jax.Array, ok: jax.Array,
                           huber_delta: float):
    """Assemble H (6,6), b (6,), cost, inliers for the unified batch.

    Jacobians are analytic w.r.t. the local delta (dp global, dθ right-mul):
      T(δ)·p = R·exp(dθ)·p + t + dp ⇒ ∂(T·p)/∂dp = I, ∂(T·p)/∂dθ = −R[p]×,
      so ∂r/∂[dp dθ] = A · [I  −R[p]×].
    """
    Rm = pose.R
    pw = _transform(pose, pts)                            # (Q,3)
    r = jnp.einsum("qij,qj->qi", A, pw - c)               # (Q,3)
    # hard-zero masked rows BEFORE any product: masked garbage (e.g. huge
    # rho from degenerate fits) would otherwise poison sums via inf*0=nan
    r = jnp.where(ok[:, None], r, 0.0)
    Rp = -jnp.einsum("ij,qjk->qik", Rm, _skew_batch(pts)) # (Q,3,3)
    J = jnp.concatenate([A, jnp.einsum("qij,qjk->qik", A, Rp)], axis=-1)
    rn = jnp.linalg.norm(r, axis=-1)
    w = _huber_w(rn, huber_delta) * ok.astype(r.dtype)
    H = jnp.einsum("qai,q,qaj->ij", J, w, J)
    b = jnp.einsum("qai,q,qa->i", J, w, r)
    cost = jnp.sum(w * rn ** 2)
    n_inlier = jnp.sum(ok)
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
             cfg: LidarConfig, iters: int,
             axis: str | None = None) -> tuple[Pose, dict]:
    """Register a feature scan against target banks.  Jit-safe.

    Correspondences are re-found every iteration (LOAM re-associates per
    iteration too); the GN update is damped by `cfg.gn_damping`.
    Returns (refined map-from-scan pose, diagnostics).

    axis: map banks are sharded over this mesh axis (inside shard_map);
    only the correspondence search communicates (candidate merge) — the
    merged targets are replicated, so the GN itself stays collective-free.
    """
    all_pts = jnp.concatenate([edge_pts, plane_pts], axis=0)

    def gn_update(pose, A, c, ok):
        H, b, cost, n_in = build_normal_equations(
            pose, all_pts, A, c, ok, cfg.huber_delta)
        damp = cfg.gn_damping * (1.0 + jnp.diagonal(H))
        delta = -jnp.linalg.solve(H + jnp.diag(damp), b)
        # guard: reject non-finite updates (degenerate geometry)
        good = jnp.all(jnp.isfinite(delta)) & (n_in > 10)
        delta = jnp.where(good, delta, jnp.zeros_like(delta))
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
        # recentering by the sensor position keeps coordinates ≤ max_range,
        # which is what makes bf16 neighbor selection safe at world scale
        ec = find_edge_corr(pw_e, edge_mask, edge_bank, edge_bank_mask, cfg,
                            center=pose.t, axis=axis)
        pc = find_plane_corr(pw_p, plane_mask, plane_bank, plane_bank_mask,
                             cfg, center=pose.t, axis=axis)
        A, c, ok = _unified_targets(ec, pc)
        pose, cost, n_in = gn_update(pose, A, c, ok)
        pose, cost, n_in = gn_update(pose, A, c, ok)
        return pose, (cost, n_in)

    n_outer = max(1, (iters + 1) // 2)
    pose, (costs, n_in) = jax.lax.scan(step, init_pose, None, length=n_outer)
    return pose, {"costs": costs, "inliers": n_in}
