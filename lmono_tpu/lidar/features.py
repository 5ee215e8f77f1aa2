"""Curvature-based edge/planar feature extraction from LiDAR range images.

This is the capability the reference outsources to A-LOAM (`Aloam/` is an
empty placeholder, `/root/reference/README.md:50-60`) — rebuilt TPU-native:
the scan lives as a fixed-shape (rings, W) range image, curvature is a
vectorized stencil along each ring, and per-sector feature selection is an
unrolled masked-argmax with neighbor suppression — no sorting of dynamic
lists, no branching on point counts.

Sharp (edge) features feed point-to-line residuals; flat (planar) features
feed point-to-plane residuals in `lmono_tpu.lidar.registration`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import LidarConfig


class ScanFeatures(NamedTuple):
    """Fixed-capacity feature sets (masked)."""

    edge_points: jax.Array    # (max_edge, 3) sensor frame
    edge_mask: jax.Array      # (max_edge,) bool
    planar_points: jax.Array  # (max_planar, 3)
    planar_mask: jax.Array    # (max_planar,) bool


def _ring_roll(x: jax.Array, shift: int) -> jax.Array:
    """Roll along the azimuth axis (wrap-around is physical for 360° scans).

    Works for (R, W) scalars and (R, W, 3) point arrays alike: azimuth is
    always axis 1.
    """
    return jnp.roll(x, shift, axis=1)


def compute_curvature(points: jax.Array, valid: jax.Array,
                      cfg: LidarConfig) -> tuple[jax.Array, jax.Array]:
    """A-LOAM-style curvature per point along each ring.

    c_i = || Σ_{j∈±k} (p_j − p_i) ||² normalized by range².
    Returns (curvature (R,W), curv_valid (R,W)).
    """
    k = cfg.curvature_half_window
    diff_sum = jnp.zeros_like(points)
    nvalid = jnp.ones_like(valid)
    for s in range(1, k + 1):
        for sh in (s, -s):
            diff_sum = diff_sum + (_ring_roll(points, sh) - points)
            nvalid = nvalid & _ring_roll(valid, sh)
    r2 = jnp.sum(points * points, axis=-1)
    c = jnp.sum(diff_sum * diff_sum, axis=-1) / jnp.maximum(r2, 1e-6)
    curv_valid = valid & nvalid
    return c, curv_valid


def occlusion_mask(ranges: jax.Array, valid: jax.Array) -> jax.Array:
    """Mask out points on occlusion boundaries and near-parallel surfaces
    (the classic LOAM 'unreliable point' filters), vectorized via rolls."""
    r_next = _ring_roll(ranges, -1)
    r_prev = _ring_roll(ranges, 1)
    v_next = _ring_roll(valid, -1)
    v_prev = _ring_roll(valid, 1)
    # occlusion: large range jump to neighbor → the farther side is unreliable
    occ_next = (r_next - ranges > 0.3) & v_next   # neighbor farther: neighbor bad, we ok
    occ_self = ((ranges - r_next > 0.3) & v_next) | ((ranges - r_prev > 0.3) & v_prev)
    del occ_next
    # near-parallel beam: both neighbor diffs large relative to range
    d_next = jnp.abs(r_next - ranges)
    d_prev = jnp.abs(r_prev - ranges)
    parallel = (d_next > 0.02 * ranges) & (d_prev > 0.02 * ranges)
    return valid & ~occ_self & ~parallel


def _select_topk_spaced(score: jax.Array, mask: jax.Array, k: int,
                        suppress: int) -> jax.Array:
    """Pick k spaced maxima per row of score (..., W) under mask.

    Returns int32 indices (..., k); masked-out picks get index 0 with the
    accompanying validity encoded by score>threshold at call site.  Unrolled
    over k (k is 3–8), each pick suppresses ±suppress neighbors.
    """
    W = score.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, score.shape, score.ndim - 1)
    neg = jnp.finfo(score.dtype).min
    s = jnp.where(mask, score, neg)
    picks = []
    pick_valid = []
    for _ in range(k):
        idx = jnp.argmax(s, axis=-1)
        val = jnp.take_along_axis(s, idx[..., None], axis=-1)[..., 0]
        picks.append(idx.astype(jnp.int32))
        pick_valid.append(val > neg * 0.5)
        dist = jnp.abs(col - idx[..., None])
        dist = jnp.minimum(dist, W - dist)  # circular distance
        s = jnp.where(dist <= suppress, neg, s)
    return (jnp.stack(picks, axis=-1),
            jnp.stack(pick_valid, axis=-1))


def extract_features(points: jax.Array, ranges: jax.Array, valid: jax.Array,
                     cfg: LidarConfig) -> ScanFeatures:
    """Full extraction: curvature → reliability filters → per-sector picks.

    points: (R, W, 3) sensor-frame; ranges: (R, W); valid: (R, W).
    """
    R, W = ranges.shape
    S = cfg.num_sectors
    if W % S != 0:
        raise ValueError(f"horiz_res {W} must be divisible by num_sectors {S}")
    Ws = W // S

    curv, curv_valid = compute_curvature(points, valid, cfg)
    reliable = occlusion_mask(ranges, valid) & curv_valid

    # sector view: (R, S, Ws)
    curv_s = curv.reshape(R, S, Ws)
    rel_s = reliable.reshape(R, S, Ws)

    # ---- edges: largest curvature above threshold, spaced picks
    e_idx, e_ok = _select_topk_spaced(
        curv_s, rel_s & (curv_s > cfg.edge_curvature_min),
        cfg.edges_per_sector, cfg.curvature_half_window)
    # ---- planars: smallest curvature below threshold
    p_idx, p_ok = _select_topk_spaced(
        -curv_s, rel_s & (curv_s < cfg.planar_curvature_max),
        cfg.planars_per_sector, cfg.curvature_half_window)

    pts_s = points.reshape(R, S, Ws, 3)

    def gather(idx, ok, cap):
        # idx: (R,S,k) sector-local cols → points (R,S,k,3)
        g = jnp.take_along_axis(pts_s, idx[..., None], axis=2)
        flat_pts = g.reshape(-1, 3)
        flat_ok = ok.reshape(-1)
        n = flat_pts.shape[0]
        if n >= cap:
            return flat_pts[:cap], flat_ok[:cap]
        pad = cap - n
        return (jnp.concatenate([flat_pts, jnp.zeros((pad, 3), flat_pts.dtype)]),
                jnp.concatenate([flat_ok, jnp.zeros(pad, bool)]))

    ep, em = gather(e_idx, e_ok, cfg.max_edge_features)
    pp, pm = gather(p_idx, p_ok, cfg.max_planar_features)
    return ScanFeatures(ep, em, pp, pm)


def extract_features_jit(cfg: LidarConfig):
    """Returns a jitted closure over the static config."""
    def fn(points, ranges, valid):
        return extract_features(points, ranges, valid, cfg)
    return jax.jit(fn)
