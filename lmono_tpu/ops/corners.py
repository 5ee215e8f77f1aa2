"""Shi–Tomasi corner detection with grid-cell NMS (fixed shapes).

Replaces `cv::goodFeaturesToTrack` + the reference's min-distance mask
(`FeatureTracker::setMask`, `FeatureTracker.cc:55-84`): corner response is
the structure-tensor min-eigenvalue computed with convs; spacing is enforced
by a `cell×cell` grid — one winner per cell, cells containing existing
features are suppressed — which is the TPU-friendly equivalent of OpenCV's
circle mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lmono_tpu.ops.image import gauss_blur3, max_pool_same, scharr_gradients


def shi_tomasi_response(img: jax.Array, window: int = 3) -> jax.Array:
    """Min-eigenvalue of the structure tensor per pixel."""
    ix, iy = scharr_gradients(gauss_blur3(img))
    ixx = gauss_blur3(ix * ix)
    iyy = gauss_blur3(iy * iy)
    ixy = gauss_blur3(ix * iy)
    tr_half = 0.5 * (ixx + iyy)
    det_part = jnp.sqrt(jnp.maximum(
        0.25 * (ixx - iyy) ** 2 + ixy * ixy, 0.0))
    return tr_half - det_part


def detect_grid(img: jax.Array, cell: int, max_new: int,
                occupied_uv: jax.Array, occupied_mask: jax.Array,
                min_quality_rel: float = 0.01,
                border: int = 8) -> tuple[jax.Array, jax.Array]:
    """Detect up to `max_new` corners, one per cell, skipping occupied cells.

    img: (H, W); occupied_uv: (N, 2) existing feature pixels.
    Returns (uv (max_new, 2) float32, valid (max_new,) bool), best-first.
    """
    H, W = img.shape
    resp = shi_tomasi_response(img)
    # border suppression
    yy = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xx = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    inb = ((xx >= border) & (xx < W - border)
           & (yy >= border) & (yy < H - border))
    resp = jnp.where(inb, resp, -jnp.inf)
    # local 3x3 NMS
    is_max = resp >= max_pool_same(resp, 3)
    resp = jnp.where(is_max, resp, -jnp.inf)

    # grid reduction: best per cell
    Hc, Wc = H // cell, W // cell
    rc = resp[:Hc * cell, :Wc * cell].reshape(Hc, cell, Wc, cell)
    cell_best = rc.max(axis=(1, 3))                       # (Hc, Wc)
    flat_in_cell = rc.transpose(0, 2, 1, 3).reshape(Hc, Wc, cell * cell)
    argbest = jnp.argmax(flat_in_cell, axis=-1)           # (Hc, Wc)
    by = argbest // cell
    bx = argbest % cell
    cy = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 0) * cell + by
    cx = jax.lax.broadcasted_iota(jnp.int32, (Hc, Wc), 1) * cell + bx

    # occupied cells (existing features)
    occ = jnp.zeros((Hc, Wc), bool)
    ou = jnp.clip((occupied_uv[:, 0] // cell).astype(jnp.int32), 0, Wc - 1)
    ov = jnp.clip((occupied_uv[:, 1] // cell).astype(jnp.int32), 0, Hc - 1)
    occ = occ.at[ov, ou].set(occupied_mask, mode="drop")
    # drop also adjacent-occupied? reference radius is min_dist ≈ cell: keep 1 cell
    cell_best = jnp.where(occ, -jnp.inf, cell_best)

    # quality gate relative to the strongest response
    qmin = min_quality_rel * jnp.maximum(jnp.max(cell_best), 1e-12)
    ok_cell = cell_best > jnp.maximum(qmin, 0.0)

    # top max_new cells
    flat = cell_best.reshape(-1)
    vals, idx = jax.lax.top_k(flat, max_new)
    sel_y = cy.reshape(-1)[idx]
    sel_x = cx.reshape(-1)[idx]
    uv = jnp.stack([sel_x, sel_y], axis=-1).astype(jnp.float32)
    valid = vals > -jnp.inf
    valid = valid & ok_cell.reshape(-1)[idx]
    return uv, valid
