"""Pyramidal Lucas–Kanade feature tracking, vmapped over feature slots.

TPU-native equivalent of `cv::calcOpticalFlowPyrLK` as used by the reference
front-end (`FeatureTracker::trackImage`, `FeatureTracker.cc:189-279`,
including the forward-backward consistency check at `:218-235`): a classic
translational KLT — per level, the 2×2 normal matrix comes from template
gradients; iterations update the match position with bilinear sampling.
All features advance in lockstep (masked), so the whole tracker is one fused
XLA program per pyramid level.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from lmono_tpu.ops.image import bilinear_sample, scharr_gradients


def _patch_coords(center: jax.Array, patch: int) -> jax.Array:
    """(patch², 2) sampling coordinates around center (2,)."""
    r = patch // 2
    offs = jnp.arange(patch, dtype=jnp.float32) - r
    ox, oy = jnp.meshgrid(offs, offs, indexing="xy")
    o = jnp.stack([ox.ravel(), oy.ravel()], axis=-1)
    return center[None, :] + o


def lk_level(img0, ix0, iy0, img1, pt0, pt1_init, patch: int, iters: int,
             eps: float):
    """Track one feature at one level. Returns (pt1, converged, min_eig_ok)."""
    c0 = _patch_coords(pt0, patch)
    t = bilinear_sample(img0, c0)
    gx = bilinear_sample(ix0, c0)
    gy = bilinear_sample(iy0, c0)
    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    tr = gxx + gyy
    min_eig = 0.5 * (tr - jnp.sqrt(jnp.maximum(tr * tr - 4 * det, 0.0)))
    ok_g = det > 1e-6

    inv00 = jnp.where(ok_g, gyy / jnp.maximum(det, 1e-12), 0.0)
    inv01 = jnp.where(ok_g, -gxy / jnp.maximum(det, 1e-12), 0.0)
    inv11 = jnp.where(ok_g, gxx / jnp.maximum(det, 1e-12), 0.0)

    def body(carry, _):
        pt = carry
        c1 = _patch_coords(pt, patch)
        it = bilinear_sample(img1, c1) - t
        bx = jnp.sum(it * gx)
        by = jnp.sum(it * gy)
        dx = inv00 * bx + inv01 * by
        dy = inv01 * bx + inv11 * by
        step = jnp.stack([dx, dy])
        # note: d minimizes ||I1(x+d) − T||: move against the residual
        return pt - step, jnp.linalg.norm(step)

    pt1, steps = jax.lax.scan(body, pt1_init, None, length=iters)
    converged = steps[-1] < eps * 10.0  # loose gate; fb-check is the filter
    return pt1, converged & ok_g, min_eig


def track_pyramid(pyr0: Sequence, grads0: Sequence, pyr1: Sequence,
                  pts0: jax.Array, mask: jax.Array, patch: int,
                  iters: int, eps: float):
    """Track pts0 (N,2) from pyramid pyr0 to pyr1, coarse→fine.

    pyr*/grads0 are lists (len L) of (H,W) arrays (grads0[l] = (ix, iy)).
    Returns (pts1 (N,2), ok (N,)).

    On TPU each level runs as the Pallas kernel (`ops.pallas.lk`): the level
    stays in VMEM and patches are contiguous dynamic slices — the pure-XLA
    gather path scalarizes and is ~40× slower there.
    """
    L = len(pyr0)
    scale = 2.0 ** (L - 1)
    guess = pts0 / scale
    ok = mask
    use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from lmono_tpu.ops.pallas.lk import lk_level_pallas

    for lvl in range(L - 1, -1, -1):
        s = 2.0 ** lvl
        p0_l = pts0 / s
        img0, img1 = pyr0[lvl], pyr1[lvl]
        ix0, iy0 = grads0[lvl]
        # Mosaic's dynamic_rotate needs a 128-lane-aligned image row; tiny
        # pyramid levels (small cameras) fall back to the vmapped kernel
        if use_pallas and img0.shape[1] >= 128:
            guess, conv = lk_level_pallas(img0, ix0, iy0, img1, p0_l, guess,
                                          patch=patch, iters=iters)
        else:
            f = jax.vmap(
                lambda p0, g: lk_level(img0, ix0, iy0, img1, p0, g, patch,
                                       iters, eps))
            guess, conv, _ = f(p0_l, guess)
        ok = ok & conv
        if lvl > 0:
            guess = guess * 2.0
    H, W = pyr0[0].shape
    inb = ((guess[:, 0] > 1) & (guess[:, 0] < W - 2)
           & (guess[:, 1] > 1) & (guess[:, 1] < H - 2))
    return guess, ok & inb


def track_fb(pyr0, grads0, pyr1, grads1, pts0, mask, patch: int = 21,
             iters: int = 10, eps: float = 0.01, fb_thresh: float = 0.5):
    """Forward-backward tracking (reference `FeatureTracker.cc:218-235`)."""
    pts1, ok1 = track_pyramid(pyr0, grads0, pyr1, pts0, mask, patch, iters, eps)
    back, ok2 = track_pyramid(pyr1, grads1, pyr0, pts1, ok1, patch, iters, eps)
    fb_err = jnp.linalg.norm(back - pts0, axis=-1)
    return pts1, ok1 & ok2 & (fb_err < fb_thresh)
