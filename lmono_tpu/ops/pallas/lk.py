"""Pallas TPU kernel for per-level Lucas–Kanade tracking.

The pure-XLA LK (`lmono_tpu.ops.lk`) samples patches with per-pixel gathers,
which scalarize on TPU (~0.8 s/frame for 96 features).  This kernel instead
keeps the whole pyramid level resident in VMEM and extracts each feature's
patch with *contiguous dynamic slices* (`pl.ds`), running all LK iterations
in-kernel — the only HBM traffic is the images once per level plus N×2
floats of feature state.

Grid: one program per feature slot; feature coordinates live in SMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lk_kernel(pt0_ref, guess_ref, img0_ref, ix0_ref, iy0_ref, img1_ref,
               out_ref, ok_ref, *, patch: int, iters: int, H: int, W: int,
               H_pad: int, W_pad: int):
    P = patch
    S = P + 1  # slab with +1 for bilinear

    i = pl.program_id(0)
    x0 = pt0_ref[i, 0]
    y0 = pt0_ref[i, 1]
    gx0 = guess_ref[i, 0]
    gy0 = guess_ref[i, 1]

    r = (P - 1) * 0.5
    # slab rows: S rounded up to a multiple of 8, plus 8 for the row phase
    SR = ((S + 7) // 8) * 8 + 8

    def base_of(xf, yf):
        """Integer slab base + fractional offset, clamped to the image."""
        bx = jnp.floor(xf - r)
        by = jnp.floor(yf - r)
        bxi = jnp.clip(bx.astype(jnp.int32), 0, W - S)
        byi = jnp.clip(by.astype(jnp.int32), 0, H - S)
        return bxi, byi, xf - r - bxi.astype(jnp.float32), \
            yf - r - byi.astype(jnp.float32)

    def sample(ref, bxi, byi, fx, fy):
        """Bilinear P×P patch.

        Mosaic constraints: VMEM vector loads need the sublane start ≡ 0
        (mod 8) and the lane start ≡ 0 (mod 128).  So: load an 8-aligned
        SR-row full-width slab, then rotate the row phase and the column
        offset in-register with `pltpu.roll` and slice statically.
        """
        byi_al = jnp.clip((byi // 8) * 8, 0, H_pad - SR)
        byi_al = pl.multiple_of(byi_al, 8)
        off = byi - byi_al                           # 0..(SR-S)
        slab = ref[pl.ds(byi_al, SR), :]             # (SR, W_pad)
        slab = pltpu.roll(slab, SR - off, 0)         # row phase → row 0
        # rotate over the lane-ALIGNED padded width (Mosaic's
        # dynamic_rotate requires it); bxi + S <= W <= W_pad, so the
        # static [0:S] slice sees only real columns
        slab = pltpu.roll(slab, W_pad - bxi, 1)[0:S, 0:S]
        tl = slab[0:P, 0:P]
        tr = slab[0:P, 1:S]
        bl = slab[1:S, 0:P]
        br = slab[1:S, 1:S]
        top = tl + fx * (tr - tl)
        bot = bl + fx * (br - bl)
        return top + fy * (bot - top)

    bxi0, byi0, fx0, fy0 = base_of(x0, y0)
    t_patch = sample(img0_ref, bxi0, byi0, fx0, fy0)
    gx = sample(ix0_ref, bxi0, byi0, fx0, fy0)
    gy = sample(iy0_ref, bxi0, byi0, fx0, fy0)

    gxx = jnp.sum(gx * gx)
    gxy = jnp.sum(gx * gy)
    gyy = jnp.sum(gy * gy)
    det = gxx * gyy - gxy * gxy
    ok_g = det > 1e-6
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    i00 = gyy * inv_det
    i01 = -gxy * inv_det
    i11 = gxx * inv_det

    def body(_, carry):
        xf, yf, _step = carry
        bxi, byi, fx, fy = base_of(xf, yf)
        it = sample(img1_ref, bxi, byi, fx, fy) - t_patch
        bx_ = jnp.sum(it * gx)
        by_ = jnp.sum(it * gy)
        dx = i00 * bx_ + i01 * by_
        dy = i01 * bx_ + i11 * by_
        return xf - dx, yf - dy, jnp.sqrt(dx * dx + dy * dy)

    xf, yf, last_step = jax.lax.fori_loop(
        0, iters, body, (gx0, gy0, jnp.float32(0.0)))

    out_ref[i, 0] = xf
    out_ref[i, 1] = yf
    ok_ref[i, 0] = (ok_g & (last_step < 0.1)
                    & (xf > 1.0) & (xf < W - 2.0)
                    & (yf > 1.0) & (yf < H - 2.0)).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("patch", "iters", "interpret"))
def lk_level_pallas(img0, ix0, iy0, img1, pts0, guess,
                    patch: int = 21, iters: int = 10,
                    interpret: bool = False):
    """Track all features one level: pts0/guess (N,2) → (pt1 (N,2), ok (N,)).

    Feature positions are in this level's pixel coordinates.
    """
    H, W = img0.shape
    N = pts0.shape[0]
    # pad rows to a multiple of 8 (aligned slab loads) and columns to a
    # multiple of 128 (the lane rotate requires an aligned width — KITTI
    # pyramid levels like 155 = 1241/8 are otherwise rejected by Mosaic);
    # the kernel clamps feature coords to the TRUE image dims
    H8 = ((H + 7) // 8) * 8
    W128 = ((W + 127) // 128) * 128
    SR = ((patch + 8) // 8) * 8 + 8
    if H8 < SR or W < patch + 1:
        raise ValueError(
            f"image {H}x{W} too small for patch {patch} (need >= {SR} rows); "
            "use fewer pyramid levels or the vmapped LK path")
    if H8 != H or W128 != W:
        pad = ((0, H8 - H), (0, W128 - W))
        img0 = jnp.pad(img0, pad)
        ix0 = jnp.pad(ix0, pad)
        iy0 = jnp.pad(iy0, pad)
        img1 = jnp.pad(img1, pad)
    kernel = functools.partial(_lk_kernel, patch=patch, iters=iters,
                               H=H, W=W, H_pad=H8, W_pad=W128)
    img_spec = pl.BlockSpec((H8, W128), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    smem_pts = pl.BlockSpec((N, 2), lambda i: (0, 0),
                            memory_space=pltpu.SMEM)
    pt1, okf = pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=[smem_pts, smem_pts, img_spec, img_spec, img_spec, img_spec],
        out_specs=[
            pl.BlockSpec((N, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((N, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 2), jnp.float32),
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
        ],
        interpret=interpret,
    )(pts0, guess, img0, ix0, iy0, img1)
    return pt1, okf[:, 0] > 0.5
