"""Dense image ops: pyramids, gradients, bilinear sampling, blurs.

These are the XLA-native building blocks replacing the reference's OpenCV
calls (`cv::buildOpticalFlowPyramid`, `cv::goodFeaturesToTrack` internals,
`cv::dilate`/`cv::medianBlur` in DepthMapUtil.cc): everything is expressed as
`reduce_window` / conv / gather so it fuses on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def avg_pool2(img: jax.Array) -> jax.Array:
    """2x2 average downsample (pyramid level); odd edges are cropped
    (KITTI images are 1241 px wide)."""
    H, W = img.shape
    h2, w2 = (H // 2) * 2, (W // 2) * 2
    return img[:h2, :w2].reshape(H // 2, 2, W // 2, 2).mean(axis=(1, 3))


def build_pyramid(img: jax.Array, levels: int) -> list:
    """Gaussian-ish pyramid as a list of (H/2^l, W/2^l) arrays."""
    pyr = [img]
    for _ in range(levels - 1):
        img = avg_pool2(gauss_blur3(img))
        pyr.append(img)
    return pyr


_G3 = jnp.array([0.25, 0.5, 0.25])


def _sep_conv(img: jax.Array, kx: jax.Array, ky: jax.Array) -> jax.Array:
    """Separable 2D conv with SAME padding. img: (H, W)."""
    x = img[None, None]
    kh = ky.reshape(1, 1, -1, 1).astype(img.dtype)
    kw = kx.reshape(1, 1, 1, -1).astype(img.dtype)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), "SAME")
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), "SAME")
    return x[0, 0]


def gauss_blur3(img: jax.Array) -> jax.Array:
    return _sep_conv(img, _G3, _G3)


def gauss_blur5(img: jax.Array) -> jax.Array:
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    return _sep_conv(img, k, k)


def scharr_gradients(img: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(Ix, Iy) via Scharr kernels (same choice OpenCV's KLT uses)."""
    d = jnp.array([-1.0, 0.0, 1.0]) * 0.5
    s = jnp.array([3.0, 10.0, 3.0]) / 16.0
    ix = _sep_conv(img, d, s)
    iy = _sep_conv(img, s, d)
    return ix, iy


def bilinear_sample(img: jax.Array, xy: jax.Array) -> jax.Array:
    """Sample img (H, W) at subpixel positions xy (..., 2) in (x, y) order.

    Out-of-bounds clamps to the border (callers gate validity separately).
    """
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    i00 = img[y0, x0]
    i01 = img[y0, x0 + 1]
    i10 = img[y0 + 1, x0]
    i11 = img[y0 + 1, x0 + 1]
    top = i00 + fx * (i01 - i00)
    bot = i10 + fx * (i11 - i10)
    return top + fy * (bot - top)


def max_pool_same(img: jax.Array, k: int) -> jax.Array:
    """k×k max pool with SAME padding (for NMS)."""
    return jax.lax.reduce_window(
        img, -jnp.inf, jax.lax.max, (k, k), (1, 1), "SAME")


def dilate(img: jax.Array, k: int) -> jax.Array:
    """Grayscale morphological dilation with a k×k square structuring
    element (depth-completion building block)."""
    return max_pool_same(img, k)


def erode(img: jax.Array, k: int) -> jax.Array:
    return -max_pool_same(-img, k)


def dilate_masked(img: jax.Array, valid: jax.Array, k: int,
                  kernel: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """Dilation treating invalid pixels as -inf; optional 0/1 kernel shape
    (CROSS / DIAMOND / FULL as in the reference's depth completion,
    `Map_Builder.cc:336-403`).  Returns (dilated, new_valid)."""
    neg = jnp.where(valid, img, -jnp.inf)
    if kernel is None:
        out = max_pool_same(neg, k)
    else:
        # kernel: (k, k) 0/1 — implement as max over shifted copies
        H, W = img.shape
        out = jnp.full((H, W), -jnp.inf, img.dtype)
        r = k // 2
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if kernel[dy + r, dx + r] == 0:
                    continue
                shifted = jnp.roll(neg, (dy, dx), axis=(0, 1))
                out = jnp.maximum(out, shifted)
    new_valid = out > -jnp.inf
    return jnp.where(new_valid, out, 0.0), new_valid


def median_blur_approx(img: jax.Array, k: int = 3) -> jax.Array:
    """Exact k×k median via sort of the 9 (k=3) shifted copies."""
    shifts = []
    r = k // 2
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifts.append(jnp.roll(img, (dy, dx), axis=(0, 1)))
    stack = jnp.stack(shifts)
    return jnp.sort(stack, axis=0)[stack.shape[0] // 2]
