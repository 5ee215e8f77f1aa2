"""Parity test: Pallas LK kernel (interpret mode on CPU) vs the vmapped LK."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.ops.image import build_pyramid, scharr_gradients, bilinear_sample
from lmono_tpu.ops.lk import lk_level
from lmono_tpu.ops.pallas.lk import lk_level_pallas


def noise_image(key, H=96, W=128):
    base = jax.random.normal(key, (H // 8, W // 8))
    img = jax.image.resize(base, (H, W), "bicubic")
    return (img - img.min()) / (img.max() - img.min())


def shift_image(img, dx, dy):
    H, W = img.shape
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    return bilinear_sample(img, jnp.stack([xx + dx, yy + dy], -1))


def test_pallas_lk_matches_vmapped():
    img0 = noise_image(jax.random.PRNGKey(0))
    img1 = shift_image(img0, 2.3, -1.6)
    ix0, iy0 = scharr_gradients(img0)
    pts = jnp.array([[40.0, 40.0], [64.0, 30.0], [90.0, 60.0],
                     [30.0, 70.0], [50.0, 50.0], [70.0, 40.0],
                     [45.0, 25.0], [85.0, 45.0]])
    p_pallas, ok_pallas = lk_level_pallas(
        img0, ix0, iy0, img1, pts, pts, patch=15, iters=12, interpret=True)
    f = jax.vmap(lambda p0, g: lk_level(img0, ix0, iy0, img1, p0, g,
                                        15, 12, 0.01))
    p_ref, ok_ref, _ = f(pts, pts)
    okb = np.asarray(ok_pallas) & np.asarray(ok_ref)
    assert okb.sum() >= 5
    np.testing.assert_allclose(np.asarray(p_pallas)[okb],
                               np.asarray(p_ref)[okb], atol=0.1)
    # both must recover the true flow (img1(x)=img0(x+d) → flow -d)
    flow = np.asarray(p_pallas - pts)[okb]
    np.testing.assert_allclose(flow.mean(0), [-2.3, 1.6], atol=0.2)
