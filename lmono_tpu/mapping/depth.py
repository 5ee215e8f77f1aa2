"""Sparse depth-map construction + morphological completion.

Rebuild of the reference's depth pipeline (`src/map_builder/Map_Builder.cc`:
`Point3DTo2D` per-point projection :405-416 → sparse depth map → `depthFill`
morphological completion :336-403; also `DepthCompletion::depthCompletionFast`
in `src/visualizer/DepthMapUtil.cc:7-47`): projection is one vmapped
`space_to_plane` + scatter-min, completion is dilate→close→dilate→median→blur
expressed with `reduce_window`/convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera.base import CameraModel
from lmono_tpu.config import MappingConfig
from lmono_tpu.ops.image import (
    dilate_masked,
    erode,
    gauss_blur5,
    max_pool_same,
    median_blur_approx,
)


def kernel_shape(kind: str, k: int) -> np.ndarray:
    """Structuring elements matching the reference's FULL/CROSS/DIAMOND
    options (`kernel_type` in kitti_map_config, Map_Builder.cc:336-360)."""
    y, x = np.mgrid[-(k // 2): k // 2 + 1, -(k // 2): k // 2 + 1]
    if kind == "full":
        return np.ones((k, k), np.float32)
    if kind == "cross":
        return ((x == 0) | (y == 0)).astype(np.float32)
    if kind == "diamond":
        return (np.abs(x) + np.abs(y) <= k // 2).astype(np.float32)
    raise ValueError(kind)


def project_cloud(points_cam: jax.Array, valid: jax.Array, cam: CameraModel,
                  depth_min: float, depth_max: float):
    """Scatter-min LiDAR points into a sparse depth image.

    points_cam: (N, 3) in camera frame.  Returns (depth (H,W), mask (H,W)).
    """
    H, W = cam.height, cam.width
    z = points_cam[..., 2]
    uv = cam.space_to_plane(points_cam)
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    ok = (valid & (z > depth_min) & (z < depth_max)
          & (u >= 0) & (u < W) & (v >= 0) & (v < H))
    u = jnp.clip(u, 0, W - 1)
    v = jnp.clip(v, 0, H - 1)
    big = jnp.full((H, W), jnp.inf, points_cam.dtype)
    zz = jnp.where(ok, z, jnp.inf)
    depth = big.at[v, u].min(zz)
    mask = jnp.isfinite(depth)
    return jnp.where(mask, depth, 0.0), mask


def complete_depth(depth: jax.Array, mask: jax.Array,
                   cfg: MappingConfig) -> tuple[jax.Array, jax.Array]:
    """Morphological depth completion (reference `depthFill`).

    Operates on inverted depth (max-pooling near surfaces win over far, the
    trick the reference inherits from 'In Defense of Classical Image
    Processing' depth completion): invert → dilate(kernel) → close →
    small-hole dilate → median → blur → re-invert.
    """
    dmax = cfg.depth_max
    inv = jnp.where(mask, dmax - depth, 0.0)

    # numpy (static) kernel: dilate_masked unrolls over nonzero taps at trace
    kern = kernel_shape(cfg.kernel_type, cfg.filter_size)
    inv, m1 = dilate_masked(inv, mask, cfg.filter_size, kern)
    # morphological close (dilate then erode) to seal speckle holes
    closed = erode(max_pool_same(inv, 5), 5)
    inv = jnp.where(m1, inv, jnp.maximum(closed, 0.0))
    m2 = m1 | (closed > 0.0)
    # fill remaining small holes with a wider dilation
    wide, m3 = dilate_masked(inv, m2, 7)
    inv = jnp.where(m2, inv, wide)
    m_all = m2 | m3
    # median to kill speckle, then blur to smooth
    inv = median_blur_approx(inv, 3)
    if cfg.blur_type == "gaussian":
        inv = gauss_blur5(inv)
    else:
        # bilateral-ish: blur but keep strong edges via median guard
        sm = gauss_blur5(inv)
        inv = jnp.where(jnp.abs(sm - inv) < 2.0, sm, inv)
    depth_out = jnp.where(m_all & (inv > 0), dmax - inv, 0.0)
    return depth_out, m_all & (inv > 0)


def backproject_colored(depth: jax.Array, mask: jax.Array, image: jax.Array,
                        cam: CameraModel, cfg: MappingConfig,
                        stride: int = 2):
    """Completed depth + RGB/gray image → colored camera-frame points.

    Subsamples by `stride` to bound the points-per-frame (reference crops by
    FoV/height instead, Map_Builder.cc:275-312).  Returns (pts (P,3),
    colors (P,3), valid (P,)).
    """
    H, W = depth.shape
    vv, uu = jnp.meshgrid(jnp.arange(0, H, stride), jnp.arange(0, W, stride),
                          indexing="ij")
    uv = jnp.stack([uu.astype(jnp.float32) + 0.5,
                    vv.astype(jnp.float32) + 0.5], -1).reshape(-1, 2)
    z = depth[vv, uu].reshape(-1)
    ok = mask[vv, uu].reshape(-1) & (z > cfg.depth_min) & (z < cfg.depth_max)
    rays = cam.lift_projective(uv)
    pts = rays * (z / jnp.maximum(rays[..., 2], 1e-6))[:, None]
    if image.ndim == 2:
        g = image[vv, uu].reshape(-1)
        colors = jnp.stack([g, g, g], -1)
    else:
        colors = image[vv, uu].reshape(-1, 3)
    return pts, colors, ok
