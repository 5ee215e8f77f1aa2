"""Stereo support: right-image tracking pass + disparity→depth.

Parity with the reference's stereo pieces: `FeatureTracker::trackImage`'s
optional right-image pass (`FeatureTracker.cc:305-347`, enabled by the
`stereo:` config flag) and `StereoModel::projectDisparityTo3d`
(`src/image_process/CameraModel.cc:16-54`, the OpenCV Q-matrix).  Stereo
depths give features metric depth immediately — no multi-view triangulation
delay — which the window solver consumes as a strong inverse-depth init.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.ops.image import build_pyramid, scharr_gradients
from lmono_tpu.ops.lk import track_pyramid


class StereoModel(NamedTuple):
    """Rectified stereo rig: fx/fy/cx/cy of the left camera + baseline."""

    fx: float
    fy: float
    cx: float
    cy: float
    baseline: float   # meters (Tx)

    def disparity_to_depth(self, disparity: jax.Array) -> jax.Array:
        """z = fx·B / d (projectDisparityTo3d's z row)."""
        return self.fx * self.baseline / jnp.maximum(disparity, 1e-6)

    def disparity_to_3d(self, uv: jax.Array, disparity: jax.Array) -> jax.Array:
        """Pixels + disparity → left-camera 3D points (Q-matrix semantics)."""
        z = self.disparity_to_depth(disparity)
        x = (uv[..., 0] - self.cx) / self.fx * z
        y = (uv[..., 1] - self.cy) / self.fy * z
        return jnp.stack([x, y, z], axis=-1)


def stereo_match(left_pyr, left_grads, right_image, uv_left: jax.Array,
                 alive: jax.Array, patch: int = 21, iters: int = 10,
                 max_vertical_err: float = 1.5,
                 levels: int = 3):
    """Track left-image features into the right image (LK along the
    epipolar line for a rectified pair) and return disparities.

    Returns (disparity (N,), ok (N,)).
    """
    right_pyr = build_pyramid(right_image, levels)
    right_grads = [scharr_gradients(p) for p in right_pyr]
    uv_r, ok = track_pyramid(left_pyr[:levels], left_grads[:levels],
                             right_pyr, uv_left, alive, patch, iters, 0.01)
    disparity = uv_left[:, 0] - uv_r[:, 0]
    vert = jnp.abs(uv_r[:, 1] - uv_left[:, 1])
    ok = ok & (disparity > 0.1) & (vert < max_vertical_err)
    return disparity, ok
