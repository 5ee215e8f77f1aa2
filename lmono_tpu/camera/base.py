"""Camera model API: batched, differentiable, jit-safe.

Functional rebuild of the reference's camodocal `Camera` class hierarchy
(`camera_models/include/camodocal/camera_models/Camera.h:45-113`): the same
capability surface — `space_to_plane` (3D→pixel), `lift_projective`
(pixel→unit ray), undistortion — expressed as pure functions over parameter
pytrees instead of C++ virtual classes, so every model vmaps over points and
works under jax transforms (the calibration optimizer differentiates straight
through `space_to_plane`).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True, eq=False)  # identity hash: usable as a
class CameraModel:                             # static jit argument
    """A camera model = parameter pytree + pure projection functions.

    space_to_plane(params, P):  (...,3) camera-frame points → (...,2) pixels
    lift_projective(params, uv): (...,2) pixels → (...,3) unit rays
    """

    name: str
    params: dict
    width: int
    height: int
    _space_to_plane: Callable
    _lift_projective: Callable

    def space_to_plane(self, P: jax.Array) -> jax.Array:
        return self._space_to_plane(self.params, P)

    def lift_projective(self, uv: jax.Array) -> jax.Array:
        return self._lift_projective(self.params, uv)

    def lift_to_normalized(self, uv: jax.Array) -> jax.Array:
        """Pixels → normalized image-plane coords (x/z, y/z)."""
        ray = self.lift_projective(uv)
        return ray[..., :2] / jnp.maximum(ray[..., 2:3], 1e-9)

    def undist_to_plane(self, xy_norm: jax.Array) -> jax.Array:
        """Normalized undistorted coords → distorted pixel coords
        (camodocal `Camera::undistToPlane` semantics)."""
        P = jnp.concatenate([xy_norm, jnp.ones_like(xy_norm[..., :1])], -1)
        return self.space_to_plane(P)

    def in_image(self, uv: jax.Array, margin: float = 0.0) -> jax.Array:
        return ((uv[..., 0] >= margin) & (uv[..., 0] < self.width - margin)
                & (uv[..., 1] >= margin) & (uv[..., 1] < self.height - margin))


def _iterative_undistort(distort_fn, xy_d: jax.Array, iters: int = 8):
    """Fixed-point inversion x_u ≈ x_d − D(x_u), as camodocal's recursive
    undistortion does (`PinholeCamera.cc` liftProjective loop)."""
    x = xy_d

    def body(_, x):
        return xy_d - distort_fn(x)

    return jax.lax.fori_loop(0, iters, body, x)
