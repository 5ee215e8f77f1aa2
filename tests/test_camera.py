"""Camera model tests: project/lift roundtrips for all five models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmono_tpu.camera import (
    camera_from_config,
    camera_from_dict,
    equidistant_camera,
    mei_camera,
    pinhole_camera,
    pinhole_full_camera,
    scaramuzza_camera,
)
from lmono_tpu.config import CameraConfig


def _rand_points(key, n=64, fov=0.5):
    """Random camera-frame points in front of the camera within ~fov rad."""
    xy = fov * jax.random.uniform(key, (n, 2), minval=-1.0, maxval=1.0)
    z = jax.random.uniform(jax.random.PRNGKey(99), (n, 1), minval=2.0, maxval=30.0)
    return jnp.concatenate([xy * z, z], axis=-1)


def _roundtrip(cam, pts, atol_px=0.05):
    uv = cam.space_to_plane(pts)
    rays = cam.lift_projective(uv)
    # rays should be parallel to pts
    pn = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    dots = jnp.sum(rays * pn, axis=-1)
    np.testing.assert_allclose(np.asarray(dots), 1.0, atol=1e-4)
    # and reprojection must return the same pixel
    uv2 = cam.space_to_plane(rays)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=atol_px)


def test_pinhole_roundtrip():
    cam = pinhole_camera(1241, 376, 718.856, 718.856, 607.19, 185.22,
                         k1=-0.1, k2=0.01, p1=1e-4, p2=-2e-4)
    _roundtrip(cam, _rand_points(jax.random.PRNGKey(0), fov=0.4))


def test_pinhole_known_projection():
    cam = pinhole_camera(640, 480, 500.0, 500.0, 320.0, 240.0)
    uv = cam.space_to_plane(jnp.array([[0.0, 0.0, 5.0], [1.0, 0.0, 5.0]]))
    np.testing.assert_allclose(np.asarray(uv), [[320, 240], [420, 240]],
                               atol=1e-3)


def test_pinhole_full_roundtrip():
    cam = pinhole_full_camera(1280, 720, 600.0, 600.0, 640.0, 360.0,
                              k1=-0.2, k2=0.05, k3=-0.01, k4=-0.15,
                              k5=0.03, k6=-0.005, p1=1e-4, p2=1e-4)
    _roundtrip(cam, _rand_points(jax.random.PRNGKey(1), fov=0.4))


def test_mei_roundtrip():
    cam = mei_camera(752, 480, 370.0, 369.0, 376.0, 240.0, xi=0.9,
                     k1=-0.05, k2=0.005)
    _roundtrip(cam, _rand_points(jax.random.PRNGKey(2), fov=0.6), atol_px=0.1)


def test_equidistant_roundtrip():
    cam = equidistant_camera(752, 480, 350.0, 350.0, 376.0, 240.0,
                             k2=0.01, k3=-0.002, k4=0.0005, k5=0.0)
    _roundtrip(cam, _rand_points(jax.random.PRNGKey(3), fov=0.8), atol_px=0.1)


def test_scaramuzza_roundtrip():
    # simple OCAM poly: z = a0 + a2 rho^2 (fisheye-like)
    poly = [-250.0, 0.0, 0.002]
    cam = scaramuzza_camera(752, 480, poly, 376.0, 240.0,
                            c=1.0, d=0.001, e=-0.001)
    pts = _rand_points(jax.random.PRNGKey(4), fov=0.5)
    uv = cam.space_to_plane(pts)
    rays = cam.lift_projective(uv)
    pn = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    dots = jnp.sum(rays * pn, axis=-1)
    np.testing.assert_allclose(np.asarray(dots), 1.0, atol=1e-3)


def test_factory_dict_kitti():
    cam = camera_from_dict({
        "model_type": "PINHOLE",
        "image_width": 1241, "image_height": 376,
        "projection_parameters": {"fx": 718.856, "fy": 718.856,
                                  "cx": 607.1928, "cy": 185.2157},
        "distortion_parameters": {"k1": 0.0, "k2": 0.0, "p1": 0.0, "p2": 0.0},
    })
    assert cam.name == "pinhole" and cam.width == 1241


def test_factory_from_config():
    cam = camera_from_config(CameraConfig())
    uv = cam.space_to_plane(jnp.array([0.0, 0.0, 10.0]))
    np.testing.assert_allclose(np.asarray(uv), [607.1928, 185.2157], atol=1e-3)


def test_in_image_and_undist():
    cam = pinhole_camera(640, 480, 500.0, 500.0, 320.0, 240.0, k1=-0.1)
    assert bool(cam.in_image(jnp.array([10.0, 10.0])))
    assert not bool(cam.in_image(jnp.array([-1.0, 10.0])))
    uv = cam.undist_to_plane(jnp.array([0.1, -0.05]))
    assert uv.shape == (2,)


def test_projection_differentiable():
    cam = pinhole_camera(640, 480, 500.0, 500.0, 320.0, 240.0, k1=-0.1)
    g = jax.grad(lambda P: jnp.sum(cam.space_to_plane(P)))(
        jnp.array([1.0, 2.0, 10.0]))
    assert np.all(np.isfinite(np.asarray(g)))
