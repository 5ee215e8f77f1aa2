"""Sanity checks on the synthetic world simulator."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.config import synthetic_config
from lmono_tpu.io import synthetic as syn
from lmono_tpu.utils.lie import Pose


CFG = synthetic_config()


def test_lidar_hits_ground_and_buildings():
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(4)
    pose = Pose(traj.t[0], traj.q[0])
    scan = syn.simulate_lidar(scene, pose, CFG.lidar, noise_std=0.0)
    valid = np.asarray(scan["valid"])
    assert valid.mean() > 0.3, f"too few returns: {valid.mean()}"
    # downward rays must hit the ground near the sensor
    ranges = np.asarray(scan["ranges"])
    bottom = ranges[-1][valid[-1]]
    assert bottom.size > 0 and bottom.max() < CFG.lidar.max_range


def test_lidar_points_consistent_with_ranges():
    scene = syn.make_city_scene()
    pose = Pose(jnp.array([30.0, 0.0, 1.7]), jnp.array([1.0, 0, 0, 0]))
    scan = syn.simulate_lidar(scene, pose, CFG.lidar, noise_std=0.0)
    pts = np.asarray(scan["points"])
    r = np.linalg.norm(pts, axis=-1)
    np.testing.assert_allclose(r, np.asarray(scan["ranges"]), atol=1e-3)


def test_camera_renders_structure():
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(2)
    T_CL = syn.synthetic_T_CL()
    pose_wl = Pose(traj.t[0], traj.q[0])
    pose_wc = pose_wl.compose(T_CL.inverse())
    img = syn.render_camera(scene, pose_wc, CFG.camera)
    img = np.asarray(img)
    assert img.shape == (CFG.camera.height, CFG.camera.width)
    assert 0.0 <= img.min() and img.max() <= 1.0
    # images must have texture (std) for KLT to work
    assert img.std() > 0.05


def test_render_viewpoint_consistency():
    """A world point projected in two nearby views must have nearly the
    same intensity (the property KLT tracking relies on)."""
    scene = syn.make_city_scene()
    # intensity is a function of the world hit point only
    p = jnp.array([[10.0, 25.0, 2.0], [-5.0, 30.0, 1.0]])
    i1 = syn.world_intensity(p)
    i2 = syn.world_intensity(p + 1e-4)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), atol=1e-2)


def test_trajectory_smooth():
    traj = syn.circuit_trajectory(100)
    steps = np.linalg.norm(np.diff(np.asarray(traj.t), axis=0), axis=1)
    assert steps.max() < 2.0 and steps.min() > 0.1
