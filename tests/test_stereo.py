"""Stereo tests: disparity→3D roundtrip and LK stereo matching on a
synthetic rectified pair."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.config import synthetic_config
from lmono_tpu.estimator.stereo import StereoModel, stereo_match
from lmono_tpu.io import synthetic as syn
from lmono_tpu.ops.corners import detect_grid
from lmono_tpu.ops.image import build_pyramid, scharr_gradients
from lmono_tpu.utils.lie import Pose

CFG = synthetic_config()


def test_disparity_to_3d_roundtrip():
    sm = StereoModel(fx=256.0, fy=256.0, cx=256.0, cy=128.0, baseline=0.54)
    P = jnp.array([[1.0, 0.5, 10.0], [-2.0, 1.0, 25.0]])
    u = sm.fx * P[:, 0] / P[:, 2] + sm.cx
    v = sm.fy * P[:, 1] / P[:, 2] + sm.cy
    disp = sm.fx * sm.baseline / P[:, 2]
    P2 = sm.disparity_to_3d(jnp.stack([u, v], -1), disp)
    np.testing.assert_allclose(np.asarray(P2), np.asarray(P), rtol=1e-5)


def test_stereo_match_on_rendered_pair():
    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(2)
    T_CL = syn.synthetic_T_CL()
    baseline = 0.54
    cc = CFG.camera
    pose_l = Pose(traj.t[0], traj.q[0]).compose(T_CL.inverse())
    # right camera: shifted along camera +x (rectified pair)
    from lmono_tpu.utils.lie import quat_rotate
    offset = quat_rotate(pose_l.q, jnp.array([baseline, 0.0, 0.0]))
    pose_r = Pose(pose_l.t + offset, pose_l.q)
    img_l = syn.render_camera(scene, pose_l, cc)
    img_r = syn.render_camera(scene, pose_r, cc)

    uv, ok = detect_grid(img_l, 16, 64, jnp.zeros((1, 2)), jnp.zeros(1, bool))
    pyr = build_pyramid(img_l, 3)
    grads = [scharr_gradients(p) for p in pyr]
    disp, dok = stereo_match(pyr, grads, img_r, uv, ok)
    dok = np.asarray(dok)
    assert dok.sum() > 15, f"too few stereo matches: {dok.sum()}"

    # validate depths against exact ray-cast ranges
    sm = StereoModel(cc.fx, cc.fy, cc.cx, cc.cy, baseline)
    z_est = np.asarray(sm.disparity_to_depth(disp))[dok]
    rays = jnp.concatenate([
        (uv[:, :1] - cc.cx) / cc.fx, (uv[:, 1:] - cc.cy) / cc.fy,
        jnp.ones_like(uv[:, :1])], -1)
    rays = rays / jnp.linalg.norm(rays, axis=-1, keepdims=True)
    rays_w = quat_rotate(pose_l.q[None], rays)
    t_hit = syn.ray_cast(scene, jnp.broadcast_to(pose_l.t, rays_w.shape),
                         rays_w)
    z_true = np.asarray(t_hit * rays[:, 2])[dok]
    rel = np.abs(z_est - z_true) / np.maximum(z_true, 1.0)
    good = z_true < 40.0
    assert good.sum() > 5
    assert np.median(rel[good]) < 0.08, np.median(rel[good])
