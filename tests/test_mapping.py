"""Dense mapping tests: projection, depth completion, colored accumulation,
PLY export — validated against the simulator's exact depth."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.camera import pinhole_camera
from lmono_tpu.config import synthetic_config
from lmono_tpu.io import synthetic as syn
from lmono_tpu.mapping import MapBuilder, complete_depth, project_cloud, save_ply
from lmono_tpu.mapping.builder import ColorMap, colormap_update
from lmono_tpu.utils.lie import Pose

CFG = synthetic_config()
SCENE = syn.make_city_scene()
CAM = pinhole_camera(CFG.camera.width, CFG.camera.height, CFG.camera.fx,
                     CFG.camera.fy, CFG.camera.cx, CFG.camera.cy)


def setup_frame(i=0):
    traj = syn.circuit_trajectory(4)
    T_CL = syn.synthetic_T_CL()
    pose_wl = Pose(traj.t[i], traj.q[i])
    scan = syn.simulate_lidar(SCENE, pose_wl, CFG.lidar, noise_std=0.0)
    img = syn.render_camera(SCENE, pose_wl.compose(T_CL.inverse()),
                            CFG.camera, rgb=True)
    return pose_wl, T_CL, scan, img


def test_project_cloud_matches_render_depth():
    pose_wl, T_CL, scan, _ = setup_frame()
    pts_l = scan["points"].reshape(-1, 3)
    ok = scan["valid"].reshape(-1)
    depth, mask = project_cloud(T_CL.apply(pts_l), ok, CAM,
                                CFG.mapping.depth_min, CFG.mapping.depth_max)
    m = np.asarray(mask)
    assert m.mean() > 0.01, "no LiDAR points project into the image"
    # compare against exact ray-cast depth at those pixels
    H, W = depth.shape
    vv, uu = np.nonzero(m)
    pose_wc = pose_wl.compose(T_CL.inverse())
    uv = jnp.stack([jnp.asarray(uu, jnp.float32) + 0.0,
                    jnp.asarray(vv, jnp.float32) + 0.0], -1)
    rays_c = CAM.lift_projective(uv)
    from lmono_tpu.utils.lie import quat_rotate
    rays_w = quat_rotate(pose_wc.q[None], rays_c)
    t_hit = syn.ray_cast(SCENE, jnp.broadcast_to(pose_wc.t, rays_w.shape),
                         rays_w)
    z_true = np.asarray(t_hit * rays_c[:, 2])
    z_proj = np.asarray(depth)[vv, uu]
    rel = np.abs(z_proj - z_true) / np.maximum(z_true, 1.0)
    # most pixels agree; discretization causes some boundary mismatches
    assert np.percentile(rel[z_true < 1e6], 80) < 0.05


def test_complete_depth_fills_holes():
    pose_wl, T_CL, scan, _ = setup_frame()
    pts_l = scan["points"].reshape(-1, 3)
    ok = scan["valid"].reshape(-1)
    depth, mask = project_cloud(T_CL.apply(pts_l), ok, CAM,
                                CFG.mapping.depth_min, CFG.mapping.depth_max)
    filled, fmask = complete_depth(depth, mask, CFG.mapping)
    assert float(fmask.mean()) > 2.0 * float(mask.mean())
    # completion must preserve measured depths approximately
    both = np.asarray(mask & fmask)
    d0 = np.asarray(depth)[both]
    d1 = np.asarray(filled)[both]
    assert np.median(np.abs(d0 - d1)) < 1.0


def test_colormap_dedup_and_capacity():
    cm = ColorMap.empty(8)
    pts = jnp.array([[0.1, 0.1, 0.1], [0.12, 0.1, 0.1], [3.0, 0, 0]])
    cols = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    cm = colormap_update(cm, pts, cols, jnp.ones(3, bool), 0.5, jnp.zeros(3))
    assert int(cm.mask.sum()) == 2
    # first point wins the voxel, keeps its color
    np.testing.assert_allclose(np.asarray(cm.colors[0]), [1.0, 0, 0])


def test_map_builder_end_to_end(tmp_path):
    builder = MapBuilder(CAM, CFG.mapping)
    for i in range(2):
        pose_wl, T_CL, scan, img = setup_frame(i)
        out = builder.process(scan["points"].reshape(-1, 3),
                              scan["valid"].reshape(-1), img, T_CL,
                              pose_wl.compose(T_CL.inverse()))
    assert out["n_points"] > 1000, f"map too sparse: {out['n_points']}"
    ply = os.path.join(tmp_path, "map.ply")
    n = builder.save_ply(ply)
    assert n == out["n_points"]
    with open(ply, "rb") as f:
        head = f.read(200).decode("latin1")
    assert "ply" in head and f"element vertex {n}" in head


def test_colormap_update_hash_dedup_and_occupancy():
    from lmono_tpu.mapping.builder import colormap_update_hash

    cm = ColorMap.empty(1024)
    pts = jnp.array([[0.0, 0.0, 0.0], [10.0, 0.0, 0.0], [0.01, 0.0, 0.0]])
    cols = jnp.array([[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]])
    cm = colormap_update_hash(cm, pts, cols, jnp.ones(3, bool), 0.5)
    # two distinct voxels occupied (points 0 and 2 share a 0.5 m voxel)
    assert int(jnp.sum(cm.mask)) == 2
    # existing points win their voxel: re-inserting with new colors is a no-op
    cm2 = colormap_update_hash(cm, pts, 1.0 - cols, jnp.ones(3, bool), 0.5)
    assert int(jnp.sum(cm2.mask)) == 2
    got = {tuple(c) for c in np.asarray(cm2.colors[cm2.mask])}
    assert (0.0, 1.0, 0.0) in got           # the isolated voxel
    # shared voxel: either in-frame writer may win, but never the re-insert
    assert got & {(1.0, 0.0, 0.0), (0.0, 0.0, 1.0)}
