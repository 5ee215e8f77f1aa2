"""End-to-end exercise of the shipped KITTI entry point (VERDICT r2 #6).

Builds a complete synthetic dataset in KITTI odometry layout — velodyne
.bin scans, image_0 PNGs rendered through the same calibration written to
calib.txt, ground-truth poses, times.txt — and drives
`examples/run_kitti.py::main` through the native loader → SlamSystem →
ATE/RPE/KITTI-drift outputs.  Replaces the reference's manual
rosbag-replay validation flow (`/root/reference/README.md:46-66`).
"""

import os
import sys

import numpy as np
import pytest

import jax

from lmono_tpu.config import synthetic_config
from lmono_tpu.eval.ate import ate_rmse
from lmono_tpu.io import synthetic as syn
from lmono_tpu.utils.lie import Pose

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples"))


def make_full_kitti_tree(root: str, n_frames: int, cfg):
    """KITTI tree with scans AND rendered image_0 PNGs + matching calib."""
    from PIL import Image

    seq = os.path.join(root, "sequences", "00")
    velo = os.path.join(seq, "velodyne")
    imgd = os.path.join(seq, "image_0")
    os.makedirs(velo, exist_ok=True)
    os.makedirs(imgd, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)

    scene = syn.make_city_scene()
    traj = syn.circuit_trajectory(n_frames)
    T_CL = syn.synthetic_T_CL()
    cc = cfg.camera
    mats = []
    for i in range(n_frames):
        pose = Pose(traj.t[i], traj.q[i])
        scan = syn.simulate_lidar(scene, pose, cfg.lidar, noise_std=0.005,
                                  key=jax.random.PRNGKey(i))
        pts = np.asarray(scan["points"]).reshape(-1, 3)
        ok = np.asarray(scan["valid"]).reshape(-1)
        xyz = pts[ok]
        inten = np.zeros((len(xyz), 1), np.float32)
        np.concatenate([xyz, inten], 1).astype(np.float32).tofile(
            os.path.join(velo, f"{i:06d}.bin"))
        img = np.asarray(syn.render_camera(
            scene, pose.compose(T_CL.inverse()), cc))
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(imgd, f"{i:06d}.png"))
        mats.append(np.asarray(pose.to_mat4())[:3].reshape(-1))
    np.savetxt(os.path.join(root, "poses", "00.txt"), np.stack(mats))

    Tr = np.asarray(T_CL.to_mat4())[:3].reshape(-1)
    with open(os.path.join(seq, "calib.txt"), "w") as f:
        P = (f"{cc.fx:.6e} 0 {cc.cx:.6e} 0 "
             f"0 {cc.fy:.6e} {cc.cy:.6e} 0 0 0 1 0")
        for k in ("P0", "P1", "P2", "P3"):
            f.write(f"{k}: {P}\n")
        f.write("Tr: " + " ".join(f"{v:.9e}" for v in Tr) + "\n")
    with open(os.path.join(seq, "times.txt"), "w") as f:
        for i in range(n_frames):
            f.write(f"{i * 0.1:.6f}\n")
    return root


@pytest.mark.slow
def test_run_kitti_entry_point(tmp_path):
    cfg = synthetic_config()
    n = 14
    root = make_full_kitti_tree(str(tmp_path / "kitti"), n, cfg)
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)
    ply = os.path.join(out_dir, "map.ply")

    import run_kitti

    run_kitti.main([
        "--root", root, "--seq", "0", "--frames", str(n),
        "--rings", str(cfg.lidar.num_rings),
        "--horiz-res", str(cfg.lidar.horiz_res),
        "--out", out_dir, "--ply", ply,
    ])

    tum = np.loadtxt(os.path.join(out_dir, "kitti00_fused.txt"))
    assert tum.shape == (n, 8)
    kitti_out = np.loadtxt(os.path.join(out_dir, "kitti00_fused_kitti.txt"))
    assert kitti_out.shape == (n, 12)
    assert os.path.exists(ply) and os.path.getsize(ply) > 1000

    # trajectory quality against the tree's ground truth
    gt_raw = np.loadtxt(os.path.join(root, "poses", "00.txt")).reshape(
        -1, 3, 4)
    gt_t = gt_raw[:, :, 3].astype(np.float32)
    est_t = tum[:, 1:4].astype(np.float32)
    # TUM rows are already in frame order; compare aligned positions
    import jax.numpy as jnp

    from lmono_tpu.utils.lie import quat_normalize

    est = Pose(jnp.asarray(est_t),
               quat_normalize(jnp.asarray(
                   np.roll(tum[:, 4:8], 1, axis=1).astype(np.float32))))
    gt = Pose(jnp.asarray(gt_t), jnp.tile(
        jnp.asarray([1.0, 0, 0, 0], jnp.float32), (n, 1)))
    err = float(ate_rmse(est, gt, align=True))
    assert err < 0.3, f"run_kitti ATE {err}"


def test_per_sequence_configs(tmp_path):
    """`ds.system_config()` must reproduce every knob the reference's
    00–08 YAML set varies (VERDICT r2 #10): per-sequence calib from
    calib.txt + the estimator/tracker deltas of `kitti_config_{seq}.yaml`."""
    from lmono_tpu.config import kitti_config
    from lmono_tpu.io.kitti import KittiSequence

    cfg = synthetic_config()
    lidar = cfg.lidar
    # three sequences with DIFFERENT calibrations (like KITTI 00/03/04)
    calibs = {
        0: (718.856, 607.1928, 185.2157),
        3: (721.5377, 609.5593, 172.8540),
        4: (707.0912, 601.8873, 183.1104),
    }
    root = str(tmp_path)
    for s, (fx, cx, cy) in calibs.items():
        seq = os.path.join(root, "sequences", f"{s:02d}")
        os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
        with open(os.path.join(seq, "calib.txt"), "w") as f:
            f.write(f"P0: {fx} 0 {cx} 0 0 {fx} {cy} 0 0 0 1 0\n")
            f.write("Tr: " + " ".join(
                str(v) for v in np.eye(3, 4).reshape(-1)) + "\n")

    for s, (fx, cx, cy) in calibs.items():
        ds = KittiSequence(root, s, lidar)
        sc = ds.system_config()
        # calib comes from THIS sequence's calib.txt
        assert abs(sc.camera.fx - fx) < 1e-6
        assert abs(sc.camera.cx - cx) < 1e-6
        assert abs(sc.camera.cy - cy) < 1e-6
        # knob deltas come from the reference's per-sequence YAML diffs
        ref = kitti_config(s)
        assert sc.tracker.max_features == ref.tracker.max_features
        assert sc.estimator.factor_weight == ref.estimator.factor_weight
        assert sc.estimator.laser_w == ref.estimator.laser_w
        assert sc.estimator.fine_times == ref.estimator.fine_times
        assert sc.estimator.min_track_cnt == ref.estimator.min_track_cnt

    # the deltas themselves mirror the reference YAML set
    assert kitti_config(1).estimator.factor_weight == 1500.0
    assert kitti_config(2).estimator.estimate_laser == 2
    assert kitti_config(3).estimator.laser_w == 3.0
    assert kitti_config(4).tracker.f_threshold == pytest.approx(0.8)
    assert kitti_config(5).tracker.max_features == 180
    assert kitti_config(5).estimator.min_track_cnt == 3
    assert kitti_config(8).estimator.fine_times == 2
