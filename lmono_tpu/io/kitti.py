"""KITTI odometry dataset loaders (velodyne .bin, images, calib, poses).

Replaces the reference's rosbag + A-LOAM `kitti_helper` ingestion
(`/root/reference/README.md:46-66`): instead of replaying bags through ROS
topics, frames are read straight from the KITTI odometry layout:

    <root>/sequences/<seq>/velodyne/000000.bin   (Nx4 float32 x,y,z,intensity)
    <root>/sequences/<seq>/image_0/000000.png    (grayscale left)
    <root>/sequences/<seq>/calib.txt             (P0..P3, Tr)
    <root>/sequences/<seq>/times.txt
    <root>/poses/<seq>.txt                       (ground truth, 3x4 row-major)

Scans are re-gridded into the fixed (rings, horiz_res) range-image layout the
rest of the engine consumes (`lmono_tpu.lidar.features`), with ring indices
recovered from the HDL-64 elevation model.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import numpy as np

from lmono_tpu.config import LidarConfig
from lmono_tpu.utils.lie import Pose

try:  # optional: PNG decoding; torch is baked into the image (CPU build)
    from PIL import Image  # type: ignore

    def _read_png(path):
        return np.asarray(Image.open(path), dtype=np.float32) / 255.0
except Exception:  # pragma: no cover
    try:
        import torchvision.io as tvio  # type: ignore

        def _read_png(path):
            img = tvio.read_image(path).numpy()
            return img[0].astype(np.float32) / 255.0
    except Exception:
        _read_png = None


def read_velodyne_bin(path: str) -> np.ndarray:
    """Raw Nx4 (x, y, z, intensity) float32 point cloud."""
    return np.fromfile(path, dtype=np.float32).reshape(-1, 4)


def scan_to_range_image(xyz: np.ndarray, cfg: LidarConfig) -> dict:
    """Project a raw scan into the fixed (rings, W) grid (numpy, host-side).

    Ring index from elevation angle (uniform model over the vertical FoV);
    column from azimuth.  Nearest point wins per cell.
    """
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    r = np.sqrt(x * x + y * y + z * z)
    ok = (r > cfg.min_range) & (r < cfg.max_range)
    x, y, z, r = x[ok], y[ok], z[ok], r[ok]
    elev = np.arcsin(np.clip(z / np.maximum(r, 1e-6), -1, 1))
    lo, hi = np.deg2rad(cfg.vertical_fov_deg[0]), np.deg2rad(cfg.vertical_fov_deg[1])
    ring = np.round((hi - elev) / (hi - lo) * (cfg.num_rings - 1)).astype(np.int64)
    azim = np.arctan2(y, x)
    # centered binning (round, not floor): cell k is centered on the ray
    # grid's azimuth_k, so exact grid points survive the atan2 roundtrip
    col = np.round((azim + np.pi) / (2 * np.pi) * cfg.horiz_res).astype(
        np.int64) % cfg.horiz_res
    keep = (ring >= 0) & (ring < cfg.num_rings)
    ring, col, r = ring[keep], col[keep], r[keep]
    pts = np.stack([x[keep], y[keep], z[keep]], -1)

    ranges = np.zeros((cfg.num_rings, cfg.horiz_res), np.float32)
    points = np.zeros((cfg.num_rings, cfg.horiz_res, 3), np.float32)
    # nearest point per cell: sort by descending range so closest writes last
    order = np.argsort(-r)
    ri, ci, rr, pp = ring[order], col[order], r[order], pts[order]
    ranges[ri, ci] = rr
    points[ri, ci] = pp
    valid = ranges > 0
    return {"ranges": ranges, "points": points, "valid": valid}


def read_calib(path: str) -> dict:
    """Parse calib.txt → dict of 3x4 matrices (P0..P3, Tr)."""
    out = {}
    with open(path) as f:
        for line in f:
            if ":" not in line:
                continue
            k, v = line.split(":", 1)
            vals = np.array([float(t) for t in v.split()], np.float64)
            out[k.strip()] = vals.reshape(3, 4)
    return out


def read_poses(path: str) -> Pose:
    """KITTI ground-truth poses file → batched Pose (camera-0 frame)."""
    data = np.loadtxt(path).reshape(-1, 3, 4)
    mats = np.concatenate(
        [data, np.tile(np.array([[[0, 0, 0, 1.0]]]), (len(data), 1, 1))], axis=1)
    import jax.numpy as jnp
    return Pose.from_mat4(jnp.asarray(mats, jnp.float32))


class KittiSequence:
    """Frame iterator over one KITTI odometry sequence."""

    def __init__(self, root: str, sequence: int, cfg: Optional[LidarConfig] = None):
        self.cfg = cfg or LidarConfig()
        seq = f"{sequence:02d}"
        self.seq_dir = os.path.join(root, "sequences", seq)
        self.velo_dir = os.path.join(self.seq_dir, "velodyne")
        self.img_dir = os.path.join(self.seq_dir, "image_0")
        self.calib = read_calib(os.path.join(self.seq_dir, "calib.txt"))
        times_path = os.path.join(self.seq_dir, "times.txt")
        self.times = (np.loadtxt(times_path).astype(np.float64)
                      if os.path.exists(times_path) else None)
        pose_path = os.path.join(root, "poses", seq + ".txt")
        self.gt_poses = read_poses(pose_path) if os.path.exists(pose_path) else None
        self.n_frames = len(
            [f for f in os.listdir(self.velo_dir) if f.endswith(".bin")]
        ) if os.path.isdir(self.velo_dir) else 0

    def image(self, i: int):
        """Grayscale left image (H, W) in [0,1], or None if unavailable."""
        img_path = os.path.join(self.img_dir, f"{i:06d}.png")
        if _read_png is not None and os.path.exists(img_path):
            return _read_png(img_path)
        return None

    def time(self, i: int) -> float:
        return float(self.times[i]) if self.times is not None else i * 0.1

    def frame(self, i: int) -> dict:
        scan = scan_to_range_image(
            read_velodyne_bin(os.path.join(self.velo_dir, f"{i:06d}.bin"))[:, :3],
            self.cfg,
        )
        out = {"index": i, "scan": scan,
               "time": float(self.times[i]) if self.times is not None else i * 0.1}
        img_path = os.path.join(self.img_dir, f"{i:06d}.png")
        if _read_png is not None and os.path.exists(img_path):
            out["image"] = _read_png(img_path)
        return out

    def __len__(self) -> int:
        return self.n_frames

    def __iter__(self) -> Iterator[dict]:
        for i in range(self.n_frames):
            yield self.frame(i)
