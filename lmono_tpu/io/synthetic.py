"""Deterministic synthetic world simulator: ray-cast LiDAR + rendered camera.

The reference system is validated only end-to-end on KITTI rosbags
(`SURVEY.md` §4); this container has no KITTI data, so the test pyramid and
benchmarks are driven by an analytic world instead: axis-aligned building
boxes + vertical poles + ground plane, ray-cast exactly for both the LiDAR
(per-ring range image) and the camera (procedurally textured grayscale
renders that are viewpoint-consistent, so KLT tracking/triangulation/PnP
behave physically).  Ground-truth trajectory comes from the path generator,
giving exact ATE for every pipeline stage.

Everything is pure JAX and jit-safe; scenes are fixed-shape arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.config import CameraConfig, LidarConfig
from lmono_tpu.utils.lie import Pose, quat_rotate, so3_exp_quat

_BIG = 1e9


class Scene(NamedTuple):
    """Axis-aligned world geometry (fixed shapes; mask via validity flags)."""

    box_min: jax.Array      # (B, 3) lower corners
    box_max: jax.Array      # (B, 3) upper corners
    box_valid: jax.Array    # (B,) bool
    cyl_center: jax.Array   # (C, 2) x,y of vertical poles
    cyl_radius: jax.Array   # (C,)
    cyl_height: jax.Array   # (C,)
    cyl_valid: jax.Array    # (C,) bool
    ground_z: jax.Array     # () scalar


def make_city_scene(key=None, n_blocks: int = 24, n_poles: int = 40,
                    extent: float = 90.0, seed: int = 7) -> Scene:
    """A deterministic 'city block' scene around a central circuit road."""
    rng = np.random.RandomState(seed)
    boxes_min, boxes_max = [], []
    # buildings on a grid, leaving a ring road free around radius ~ 28-40 m
    grid = np.arange(-extent, extent + 1, 30.0)
    for gx in grid:
        for gy in grid:
            r = np.hypot(gx, gy)
            if 22.0 < r < 46.0:   # keep the circuit road clear
                continue
            if r < 8.0:
                continue
            jx, jy = rng.uniform(-4, 4, 2)
            sx, sy = rng.uniform(6, 14, 2)
            sz = rng.uniform(6, 18)
            cx, cy = gx + jx, gy + jy
            boxes_min.append([cx - sx / 2, cy - sy / 2, 0.0])
            boxes_max.append([cx + sx / 2, cy + sy / 2, sz])
    boxes_min = np.array(boxes_min[:n_blocks], np.float32)
    boxes_max = np.array(boxes_max[:n_blocks], np.float32)
    nb = len(boxes_min)
    if nb < n_blocks:
        pad = n_blocks - nb
        boxes_min = np.concatenate([boxes_min, np.zeros((pad, 3), np.float32)])
        boxes_max = np.concatenate([boxes_max, np.zeros((pad, 3), np.float32)])
    box_valid = np.arange(n_blocks) < nb

    # poles along the ring road edges
    ang = rng.uniform(0, 2 * np.pi, n_poles)
    rad = rng.choice([24.0, 43.0], n_poles) + rng.uniform(-1, 1, n_poles)
    cyl_center = np.stack([rad * np.cos(ang), rad * np.sin(ang)], -1).astype(np.float32)
    cyl_radius = rng.uniform(0.1, 0.25, n_poles).astype(np.float32)
    cyl_height = rng.uniform(3.0, 7.0, n_poles).astype(np.float32)

    return Scene(
        box_min=jnp.asarray(boxes_min),
        box_max=jnp.asarray(boxes_max),
        box_valid=jnp.asarray(box_valid),
        cyl_center=jnp.asarray(cyl_center),
        cyl_radius=jnp.asarray(cyl_radius),
        cyl_height=jnp.asarray(cyl_height),
        cyl_valid=jnp.ones(n_poles, bool),
        ground_z=jnp.asarray(0.0, jnp.float32),
    )


# --------------------------------------------------------------------------
# Ray casting
# --------------------------------------------------------------------------

def _ray_ground(o, d, ground_z):
    """Ray-plane z=ground_z. o,d: (...,3). Returns t (...,) (inf if miss)."""
    dz = d[..., 2]
    t = (ground_z - o[..., 2]) / jnp.where(jnp.abs(dz) < 1e-9, 1e-9, dz)
    return jnp.where((t > 1e-3) & (dz < -1e-6), t, _BIG)


def _ray_boxes(o, d, bmin, bmax, valid):
    """Slab-method ray-AABB. o,d: (...,3); boxes (B,3). Returns min t (...)."""
    o = o[..., None, :]
    d = d[..., None, :]
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, 1e-9, d)
    t0 = (bmin - o) * inv
    t1 = (bmax - o) * inv
    tnear = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tfar = jnp.min(jnp.maximum(t0, t1), axis=-1)
    hit = (tnear <= tfar) & (tfar > 1e-3) & valid
    t = jnp.where(tnear > 1e-3, tnear, tfar)   # inside a box → exit face
    return jnp.min(jnp.where(hit, t, _BIG), axis=-1)


def _ray_cyls(o, d, center, radius, height, valid):
    """Vertical finite cylinders. Returns min t (...)."""
    ox = o[..., None, 0] - center[:, 0]
    oy = o[..., None, 1] - center[:, 1]
    dx = d[..., None, 0]
    dy = d[..., None, 1]
    a = dx * dx + dy * dy
    b = 2.0 * (ox * dx + oy * dy)
    c = ox * ox + oy * oy - radius * radius
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    a_safe = jnp.where(a < 1e-12, 1e-12, a)
    t = (-b - sq) / (2 * a_safe)
    z = o[..., None, 2] + t * d[..., None, 2]
    hit = (disc > 0) & (t > 1e-3) & (z > 0.0) & (z < height) & valid
    return jnp.min(jnp.where(hit, t, _BIG), axis=-1)


def ray_cast(scene: Scene, origins: jax.Array, dirs: jax.Array) -> jax.Array:
    """Closest-hit distance for rays (...,3)+(...,3) → (...)."""
    t = jnp.minimum(
        _ray_ground(origins, dirs, scene.ground_z),
        jnp.minimum(
            _ray_boxes(origins, dirs, scene.box_min, scene.box_max,
                       scene.box_valid),
            _ray_cyls(origins, dirs, scene.cyl_center, scene.cyl_radius,
                      scene.cyl_height, scene.cyl_valid),
        ),
    )
    return t


# --------------------------------------------------------------------------
# Procedural intensity texture (viewpoint-consistent; smooth for LK)
# --------------------------------------------------------------------------

def _hash3(ix, iy, iz):
    """Integer lattice hash → [0,1) float, deterministic."""
    h = (ix * 374761393 + iy * 668265263 + iz * 2147483647) & 0x7FFFFFFF
    h = (h ^ (h >> 13)) * 1274126177 & 0x7FFFFFFF
    return ((h ^ (h >> 16)) & 0xFFFF).astype(jnp.float32) / 65535.0


def value_noise3(p: jax.Array) -> jax.Array:
    """Trilinear value noise of 3D points (...,3) → (...), C1-smooth."""
    pf = jnp.floor(p)
    ip = pf.astype(jnp.int32)
    f = p - pf
    f = f * f * (3.0 - 2.0 * f)  # smoothstep

    def corner(dx, dy, dz):
        return _hash3(ip[..., 0] + dx, ip[..., 1] + dy, ip[..., 2] + dz)

    c000, c100 = corner(0, 0, 0), corner(1, 0, 0)
    c010, c110 = corner(0, 1, 0), corner(1, 1, 0)
    c001, c101 = corner(0, 0, 1), corner(1, 0, 1)
    c011, c111 = corner(0, 1, 1), corner(1, 1, 1)
    fx, fy, fz = f[..., 0], f[..., 1], f[..., 2]
    x00 = c000 + fx * (c100 - c000)
    x10 = c010 + fx * (c110 - c010)
    x01 = c001 + fx * (c101 - c001)
    x11 = c011 + fx * (c111 - c011)
    y0 = x00 + fy * (x10 - x00)
    y1 = x01 + fy * (x11 - x01)
    return y0 + fz * (y1 - y0)


def world_intensity(p: jax.Array) -> jax.Array:
    """Multi-octave procedural albedo at world points (...,3) → [0,1]."""
    v = (0.55 * value_noise3(p * 0.9)
         + 0.3 * value_noise3(p * 3.7 + 11.3)
         + 0.15 * value_noise3(p * 13.1 + 71.7))
    return jnp.clip(v, 0.0, 1.0)


def world_color(p: jax.Array) -> jax.Array:
    """Procedural RGB at world points (...,3) → (...,3) in [0,1]."""
    r = world_intensity(p)
    g = world_intensity(p + 101.0)
    b = world_intensity(p + 202.0)
    return jnp.stack([r, g, b], axis=-1)


# --------------------------------------------------------------------------
# Sensors
# --------------------------------------------------------------------------

def lidar_ray_dirs(cfg: LidarConfig) -> jax.Array:
    """Sensor-frame unit ray directions, (rings, horiz_res, 3).

    Sensor frame: x forward, y left, z up (velodyne convention).
    """
    lo, hi = cfg.vertical_fov_deg
    elev = jnp.deg2rad(jnp.linspace(hi, lo, cfg.num_rings))       # top→bottom
    azim = jnp.linspace(-jnp.pi, jnp.pi, cfg.horiz_res, endpoint=False)
    ce, se = jnp.cos(elev)[:, None], jnp.sin(elev)[:, None]
    ca, sa = jnp.cos(azim)[None, :], jnp.sin(azim)[None, :]
    return jnp.stack(
        [ce * ca, ce * sa, jnp.broadcast_to(se, (cfg.num_rings, cfg.horiz_res))],
        axis=-1,
    )


def simulate_lidar(scene: Scene, pose: Pose, cfg: LidarConfig,
                   noise_std: float = 0.01, key=None) -> dict:
    """One LiDAR sweep from world-frame sensor `pose`.

    Returns dict with:
      ranges  (rings, W)   — measured range, 0 where invalid/out of range
      points  (rings, W, 3)— sensor-frame xyz (0 where invalid)
      valid   (rings, W)   — bool
    """
    dirs_s = lidar_ray_dirs(cfg)
    dirs_w = quat_rotate(pose.q[None, None, :], dirs_s)
    origin = jnp.broadcast_to(pose.t, dirs_w.shape)
    t = ray_cast(scene, origin, dirs_w)
    if key is not None and noise_std > 0:
        t = t + noise_std * jax.random.normal(key, t.shape)
    valid = (t > cfg.min_range) & (t < cfg.max_range)
    ranges = jnp.where(valid, t, 0.0)
    points = dirs_s * ranges[..., None]
    return {"ranges": ranges, "points": points, "valid": valid}


def camera_ray_dirs(cam: CameraConfig) -> jax.Array:
    """Camera-frame unit rays per pixel, (H, W, 3). z forward, x right, y down."""
    u = jnp.arange(cam.width, dtype=jnp.float32) + 0.5
    v = jnp.arange(cam.height, dtype=jnp.float32) + 0.5
    x = (u[None, :] - cam.cx) / cam.fx
    y = (v[:, None] - cam.cy) / cam.fy
    x = jnp.broadcast_to(x, (cam.height, cam.width))
    y = jnp.broadcast_to(y, (cam.height, cam.width))
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def render_camera(scene: Scene, pose_wc: Pose, cam: CameraConfig,
                  rgb: bool = False) -> jax.Array:
    """Render grayscale (H,W) [or RGB (H,W,3)] image from camera pose.

    pose_wc: world-from-camera.  Sky (no hit) renders as horizon gradient.
    """
    dirs_c = camera_ray_dirs(cam)
    dirs_w = quat_rotate(pose_wc.q[None, None, :], dirs_c)
    origin = jnp.broadcast_to(pose_wc.t, dirs_w.shape)
    t = ray_cast(scene, origin, dirs_w)
    hit = t < (_BIG * 0.5)
    pts = origin + dirs_w * jnp.where(hit, t, 1.0)[..., None]
    # simple distance attenuation so far geometry is dimmer (adds gradient)
    atten = 1.0 / (1.0 + 0.004 * jnp.where(hit, t, 0.0))
    if rgb:
        albedo = world_color(pts)
        sky = jnp.stack([0.7 + 0.2 * dirs_w[..., 2]] * 3, -1)
        img = jnp.where(hit[..., None], albedo * atten[..., None], sky)
    else:
        albedo = world_intensity(pts)
        sky = 0.7 + 0.2 * dirs_w[..., 2]
        img = jnp.where(hit, albedo * atten, sky)
    return jnp.clip(img, 0.0, 1.0)


# --------------------------------------------------------------------------
# Trajectory
# --------------------------------------------------------------------------

def circuit_trajectory(n_frames: int, radius: float = 32.0, dt: float = 0.1,
                       speed: float = 8.0, z: float = 1.7,
                       wobble: float = 0.15) -> Pose:
    """Ground-truth LiDAR-frame trajectory: a circuit with gentle wobble.

    Returns batched Pose with leading dim n_frames.  Sensor x-axis points
    along the direction of travel (velodyne convention).
    """
    t = jnp.arange(n_frames, dtype=jnp.float32) * dt
    theta = speed * t / radius
    # wobble makes pitch/roll and z vary slightly → exercises full 6-DoF
    x = radius * jnp.cos(theta)
    y = radius * jnp.sin(theta)
    zz = z + wobble * jnp.sin(3.1 * theta)
    pos = jnp.stack([x, y, zz], axis=-1)
    yaw = theta + jnp.pi / 2.0
    pitch = wobble * 0.2 * jnp.cos(3.1 * theta)
    roll = wobble * 0.15 * jnp.sin(2.3 * theta)
    ang = jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], -1)
    q_yaw = so3_exp_quat(ang)
    q_pitch = so3_exp_quat(jnp.stack([jnp.zeros_like(pitch), pitch,
                                      jnp.zeros_like(pitch)], -1))
    q_roll = so3_exp_quat(jnp.stack([roll, jnp.zeros_like(roll),
                                     jnp.zeros_like(roll)], -1))
    from lmono_tpu.utils.lie import quat_mul
    q = quat_mul(q_yaw, quat_mul(q_pitch, q_roll))
    return Pose(pos, q)


def figure8_trajectory(n_frames: int, radius: float = 26.0, dt: float = 0.1,
                       speed: float = 8.0, z: float = 1.7,
                       tilt: float = 0.18) -> Pose:
    """Rotation-rich ground truth: a figure-eight with pronounced pitch/
    roll oscillation (~10°), exciting all three rotation axes.

    Yaw-dominant motion (the plain circuit) leaves AX = XB rank-deficient
    — rotation about the common yaw axis is unobservable — so the σ₂>0.25
    hand-eye convergence gate (`AxxbSolver.cc:140-146` parity) correctly
    refuses it.  This trajectory is the synthetic stand-in for KITTI's
    turns + road grade, which provide the same multi-axis excitation; the
    eval sweep drives the estimate_laser=2 presets with it.
    """
    t = jnp.arange(n_frames, dtype=jnp.float32) * dt
    s = speed * t / radius
    # Gerono lemniscate; direction from the analytic derivative
    x = radius * jnp.cos(s)
    y = radius * jnp.sin(s) * jnp.cos(s)
    dx = -radius * jnp.sin(s)
    dy = radius * (jnp.cos(s) ** 2 - jnp.sin(s) ** 2)
    zz = z + 0.8 * jnp.sin(1.7 * s)
    pos = jnp.stack([x, y, zz], axis=-1)
    yaw = jnp.arctan2(dy, dx)
    pitch = tilt * jnp.sin(2.3 * s)
    roll = tilt * 0.7 * jnp.cos(1.9 * s)
    q_yaw = so3_exp_quat(jnp.stack([jnp.zeros_like(yaw),
                                    jnp.zeros_like(yaw), yaw], -1))
    q_pitch = so3_exp_quat(jnp.stack([jnp.zeros_like(pitch), pitch,
                                      jnp.zeros_like(pitch)], -1))
    q_roll = so3_exp_quat(jnp.stack([roll, jnp.zeros_like(roll),
                                     jnp.zeros_like(roll)], -1))
    from lmono_tpu.utils.lie import quat_mul
    q = quat_mul(q_yaw, quat_mul(q_pitch, q_roll))
    return Pose(pos, q)


# Default camera-from-laser extrinsic for the synthetic rig: camera looks
# forward (+x sensor), mimicking the KITTI mounting (camera z = laser x,
# camera x = -laser y, camera y = -laser z) with a small lever arm.
def synthetic_T_CL() -> Pose:
    R = jnp.array([
        [0.0, -1.0, 0.0],
        [0.0, 0.0, -1.0],
        [1.0, 0.0, 0.0],
    ], jnp.float32)
    t = jnp.array([0.06, -0.05, 0.27], jnp.float32)
    return Pose.from_Rt(R, t)
