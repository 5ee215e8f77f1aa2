"""Window-landmark extraction for the loop lane.

The loop node needs, per keyframe, the newest window frame's live features
with metric 3D (reference: the estimator publishes `/fused/keyframe_point`
carrying the window's triangulated points, `Estimator.cc:555-648`, which the
loop node matches and PnP-verifies, `KeyFrame.cc:354-691`).  Here the 3D
comes primarily from the *LiDAR* depth image (projected + morphologically
completed) sampled at the feature pixel — metric and far more accurate than
the monocular inverse depths, which is what makes PnP verification reliable
(triangulated depths gave ~0 PnP inliers at true revisits).

`window_landmarks` either computes that depth image from the raw scan or —
in the chunked system program — reuses the depth image the dense-mapping
lane already computed for the same frame (one projection+completion shared
by both consumers).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.camera.base import CameraModel
from lmono_tpu.config import MappingConfig
from lmono_tpu.mapping.depth import complete_depth, project_cloud
from lmono_tpu.utils.lie import Pose, quat_mul, quat_normalize, quat_rotate


class WindowLandmarks(NamedTuple):
    pts_w: jax.Array    # (Kw, 3) world 3D (estimator frame, uncorrected)
    norm: jax.Array     # (Kw, 2) normalized-plane obs in the newest frame
    uv: jax.Array       # (Kw, 2) pixel coords
    sel: jax.Array      # (Kw,) descriptor-matchable
    sel_pnp: jax.Array  # (Kw,) has reliable 3D for PnP


def window_landmarks(w, cam: CameraModel, cfg: MappingConfig, Kw: int,
                     scan_points=None, scan_valid=None,
                     depth=None, depth_mask=None) -> WindowLandmarks:
    """Newest-frame window landmarks for the loop lane.

    Either pass the raw scan (`scan_points`/`scan_valid`, sensor frame) to
    project+complete a LiDAR depth image here, or pass a precomputed
    (`depth`, `depth_mask`) camera-frame depth image (the chunked system
    program shares the mapping lane's).  Returns fixed-capacity arrays of
    the best `Kw` landmarks.
    """
    slot = jnp.minimum(w.count - 1, w.t.shape[0] - 1).astype(jnp.int32)
    feats = w.feats
    sel = feats.alive & feats.obs_mask[:, slot]
    norm = feats.obs[:, slot]
    uv = cam.undist_to_plane(norm)

    T_CL_ = Pose(w.ex_t, w.ex_q)
    cam_pose = Pose(w.t[slot], w.q[slot]).compose(T_CL_.inverse())

    # --- LiDAR depth at feature pixels (nearest-valid sampling)
    if depth is None:
        pts_cam_scan = T_CL_.apply(scan_points.reshape(-1, 3))
        depth_img, dmask = project_cloud(
            pts_cam_scan, scan_valid.reshape(-1), cam,
            cfg.depth_min, cfg.depth_max)
        depth, depth_mask = complete_depth(depth_img, dmask, cfg)
    ui = jnp.clip(jnp.round(uv[:, 0]).astype(jnp.int32), 0,
                  depth.shape[1] - 1)
    vi = jnp.clip(jnp.round(uv[:, 1]).astype(jnp.int32), 0,
                  depth.shape[0] - 1)
    z_lidar = depth[vi, ui]
    has_lidar = depth_mask[vi, ui] & (z_lidar > cfg.depth_min) \
        & (z_lidar < cfg.depth_max * 0.9)

    # --- fallback: triangulated inverse depth (weaker, but covers
    # features above the LiDAR's vertical FoV)
    T_LC = T_CL_.inverse()
    cam_t = w.t + quat_rotate(w.q, jnp.broadcast_to(
        T_LC.t, (w.t.shape[0], 3)))
    cam_q = quat_normalize(quat_mul(w.q, T_LC.q))
    a = feats.anchor
    n_a = jnp.take_along_axis(feats.obs, a[:, None, None], axis=1)[:, 0]
    tri_depth = 1.0 / jnp.maximum(feats.inv_depth, 1e-4)
    p_ca = jnp.concatenate(
        [n_a, jnp.ones_like(n_a[:, :1])], -1) * tri_depth[:, None]
    p_w_tri = quat_rotate(cam_q[a], p_ca) + cam_t[a]
    p_c_tri = cam_pose.apply_inv(p_w_tri)
    z_tri = p_c_tri[..., 2]
    has_tri = feats.depth_ok & (z_tri > 0.5)

    ray = jnp.concatenate([norm, jnp.ones_like(norm[:, :1])], -1)
    z = jnp.where(has_lidar, z_lidar, z_tri)
    pts_w = cam_pose.apply(ray * z[:, None])
    sel_pnp = sel & (has_lidar | has_tri)
    if Kw >= sel.shape[0]:
        return WindowLandmarks(pts_w[:Kw], norm[:Kw], uv[:Kw], sel[:Kw],
                               sel_pnp[:Kw])
    # Kw < max_tracks: keep the BEST Kw landmarks, not the first Kw slot
    # rows — rank by (selected, PnP-usable, track length) so a smaller
    # loop-lane budget still carries the strongest features.
    track_len = jnp.sum(feats.obs_mask, axis=1).astype(jnp.float32)
    score = (sel.astype(jnp.float32) * 1e6
             + sel_pnp.astype(jnp.float32) * 1e3 + track_len)
    idx = jax.lax.top_k(score, Kw)[1]
    return WindowLandmarks(pts_w[idx], norm[idx], uv[idx], sel[idx],
                           sel_pnp[idx])


def subsample_features(x, m, cap: int):
    """Static-stride subsample of a masked feature bank to `cap` rows
    (loop-lane LiDAR feature budget)."""
    stride = max(1, x.shape[0] // cap)
    return x[::stride][:cap], m[::stride][:cap]
