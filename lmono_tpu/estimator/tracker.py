"""Monocular feature-tracking front-end with fixed feature slots.

Functional rebuild of the reference `FeatureTracker`
(`mono_lidar_mapping/src/image_process/FeatureTracker.cc`): KLT pyramid
tracking with forward-backward check (`:218-235`), fundamental-matrix RANSAC
outlier gate (`rejectWithF`, `:435-503`), spacing mask favoring long tracks
(`setMask`, `:55-84`), and Shi–Tomasi re-detection up to MAX_CNT (`:281`).
Feature lists become a fixed array of `max_features` slots: a slot holds a
feature id, pixel position, track count, and validity — dead slots are
refilled by the detector each frame.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.camera.base import CameraModel
from lmono_tpu.config import TrackerConfig
from lmono_tpu.ops.corners import detect_grid
from lmono_tpu.ops.image import build_pyramid, scharr_gradients
from lmono_tpu.ops.lk import track_fb
from lmono_tpu.ops.ransac import ransac_fundamental


class TrackerState(NamedTuple):
    uv: jax.Array          # (N, 2) current pixel positions
    norm: jax.Array        # (N, 2) normalized image coords
    ids: jax.Array         # (N,) int32 feature ids (-1 = empty)
    track_cnt: jax.Array   # (N,) int32 frames tracked
    alive: jax.Array       # (N,) bool
    next_id: jax.Array     # () int32
    pyramid: tuple         # tuple of (H,W) arrays (previous frame)
    grads: tuple           # tuple of ((H,W),(H,W)) per level
    frame: jax.Array       # () int32

    @staticmethod
    def init(cfg: TrackerConfig, height: int, width: int) -> "TrackerState":
        N = cfg.max_features
        levels = cfg.pyramid_levels
        pyr = tuple(jnp.zeros((height // 2 ** l, width // 2 ** l), jnp.float32)
                    for l in range(levels))
        grads = tuple((jnp.zeros_like(p), jnp.zeros_like(p)) for p in pyr)
        return TrackerState(
            uv=jnp.zeros((N, 2), jnp.float32),
            norm=jnp.zeros((N, 2), jnp.float32),
            ids=-jnp.ones((N,), jnp.int32),
            track_cnt=jnp.zeros((N,), jnp.int32),
            alive=jnp.zeros((N,), bool),
            next_id=jnp.zeros((), jnp.int32),
            pyramid=pyr,
            grads=grads,
            frame=jnp.zeros((), jnp.int32),
        )


class TrackOutput(NamedTuple):
    """Per-frame feature observations for the estimator."""
    ids: jax.Array        # (N,) int32, -1 for empty slots
    uv: jax.Array         # (N, 2) pixels
    norm: jax.Array       # (N, 2) normalized coords (x, y)
    velocity: jax.Array   # (N, 2) d(norm)/dt
    track_cnt: jax.Array  # (N,)
    alive: jax.Array      # (N,)


def tracker_step(state: TrackerState, image: jax.Array, cam: CameraModel,
                 cfg: TrackerConfig, key: jax.Array,
                 dt: float = 0.1) -> tuple[TrackerState, TrackOutput]:
    """Process one grayscale image (H, W) in [0,1]."""
    pyr1 = tuple(build_pyramid(image, cfg.pyramid_levels))
    grads1 = tuple(scharr_gradients(p) for p in pyr1)

    not_first = state.frame > 0
    # ---- 1. KLT forward-backward tracking of live slots
    uv1, ok = track_fb(state.pyramid, state.grads, pyr1, grads1,
                       state.uv, state.alive & not_first,
                       patch=cfg.lk_patch, iters=cfg.lk_iters,
                       eps=cfg.lk_eps, fb_thresh=cfg.fb_threshold)

    # ---- 2. fundamental-matrix RANSAC gate on normalized coords
    norm1 = cam.lift_to_normalized(uv1)
    # threshold: F_THRESHOLD px at the camera's focal length
    f_px = float(cam.params.get("fx", cam.params.get("gamma1", 460.0)))
    thr = (cfg.f_threshold / f_px) ** 2
    inl, _ = ransac_fundamental(state.norm, norm1, ok, key,
                                iters=cfg.f_ransac_iters, thresh=thr)
    ok = ok & inl

    tracked = TrackerState(
        uv=uv1,
        norm=norm1,
        ids=jnp.where(ok, state.ids, -1),
        track_cnt=jnp.where(ok, state.track_cnt + 1, 0),
        alive=ok,
        next_id=state.next_id,
        pyramid=pyr1,
        grads=grads1,
        frame=state.frame,
    )

    # ---- 3. re-detect into dead slots (spacing enforced by grid cells)
    n_free = jnp.sum(~tracked.alive)
    new_uv, new_ok = detect_grid(
        image, cfg.min_dist, cfg.max_features,
        tracked.uv, tracked.alive,
        min_quality_rel=cfg.min_track_quality, border=cfg.border_margin)
    # rank free slots: put new features into dead slots in order
    slot_order = jnp.argsort(tracked.alive.astype(jnp.int32), stable=True)
    # k-th new feature goes to slot_order[k] if that slot is dead and new ok
    N = cfg.max_features
    take = new_ok & (jnp.arange(N) < n_free)
    dest = slot_order[jnp.arange(N)]
    new_ids = state.next_id + jnp.cumsum(take.astype(jnp.int32)) - 1

    uv = tracked.uv.at[dest].set(
        jnp.where(take[:, None], new_uv, tracked.uv[dest]))
    ids = tracked.ids.at[dest].set(
        jnp.where(take, new_ids, tracked.ids[dest]))
    cnt = tracked.track_cnt.at[dest].set(
        jnp.where(take, 1, tracked.track_cnt[dest]))
    alive = tracked.alive.at[dest].set(
        jnp.where(take, True, tracked.alive[dest]))
    norm = cam.lift_to_normalized(uv)

    velocity = jnp.where(
        (ok & tracked.alive)[:, None],
        (norm - state.norm) / dt,
        0.0,
    )

    new_state = TrackerState(
        uv=uv, norm=norm, ids=ids, track_cnt=cnt, alive=alive,
        next_id=state.next_id + jnp.sum(take),
        pyramid=pyr1, grads=grads1, frame=state.frame + 1,
    )
    out = TrackOutput(ids=ids, uv=uv, norm=norm, velocity=velocity,
                      track_cnt=cnt, alive=alive)
    return new_state, out


class FeatureTracker:
    """Host-side wrapper holding the jitted step (static cam/cfg)."""

    def __init__(self, cam: CameraModel, cfg: TrackerConfig,
                 height: int, width: int):
        self.cfg = cfg
        self._step = jax.jit(
            lambda s, img, k: tracker_step(s, img, cam, cfg, k))
        self.state = TrackerState.init(cfg, height, width)
        self._key = jax.random.PRNGKey(0)

    def process(self, image, key=None) -> TrackOutput:
        """key: optional explicit PRNG key — callers that coordinate one
        key schedule across lanes (SlamSystem per-lane path vs
        `fused.fused_step`) pass it so all drive modes trace the same
        random draws."""
        if key is None:
            self._key, key = jax.random.split(self._key)
        self.state, out = self._step(self.state, image, key)
        return out
