"""Sliding-window LiDAR–monocular fusion estimator (the reference's core).

One jitted `fusion_step` replaces the reference `Estimator` state machine
(`src/image_process/Estimator.cc`: `processEstimation` :528-654,
`processImage` :367-499, `runInitialization` :852-1017, `optimization`
:1124-1305, `slideWindow` :700-771): per frame it

  1. enters the new frame with a laser-odometry-propagated pose,
  2. ingests tracked features and runs the parallax keyframe test,
  3. (estimate_laser==2) accumulates hand-eye pairs until the extrinsic
     rotation converges,
  4. once the window is full: triangulates, solves the window GN (laser
     relative factors + inverse-depth reprojection + extrinsic prior +
     marginalization prior), rejects outliers,
  5. marginalizes the oldest frame (keyframe) or drops the second-newest
     (non-keyframe) and slides.

Everything is fixed-shape; the only data-dependent control flow is
`lax.cond` over {filling, initializing, steady} and {keyframe, non-keyframe}.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import EstimatorConfig
from lmono_tpu.estimator import feature_manager as fm
from lmono_tpu.estimator.initializer import (
    HandEyeState,
    handeye_update,
    relative_pose_from_tracks,
)
from lmono_tpu.estimator.marginalization import marginalize_oldest
from lmono_tpu.estimator.solver import outlier_rejection, solve_window
from lmono_tpu.estimator.tracker import TrackOutput
from lmono_tpu.estimator.window import WindowState
from lmono_tpu.utils.lie import Pose, quat_conj, quat_mul, quat_normalize, quat_rotate

# Landmark-sharded window-solve crossover, measured on the 8-way CPU mesh
# (SCALING.json rows: sharded/dense ratio 2.6x at 1 dev, 1.13x at 2,
# 0.29x at 4).  Below this many kf shards the dense gather-solve path wins.
DIST_WINDOW_CROSSOVER = 4

class EstimatorState(NamedTuple):
    window: WindowState
    handeye: HandEyeState
    prev_norm: jax.Array      # (N,2) previous frame's normalized tracks
    prev_ids: jax.Array       # (N,)
    prev_alive: jax.Array     # (N,)
    prev_laser_t: jax.Array   # (3,) previous frame's raw laser pose —
    prev_laser_q: jax.Array   # (4,) hand-eye pairs need the EXACT one-frame
                              # baseline; window slots don't provide it
                              # pre-initialization (the un-slid window
                              # overwrites its last slot, so lq[slot-1]
                              # ages — the bug that fed multi-frame laser
                              # deltas against one-frame camera rotations)

    @staticmethod
    def init(cfg: EstimatorConfig, T_CL: Pose | None, n_tracks: int):
        return EstimatorState(
            window=WindowState.init(cfg, T_CL),
            handeye=HandEyeState.init(),
            prev_norm=jnp.zeros((n_tracks, 2), jnp.float32),
            prev_ids=-jnp.ones((n_tracks,), jnp.int32),
            prev_alive=jnp.zeros((n_tracks,), bool),
            prev_laser_t=jnp.zeros((3,), jnp.float32),
            prev_laser_q=jnp.array([1.0, 0, 0, 0], jnp.float32),
        )


class FusionOutput(NamedTuple):
    pose: Pose            # world-from-laser, newest frame (post-solve)
    cam_pose: Pose        # world-from-camera
    extrinsic: Pose       # T_CL estimate
    is_keyframe: jax.Array
    initialized: jax.Array
    n_tracked: jax.Array
    solve_cost: jax.Array
    keyframe_slot: jax.Array  # window slot of the newest frame


def _enter_frame(w: WindowState, laser: Pose) -> tuple[WindowState, jax.Array]:
    """Place the new frame at slot = count (capped at W): predicted pose from
    laser-odometry relative motion, and record the raw laser pose."""
    w1 = w.t.shape[0]
    slot = jnp.minimum(w.count, w1 - 1).astype(jnp.int32)
    prev = jnp.maximum(slot - 1, 0)

    # relative laser motion prev→new
    dq = quat_mul(quat_conj(w.lq[prev]), laser.q)
    dp = quat_rotate(quat_conj(w.lq[prev]), laser.t - w.lt[prev])
    pred_t = w.t[prev] + quat_rotate(w.q[prev], dp)
    pred_q = quat_normalize(quat_mul(w.q[prev], dq))

    first = w.count == 0
    pred_t = jnp.where(first, laser.t, pred_t)
    pred_q = jnp.where(first, laser.q, pred_q)

    return w._replace(
        t=w.t.at[slot].set(pred_t),
        q=w.q.at[slot].set(pred_q),
        lt=w.lt.at[slot].set(laser.t),
        lq=w.lq.at[slot].set(laser.q),
        count=w.count + 1,
    ), slot


def fusion_step(state: EstimatorState, track: TrackOutput, laser: Pose,
                cfg: EstimatorConfig, key: jax.Array,
                axis: str | None = None
                ) -> tuple[EstimatorState, FusionOutput]:
    """axis: inside `shard_map`, the window's landmark rows (feature table)
    are sharded over this mesh axis while poses, the tracker output and the
    laser pose are replicated; the window solve runs the landmark-sharded
    LM loop (`parallel.dist_window._lm_loop` — local Schur elimination of
    depths, psum-reduced pose system) and the feature bookkeeping psums its
    few global reductions.  axis=None is the single-device path."""
    w1 = cfg.window_size + 1
    # input sanitization: a non-finite / absurd-jump odometry pose (sensor
    # dropout, upstream divergence) is replaced by constant-velocity
    # extrapolation of the previous laser poses — the estimator never
    # ingests garbage (the reference silently discards misaligned messages,
    # MeasurementManager.cc:79-89; divergence there is unhandled).
    wprev = state.window
    slot_prev = jnp.maximum(
        jnp.minimum(wprev.count, w1 - 1) - 1, 0).astype(jnp.int32)
    slot_pp = jnp.maximum(slot_prev - 1, 0)
    dq_cv = quat_mul(quat_conj(wprev.lq[slot_pp]), wprev.lq[slot_prev])
    dp_cv = quat_rotate(quat_conj(wprev.lq[slot_pp]),
                        wprev.lt[slot_prev] - wprev.lt[slot_pp])
    cv_t = wprev.lt[slot_prev] + quat_rotate(wprev.lq[slot_prev], dp_cv)
    cv_q = quat_normalize(quat_mul(wprev.lq[slot_prev], dq_cv))
    jump = jnp.linalg.norm(laser.t - wprev.lt[slot_prev])
    sane = (jnp.all(jnp.isfinite(laser.t)) & jnp.all(jnp.isfinite(laser.q))
            & ((jump < 10.0) | (wprev.count == 0)))
    laser = Pose(jnp.where(sane, laser.t, cv_t),
                 jnp.where(sane, laser.q, cv_q))
    w, slot = _enter_frame(wprev, laser)

    # ---- features in
    feats = fm.ingest_observations(w.feats, track, slot, axis=axis)
    w = w._replace(feats=feats)
    is_kf = fm.keyframe_check(feats, slot, cfg, axis=axis)

    # ---- hand-eye extrinsic rotation (estimate_laser == 2)
    he = state.handeye
    if cfg.estimate_laser == 2:
        # correspondences: features alive now and last frame
        corr = (track.ids[:, None] == state.prev_ids[None, :]) \
            & track.alive[:, None] & state.prev_alive[None, :] \
            & (track.ids[:, None] >= 0)
        has_prev = jnp.any(corr, axis=1)
        prev_of = corr.astype(track.norm.dtype) @ state.prev_norm
        q_cam, rp_ok = relative_pose_from_tracks(
            prev_of, track.norm, has_prev, key)
        q_las = quat_mul(quat_conj(state.prev_laser_q), laser.q)
        pair_ok = rp_ok & (wprev.count > 0) & ~he.converged
        he = handeye_update(he, q_cam, q_las, pair_ok)
        # adopt the rotation estimate until converged+frozen
        adopt = he.converged & ~state.handeye.converged
        w = w._replace(
            ex_q=jnp.where(adopt, he.q_ex, w.ex_q),
            ex_ref_q=jnp.where(adopt, he.q_ex, w.ex_ref_q),
        )

    full = w.count >= w1
    ready = full & (w.initialized | (cfg.estimate_laser != 2) | he.converged)

    # ---- triangulate + solve (only meaningful when window is full)
    if axis is None:
        solve = solve_window
    elif jax.lax.axis_size(axis) < DIST_WINDOW_CROSSOVER:
        # measured crossover (SCALING.json): the landmark-sharded window
        # layout only beats the dense solver from ~4 shards up (at 1-2
        # shards its halo/duplicated pose-side work pessimizes 2.3-2.6x).
        # Below the crossover, all_gather the landmark rows, run the DENSE
        # solver replicated (identical math to the single-device path),
        # and slice this shard's rows back — never slower than dense.
        def solve(w, cfg):
            m = w.feats.ids.shape[0]
            gathered = jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                w.feats)
            w2, diag = solve_window(w._replace(feats=gathered), cfg)
            i = jax.lax.axis_index(axis)
            sl = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, i * m, m, 0),
                w2.feats)
            return w2._replace(feats=sl), diag
    else:
        from lmono_tpu.parallel.dist_window import _lm_loop
        solve = lambda w, cfg: _lm_loop(w, cfg, axis)

    def do_solve(w: WindowState):
        w = fm.triangulate(w, cfg)
        w2, diag = solve(w, cfg)
        # failure detection (reference only prints on non-convergence,
        # Estimator.cc:1293-1301; here a diverged solve is *rejected* and the
        # laser-propagated window is kept — the deterministic re-init path)
        healthy = (jnp.all(jnp.isfinite(w2.t)) & jnp.all(jnp.isfinite(w2.q))
                   & jnp.isfinite(diag.cost1))
        w2 = jax.tree.map(
            lambda a, b: jnp.where(healthy, a, b) if a.dtype != bool
            else jnp.where(healthy, a, b), w2, w)
        w2 = outlier_rejection(w2, cfg)
        w2 = w2._replace(
            initialized=jnp.ones((), bool),
            ex_refines=w2.ex_refines + (cfg.estimate_laser >= 1),
        )
        # freeze the extrinsic prior target when reaching FINE_TIMES
        freeze = (w2.ex_refines == cfg.fine_times)
        w2 = w2._replace(
            ex_ref_t=jnp.where(freeze, w2.ex_t, w2.ex_ref_t),
            ex_ref_q=jnp.where(freeze, w2.ex_q, w2.ex_ref_q),
        )
        return w2, diag.cost1

    def no_solve(w: WindowState):
        return w, jnp.zeros(())

    w, cost = jax.lax.cond(ready, do_solve, no_solve, w)

    out_pose = Pose(w.t[slot], w.q[slot])
    T_CL = Pose(w.ex_t, w.ex_q)
    output = FusionOutput(
        pose=out_pose,
        cam_pose=out_pose.compose(T_CL.inverse()),
        extrinsic=T_CL,
        is_keyframe=is_kf,
        initialized=w.initialized,
        n_tracked=jnp.sum(track.alive),
        solve_cost=cost,
        keyframe_slot=slot,
    )

    # ---- slide when full
    def slide_kf(w: WindowState):
        prior = marginalize_oldest(w, cfg, axis=axis)
        w2 = fm.slide_old(w)
        return w2._replace(prior=prior)

    def slide_nkf(w: WindowState):
        return fm.slide_new(w)

    def do_slide(w: WindowState):
        return jax.lax.cond(is_kf, slide_kf, slide_nkf, w)

    w = jax.lax.cond(full, do_slide, lambda x: x, w)

    new_state = EstimatorState(
        window=w,
        handeye=he,
        prev_norm=track.norm,
        prev_ids=track.ids,
        prev_alive=track.alive,
        prev_laser_t=laser.t,
        prev_laser_q=laser.q,
    )
    return new_state, output


class FusionEstimator:
    """Host-side wrapper: jitted step + trajectory convenience."""

    def __init__(self, cfg: EstimatorConfig, T_CL: Pose | None = None,
                 n_tracks: int | None = None):
        self.cfg = cfg
        n = n_tracks or cfg.max_tracks
        self.state = EstimatorState.init(cfg, T_CL, n)
        self._step = jax.jit(
            lambda s, tr, lt, lq, k: fusion_step(
                s, tr, Pose(lt, lq), cfg, k))
        self._key = jax.random.PRNGKey(42)

    def process(self, track: TrackOutput, laser_pose: Pose,
                key=None) -> FusionOutput:
        """key: optional explicit PRNG key (see FeatureTracker.process)."""
        if key is None:
            self._key, key = jax.random.split(self._key)
        self.state, out = self._step(self.state, track, laser_pose.t,
                                     laser_pose.q, key)
        return out
