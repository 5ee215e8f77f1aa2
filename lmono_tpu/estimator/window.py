"""Fixed-shape sliding-window state for the LiDAR–monocular fusion estimator.

Replaces the reference's `Estimator` member soup (`include/image_process/
Estimator.h:110-280`: Ps/Rs arrays, std::list<FeaturePerId>, raw double
para_* blocks) with one NamedTuple of fixed-capacity arrays:

* `W+1` pose slots (world-from-laser), slot `count-1` = newest frame;
* the camera-from-laser extrinsic T_CL as an optimized variable
  (`laser_to_camera0` in the reference config);
* a feature table of `max_tracks` slots × `W+1` per-frame normalized
  observations with masks, anchored inverse depths.

Frame convention: camera pose T_W_C(i) = T_W_L(i) ∘ T_CL⁻¹.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import EstimatorConfig
from lmono_tpu.utils.lie import Pose


class FeatureTable(NamedTuple):
    ids: jax.Array        # (M,) int32, -1 empty
    anchor: jax.Array     # (M,) int32 anchor frame slot (first obs)
    obs: jax.Array        # (M, W1, 2) normalized coords per window frame
    obs_mask: jax.Array   # (M, W1) bool
    inv_depth: jax.Array  # (M,) inverse depth in anchor camera frame
    depth_ok: jax.Array   # (M,) bool — triangulated / solvable
    alive: jax.Array      # (M,) bool — slot in use

    @staticmethod
    def empty(max_tracks: int, w1: int) -> "FeatureTable":
        return FeatureTable(
            ids=-jnp.ones((max_tracks,), jnp.int32),
            anchor=jnp.zeros((max_tracks,), jnp.int32),
            obs=jnp.zeros((max_tracks, w1, 2), jnp.float32),
            obs_mask=jnp.zeros((max_tracks, w1), bool),
            inv_depth=jnp.zeros((max_tracks,), jnp.float32),
            depth_ok=jnp.zeros((max_tracks,), bool),
            alive=jnp.zeros((max_tracks,), bool),
        )


class MargPrior(NamedTuple):
    """Linearized prior from marginalization (first-estimate Jacobians).

    r(x) = r0 + J · (x ⊟ x0) over the stacked local coords of
    [poses 0..W, extrinsic] (dim D = 6*(W+1)+6).  Inactive rows are zero.
    """
    J: jax.Array      # (D, D)
    r0: jax.Array     # (D,)
    # linearization point
    lin_t: jax.Array  # (W1, 3)
    lin_q: jax.Array  # (W1, 4)
    lin_ex_t: jax.Array  # (3,)
    lin_ex_q: jax.Array  # (4,)
    valid: jax.Array  # () bool

    @staticmethod
    def empty(w1: int) -> "MargPrior":
        D = 6 * w1 + 6
        return MargPrior(
            J=jnp.zeros((D, D), jnp.float32),
            r0=jnp.zeros((D,), jnp.float32),
            lin_t=jnp.zeros((w1, 3), jnp.float32),
            lin_q=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (w1, 1)),
            lin_ex_t=jnp.zeros((3,), jnp.float32),
            lin_ex_q=jnp.array([1.0, 0, 0, 0], jnp.float32),
            valid=jnp.zeros((), bool),
        )


class WindowState(NamedTuple):
    # window poses: world-from-laser
    t: jax.Array          # (W1, 3)
    q: jax.Array          # (W1, 4)
    # laser-odometry measured poses (odom frame), for relative factors
    lt: jax.Array         # (W1, 3)
    lq: jax.Array         # (W1, 4)
    # extrinsic: camera-from-laser
    ex_t: jax.Array       # (3,)
    ex_q: jax.Array       # (4,)
    # prior target for the extrinsic (set at init / at FINE_TIMES freeze)
    ex_ref_t: jax.Array   # (3,)
    ex_ref_q: jax.Array   # (4,)
    feats: FeatureTable
    prior: MargPrior
    count: jax.Array      # () int32 — frames currently in window (≤ W1)
    initialized: jax.Array  # () bool
    ex_refines: jax.Array   # () int32 — extrinsic refinement count (FINE_TIMES)

    @staticmethod
    def init(cfg: EstimatorConfig, T_CL: Pose | None = None) -> "WindowState":
        w1 = cfg.window_size + 1
        ident_q = jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (w1, 1))
        if T_CL is None:
            ex_t = jnp.zeros(3, jnp.float32)
            ex_q = jnp.array([1.0, 0, 0, 0], jnp.float32)
        else:
            ex_t, ex_q = T_CL.t, T_CL.q
        return WindowState(
            t=jnp.zeros((w1, 3), jnp.float32),
            q=ident_q,
            lt=jnp.zeros((w1, 3), jnp.float32),
            lq=ident_q,
            ex_t=ex_t, ex_q=ex_q,
            ex_ref_t=ex_t, ex_ref_q=ex_q,
            feats=FeatureTable.empty(cfg.max_tracks, w1),
            prior=MargPrior.empty(w1),
            count=jnp.zeros((), jnp.int32),
            initialized=jnp.zeros((), bool),
            ex_refines=jnp.zeros((), jnp.int32),
        )

    @property
    def w1(self) -> int:
        return self.t.shape[0]

    def pose(self, i) -> Pose:
        return Pose(self.t[i], self.q[i])

    def extrinsic(self) -> Pose:
        """T_CL: camera-from-laser."""
        return Pose(self.ex_t, self.ex_q)

    def cam_pose(self, i) -> Pose:
        """T_W_C(i) = T_W_L(i) ∘ T_CL⁻¹."""
        return self.pose(i).compose(self.extrinsic().inverse())


def consistency_check(w: "WindowState") -> dict:
    """Camera-vs-laser relative-motion consistency over the window.

    Parity with `Estimator::check()` (`src/image_process/Estimator.cc:
    1472-1501`), which prints, for each consecutive window pair, the
    optimized relative motion against the laser-odometry relative motion.
    Returns masked per-pair rotation discrepancy (degrees) and translation
    discrepancy (meters) plus their maxima — the numeric self-check the
    reference only ever eyeballs in a terminal.
    """
    opt_rel = jax.vmap(
        lambda i: Pose(w.t[i], w.q[i]).between(Pose(w.t[i + 1], w.q[i + 1]))
    )(jnp.arange(w.w1 - 1))
    las_rel = jax.vmap(
        lambda i: Pose(w.lt[i], w.lq[i]).between(Pose(w.lt[i + 1], w.lq[i + 1]))
    )(jnp.arange(w.w1 - 1))
    d = jax.vmap(lambda a, b: a.local(b))(opt_rel, las_rel)   # (W, 6)
    rot_deg = jnp.linalg.norm(d[:, 3:], axis=-1) * (180.0 / jnp.pi)
    trans_m = jnp.linalg.norm(d[:, :3], axis=-1)
    pair_valid = jnp.arange(w.w1 - 1) < jnp.maximum(w.count - 1, 0)
    rot_deg = jnp.where(pair_valid, rot_deg, 0.0)
    trans_m = jnp.where(pair_valid, trans_m, 0.0)
    return {
        "rot_err_deg": rot_deg,
        "trans_err_m": trans_m,
        "max_rot_err_deg": jnp.max(rot_deg),
        "max_trans_err_m": jnp.max(trans_m),
    }
