"""Window feature bookkeeping: table updates, parallax keyframe test,
batched multi-view triangulation, and window sliding.

Fixed-shape rebuild of the reference `FeatureManager`
(`src/image_process/FeatureManager.cc`): the std::list<FeaturePerId> becomes
a (max_tracks, W+1) masked observation table; `featureCheck` (parallax
keyframe gate, `:315-395`), `triangulate` (multi-view DLT, `:75-255`), and
`removeBack/removeFront/removeBackShiftDepth` (`:497-590`) become masked
array transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lmono_tpu.config import EstimatorConfig
from lmono_tpu.estimator.tracker import TrackOutput
from lmono_tpu.estimator.window import FeatureTable, WindowState
from lmono_tpu.utils.lie import Pose, quat_rotate, quat_rotate_inv


def ingest_observations(feats: FeatureTable, out: TrackOutput,
                        frame_slot: jax.Array,
                        axis: str | None = None) -> FeatureTable:
    """Insert this frame's tracked features into the table at `frame_slot`.

    Known ids update their slot; unknown ids claim free slots (anchor =
    frame_slot).  Both tables are fixed-size; id matching is one (M, N)
    comparison.

    axis: inside `shard_map`, `feats` holds this device's rows of the
    landmark-sharded table while `out` is replicated.  Two O(N)+O(D)
    collectives reproduce the single-device allocation exactly: a psum'd
    "id already known" mask, and an exclusive prefix of per-device free-slot
    counts so the k-th new feature still lands in the k-th *global* free
    slot.
    """
    M = feats.ids.shape[0]
    N = out.ids.shape[0]
    match = (feats.ids[:, None] == out.ids[None, :]) & out.alive[None, :] \
        & feats.alive[:, None] & (feats.ids[:, None] >= 0)          # (M,N)
    present = jnp.any(match, axis=1)                                 # (M,)
    obs_m = match.astype(out.norm.dtype) @ out.norm                  # (M,2)

    obs = feats.obs.at[:, frame_slot, :].set(
        jnp.where(present[:, None], obs_m, feats.obs[:, frame_slot, :]))
    obs_mask = feats.obs_mask.at[:, frame_slot].set(
        jnp.where(present, True, feats.obs_mask[:, frame_slot]))

    # new features: tracker slots whose id is not in the table
    known = jnp.any(match, axis=0)                                   # (N,)
    free_rank0 = jnp.zeros((), jnp.int32)
    if axis is not None:
        known = jax.lax.psum(known.astype(jnp.int32), axis) > 0
        # global rank of this device's first free slot = free slots on
        # lower-indexed devices (free slots sort by global row index)
        nd = jax.lax.axis_size(axis)
        my = jax.lax.axis_index(axis)
        nf_all = jax.lax.all_gather(jnp.sum(~feats.alive), axis)     # (D,)
        free_rank0 = jnp.sum(jnp.where(jnp.arange(nd) < my, nf_all, 0))
    is_new = out.alive & ~known & (out.ids >= 0)
    # order free table slots first
    free = ~feats.alive
    slot_order = jnp.argsort(~free, stable=True)                     # free first
    n_free = jnp.sum(free)
    # k-th new feature (in tracker order) → k-th global free slot
    new_order = jnp.argsort(~is_new, stable=True)                    # new first
    k = jnp.arange(M)
    gk = k + free_rank0                                              # global rank
    take = (gk < jnp.sum(is_new)) & (k < n_free)
    src = new_order[jnp.clip(gk, 0, N - 1)]                          # tracker idx
    dst = slot_order[k]                                              # table idx

    ids = feats.ids.at[dst].set(
        jnp.where(take, out.ids[src], feats.ids[dst]))
    anchor = feats.anchor.at[dst].set(
        jnp.where(take, frame_slot, feats.anchor[dst]))
    obs = obs.at[dst, frame_slot, :].set(
        jnp.where(take[:, None], out.norm[src], obs[dst, frame_slot, :]))
    obs_mask = obs_mask.at[dst, frame_slot].set(
        jnp.where(take, True, obs_mask[dst, frame_slot]))
    alive = feats.alive.at[dst].set(
        jnp.where(take, True, feats.alive[dst]))
    inv_depth = feats.inv_depth.at[dst].set(
        jnp.where(take, 0.0, feats.inv_depth[dst]))
    depth_ok = feats.depth_ok.at[dst].set(
        jnp.where(take, False, feats.depth_ok[dst]))

    return FeatureTable(ids=ids, anchor=anchor, obs=obs, obs_mask=obs_mask,
                        inv_depth=inv_depth, depth_ok=depth_ok, alive=alive)


def keyframe_check(feats: FeatureTable, frame_slot: jax.Array,
                   cfg: EstimatorConfig,
                   axis: str | None = None) -> jax.Array:
    """Parallax keyframe gate (reference `featureCheck`,
    FeatureManager.cc:315-395): mean parallax between the two frames before
    the new one, over co-visible features; keyframe when above
    FEATURE_THRESHOLD px (virtual focal) or when tracking is thin.

    axis: landmark-sharded tables psum the two reduction scalars."""
    j1 = jnp.maximum(frame_slot - 1, 0).astype(jnp.int32)
    j2 = jnp.maximum(frame_slot - 2, 0).astype(jnp.int32)
    o1 = feats.obs[:, j1, :]
    o2 = feats.obs[:, j2, :]
    m1 = feats.obs_mask[:, j1]
    m2 = feats.obs_mask[:, j2]
    co = m1 & m2 & feats.alive
    par = jnp.linalg.norm(o1 - o2, axis=-1)
    n_co = jnp.sum(co)
    sum_par = jnp.sum(jnp.where(co, par, 0.0))
    if axis is not None:
        n_co = jax.lax.psum(n_co, axis)
        sum_par = jax.lax.psum(sum_par, axis)
    mean_par = sum_par / jnp.maximum(n_co, 1)
    thin = n_co < 20
    early = frame_slot < 2
    return early | thin | (mean_par * cfg.focal_length > cfg.feature_threshold)


def triangulate(state: WindowState, cfg: EstimatorConfig) -> WindowState:
    """Batched multi-view triangulation of un-depthed features
    (reference `FeatureManager::triangulate`, FeatureManager.cc:75-255).

    Least-squares ray intersection: p* = argmin Σ_j ||(I − d̂_j d̂_jᵀ)(p − c_j)||²
    over all observing camera centers c_j / ray dirs d̂_j, then the anchor-frame
    depth becomes the inverse-depth state.
    """
    feats = state.feats
    M, W1, _ = feats.obs.shape

    # camera poses for all slots: T_W_C = T_W_L ∘ T_CL⁻¹
    T_CL = Pose(state.ex_t, state.ex_q)
    T_LC = T_CL.inverse()
    cam_t = state.t + quat_rotate(state.q, jnp.broadcast_to(T_LC.t, (W1, 3)))
    from lmono_tpu.utils.lie import quat_mul, quat_normalize
    cam_q = quat_normalize(quat_mul(state.q, T_LC.q))

    # ray dirs in world for every (feature, frame)
    ones = jnp.ones((M, W1, 1), feats.obs.dtype)
    d_cam = jnp.concatenate([feats.obs, ones], axis=-1)
    d_cam = d_cam / jnp.linalg.norm(d_cam, axis=-1, keepdims=True)
    d_w = quat_rotate(cam_q[None, :, :], d_cam)          # (M, W1, 3)

    frame_idx = jnp.arange(W1)[None, :]
    act = feats.obs_mask & feats.alive[:, None] & (frame_idx < state.count)

    eye = jnp.eye(3, dtype=d_w.dtype)
    P_perp = eye - jnp.einsum("mwi,mwj->mwij", d_w, d_w)   # (M,W1,3,3)
    P_perp = P_perp * act[..., None, None]
    A = jnp.sum(P_perp, axis=1)                            # (M,3,3)
    b = jnp.einsum("mwij,wj->mi", P_perp, cam_t)
    A_damped = A + 1e-6 * eye
    p_w = jnp.linalg.solve(A_damped, b[..., None])[..., 0]  # (M,3)

    # parallax gate: angle spread of observing rays
    mean_d = jnp.sum(jnp.where(act[..., None], d_w, 0.0), axis=1)
    n_obs = jnp.sum(act, axis=1)
    mean_d = mean_d / jnp.maximum(
        jnp.linalg.norm(mean_d, axis=-1, keepdims=True), 1e-9)
    cos_spread = jnp.where(act, jnp.einsum("mwi,mi->mw", d_w, mean_d), 1.0)
    min_cos = jnp.min(cos_spread, axis=1)
    enough_parallax = min_cos < jnp.cos(cfg.min_parallax_depth)

    # depth in anchor camera frame
    a = feats.anchor
    ca_t = cam_t[a]
    ca_q = cam_q[a]
    p_anchor = quat_rotate_inv(ca_q, p_w - ca_t)
    z = p_anchor[..., 2]
    good = (n_obs >= 2) & enough_parallax & (z > cfg.depth_min) \
        & jnp.all(jnp.isfinite(p_w), axis=-1)

    newly = good & ~feats.depth_ok & feats.alive
    inv_depth = jnp.where(newly, 1.0 / jnp.maximum(z, cfg.depth_min),
                          feats.inv_depth)
    depth_ok = feats.depth_ok | newly
    return state._replace(feats=feats._replace(
        inv_depth=inv_depth, depth_ok=depth_ok))


def slide_old(state: WindowState) -> WindowState:
    """Marginalize-oldest slide: shift frames left by one; transfer anchor
    depths of features anchored at slot 0 into slot 1's camera frame
    (reference `removeBackShiftDepth`, FeatureManager.cc:497-556)."""
    feats = state.feats
    M, W1, _ = feats.obs.shape

    # depth transfer for anchor==0 features with an obs at slot 1
    T_CL = Pose(state.ex_t, state.ex_q)
    T_LC = T_CL.inverse()
    from lmono_tpu.utils.lie import quat_mul, quat_normalize
    cam_t = state.t + quat_rotate(state.q, jnp.broadcast_to(T_LC.t, (W1, 3)))
    cam_q = quat_normalize(quat_mul(state.q, T_LC.q))

    n0 = feats.obs[:, 0, :]
    depth0 = 1.0 / jnp.maximum(feats.inv_depth, 1e-4)
    p_c0 = jnp.concatenate([n0, jnp.ones((M, 1), n0.dtype)], -1) * depth0[:, None]
    p_w = quat_rotate(cam_q[0], p_c0) + cam_t[0]
    p_c1 = quat_rotate_inv(cam_q[1], p_w - cam_t[1])
    z1 = p_c1[..., 2]

    anchored0 = feats.alive & (feats.anchor == 0)
    has1 = feats.obs_mask[:, 1]
    transfer = anchored0 & has1 & feats.depth_ok & (z1 > 0.05)
    inv_depth = jnp.where(transfer, 1.0 / jnp.maximum(z1, 0.05),
                          feats.inv_depth)
    depth_ok = jnp.where(anchored0, transfer, feats.depth_ok)

    # shift observations left
    obs = jnp.concatenate([feats.obs[:, 1:], jnp.zeros_like(feats.obs[:, :1])],
                          axis=1)
    obs_mask = jnp.concatenate(
        [feats.obs_mask[:, 1:], jnp.zeros_like(feats.obs_mask[:, :1])], axis=1)
    anchor = jnp.maximum(feats.anchor - 1, 0)
    alive = feats.alive & jnp.any(obs_mask, axis=1)

    new_feats = FeatureTable(
        ids=jnp.where(alive, feats.ids, -1),
        anchor=anchor, obs=obs, obs_mask=obs_mask,
        inv_depth=inv_depth,
        depth_ok=depth_ok & alive,
        alive=alive,
    )

    def shift_left(x):
        return jnp.concatenate([x[1:], x[-1:]], axis=0)

    return state._replace(
        t=shift_left(state.t), q=shift_left(state.q),
        lt=shift_left(state.lt), lq=shift_left(state.lq),
        feats=new_feats,
        count=state.count - 1,
    )


def slide_new(state: WindowState) -> WindowState:
    """Drop-second-newest slide (non-keyframe): slot W-1 ← slot W
    (reference `slideWindow` MARGIN_SECOND_NEW path, Estimator.cc:700-771).
    The two laser relative factors merge implicitly because the kept
    odometry poses lt/lq stay consistent."""
    feats = state.feats
    W1 = state.t.shape[0]
    last, prev = W1 - 1, W1 - 2

    obs = feats.obs.at[:, prev].set(feats.obs[:, last])
    obs_mask = feats.obs_mask.at[:, prev].set(feats.obs_mask[:, last])
    obs = obs.at[:, last].set(0.0)
    obs_mask = obs_mask.at[:, last].set(False)
    anchor = jnp.where(feats.anchor == last, prev, feats.anchor)
    alive = feats.alive & jnp.any(obs_mask, axis=1)

    new_feats = feats._replace(
        ids=jnp.where(alive, feats.ids, -1),
        anchor=anchor, obs=obs, obs_mask=obs_mask,
        alive=alive, depth_ok=feats.depth_ok & alive)

    def move(x):
        return x.at[prev].set(x[last])

    return state._replace(
        t=move(state.t), q=move(state.q),
        lt=move(state.lt), lq=move(state.lq),
        feats=new_feats,
        count=state.count - 1,
    )
