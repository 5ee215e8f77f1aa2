"""Loop detection: place recognition + BRIEF matching + PnP verification.

Rebuild of the reference loop node (`src/loop_detection_node.cc` +
`src/loop_detection/KeyFrame.cc::findConnection` :354-691): a keyframe's
window landmarks (3D, with descriptors) are matched against an old
keyframe's keypoints by Hamming distance, verified with PnP-RANSAC, and
gated geometrically (ANGLE_THRESHOLD/TRANS_THRESHOLD).  The result is a
relative-pose loop edge for the pose graph plus the drift correction the
estimator applies (`Estimator::loopCorrection`, Estimator.cc:309-365).

Skip gates (SKIP_TIME / SKIP_DIS), score gates (0.05 / 0.015) and inlier
minima (MIN_BRIEF_LOOP_NUM / MIN_PNP_LOOP_NUM) follow the reference configs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import LoopConfig
from lmono_tpu.loop.keyframe_db import KeyframeDB, db_add, db_query
from lmono_tpu.ops.brief import brief_describe, make_codebook, match_descriptors
from lmono_tpu.ops.corners import detect_grid
from lmono_tpu.ops.ransac import ransac_pnp
from lmono_tpu.utils.lie import Pose, mat_to_ypr, quat_to_mat


class LoopResult(NamedTuple):
    found: jax.Array        # () bool
    old_slot: jax.Array     # () int32 db slot of matched keyframe
    old_seq: jax.Array      # () int32 global index of matched keyframe
    rel_t: jax.Array        # (3,) T_old_cur translation (camera frames)
    rel_q: jax.Array        # (4,)
    n_matches: jax.Array    # () int32 BRIEF matches
    n_inliers: jax.Array    # () int32 PnP inliers
    score: jax.Array        # () f32 place-recognition score
    refined: jax.Array      # () bool — LiDAR GN refinement accepted
    refine_inliers: jax.Array  # () int32


class CandidateRows(NamedTuple):
    """DB rows of the top-k place-recognition candidates (leading axis k).

    Exists so the verification stage is DB-layout-agnostic: the local
    detector gathers rows by slot index, the kf-sharded detector
    (`parallel/dist_loop.py`) assembles the same rows with a masked psum
    across shards — verification code is shared."""
    desc: jax.Array        # (k, K, B)
    kp_norm: jax.Array     # (k, K, 2)
    kp_mask: jax.Array     # (k, K)
    t: jax.Array           # (k, 3)
    q: jax.Array           # (k, 4)
    seq: jax.Array         # (k,)
    lidar_edge: jax.Array        # (k, Ke, 3)
    lidar_edge_mask: jax.Array   # (k, Ke)
    lidar_planar: jax.Array      # (k, Kp, 3)
    lidar_planar_mask: jax.Array # (k, Kp)


def gather_rows(db: KeyframeDB, slots: jax.Array) -> CandidateRows:
    """Local-path row fetch (plain indexing; descriptors unpack from the
    bitpacked bank — only the k candidate rows, not the whole bank)."""
    from lmono_tpu.ops.brief import unpack_bits

    return CandidateRows(
        desc=unpack_bits(db.desc[slots]), kp_norm=db.kp_norm[slots],
        kp_mask=db.kp_mask[slots], t=db.t[slots], q=db.q[slots],
        seq=db.seq[slots],
        lidar_edge=db.lidar_edge[slots],
        lidar_edge_mask=db.lidar_edge_mask[slots],
        lidar_planar=db.lidar_planar[slots],
        lidar_planar_mask=db.lidar_planar_mask[slots])


def verify_candidates(rows: CandidateRows, top_s, top_i, gate,
                      cfg: LoopConfig, *,
                      win_desc, win_pts, win_norm, win_mask,
                      cur_pose: Pose, key: jax.Array, win_pnp_mask,
                      lidar=None) -> LoopResult:
    """Geometric verification of the gated candidates (BRIEF match →
    PnP-RANSAC → angle/trans gate → optional LiDAR GN refinement of the
    picked closure).  All candidate data comes in as explicit row arrays."""
    keys = jax.random.split(key, top_s.shape[0])

    def verify(row_desc, row_kp_mask, row_kp_norm, row_t, row_q, k_i):
        # BRIEF matching: current window landmarks ↔ old keyframe keypoints
        idx_b, m_ok = match_descriptors(
            win_desc, win_mask, row_desc, row_kp_mask,
            max_hamming=cfg.hamming_max)
        n_matches = jnp.sum(m_ok)
        # PnP: current 3D world points vs old keyframe's 2D normalized obs
        obs_old = row_kp_norm[idx_b]                     # (Kw, 2)
        # free hypothesis: at a true revisit the drift is small, so the OLD
        # keyframe's own camera-from-world is nearly the PnP answer already
        prior = Pose(row_t, row_q).inverse()
        pose_pnp, inl, pnp_ok = ransac_pnp(
            win_pts, obs_old, m_ok & win_pnp_mask, k_i,
            iters=cfg.pnp_ransac_iters,
            thresh=(cfg.pnp_reproj_px / 460.0) ** 2,
            min_inliers=cfg.min_pnp_inliers,
            prior_pose=prior)
        n_inl = jnp.sum(inl)
        # pose_pnp: oldcam-from-world ⇒ T_old_cur = pose_pnp ∘ T_w_cur
        rel_k = Pose(pose_pnp.apply(cur_pose.t),
                     Pose(pose_pnp.t, pose_pnp.q).compose(cur_pose).q)
        # geometric gate on the revisit distance: |Δyaw| < ANGLE_THRESHOLD,
        # |Δt| < TRANS_THRESHOLD (KeyFrame.cc:588)
        ypr = mat_to_ypr(quat_to_mat(rel_k.q))
        ang_ok = jnp.abs(jnp.rad2deg(ypr[0])) < cfg.angle_threshold_deg
        trans_ok = jnp.linalg.norm(rel_k.t) < cfg.trans_threshold
        ok_k = ((n_matches >= cfg.min_brief_matches) & pnp_ok
                & ang_ok & trans_ok)
        return ok_k, rel_k, n_matches, n_inl

    ok_k, rels, nm_k, ni_k = jax.vmap(verify)(
        rows.desc, rows.kp_mask, rows.kp_norm, rows.t, rows.q, keys)
    ok_k = ok_k & gate
    # earliest verified candidate (smallest global seq), reference-style
    seqs = jnp.where(ok_k, rows.seq, jnp.iinfo(jnp.int32).max)
    pick = jnp.argmin(seqs)
    old_slot = top_i[pick]
    rel = Pose(rels.t[pick], rels.q[pick])
    n_matches = nm_k[pick]
    n_inliers = ni_k[pick]
    found = jnp.any(ok_k)

    # ---- LiDAR refinement of the loop relative pose: register the two
    # keyframes' edge/planar feature sets (point-to-line/plane GN) starting
    # from the PnP estimate — centimeter-grade closure instead of PnP-grade
    refined_flag = jnp.zeros((), bool)
    refine_inl = jnp.zeros((), jnp.int32)
    if lidar is not None:
        from lmono_tpu.lidar.registration import register

        cur_edge, cur_edge_mask, cur_planar, cur_planar_mask, T_CL = lidar[:5]
        lidar_cfg = lidar[5]
        T_LC = T_CL.inverse()
        rel_laser = T_LC.compose(rel).compose(T_CL)
        refined_laser, diag = register(
            rel_laser,
            cur_edge, cur_edge_mask, cur_planar, cur_planar_mask,
            rows.lidar_edge[pick], rows.lidar_edge_mask[pick],
            rows.lidar_planar[pick], rows.lidar_planar_mask[pick],
            lidar_cfg, cfg.refine_iters)
        refine_inl = diag["inliers"][-1].astype(jnp.int32)
        accept = found & (refine_inl >= cfg.refine_min_inliers)
        rel_ref = T_CL.compose(refined_laser).compose(T_LC)
        rel = Pose(jnp.where(accept, rel_ref.t, rel.t),
                   jnp.where(accept, rel_ref.q, rel.q))
        refined_flag = accept

    return LoopResult(
        found=found,
        old_slot=old_slot.astype(jnp.int32),
        old_seq=rows.seq[pick],
        rel_t=rel.t, rel_q=rel.q,
        n_matches=n_matches.astype(jnp.int32),
        n_inliers=n_inliers.astype(jnp.int32),
        score=top_s[pick],
        refined=refined_flag,
        refine_inliers=refine_inl,
    )


def detect_and_verify(db: KeyframeDB, codebook: jax.Array, cfg: LoopConfig,
                      *, desc, kp_mask, win_desc, win_pts, win_norm, win_mask,
                      cur_pose: Pose, cur_seq, cur_time,
                      key: jax.Array, win_pnp_mask=None,
                      lidar=None) -> LoopResult:
    """Query the DB with the current keyframe and geometrically verify the
    best acceptable candidate.

    win_mask gates descriptor matching; win_pnp_mask (defaults to win_mask)
    additionally gates which matches enter PnP — callers pass a stricter
    mask when only a subset of landmarks has reliable 3D.
    """
    if win_pnp_mask is None:
        win_pnp_mask = win_mask
    top_s, top_i, top_ok = db_query(db, codebook, desc, kp_mask, cur_seq,
                                    cur_time, cfg, top_k=4)
    # reference gating: best must clear 0.05; accept candidates > 0.015
    # (LoopDetector.cc:220-257).  BEYOND the reference (which verifies only
    # the earliest gated candidate): verify ALL gated candidates in one
    # vmapped batch and keep the earliest that PASSES — verification is
    # the precision gate, so trying more candidates raises recall without
    # admitting false loops, and the batched PnP/matching is near-free on
    # the MXU.
    gate = top_ok & (top_s > cfg.score_accept) & (top_s[0] > cfg.score_best_min)
    rows = gather_rows(db, top_i)
    return verify_candidates(
        rows, top_s, top_i, gate, cfg,
        win_desc=win_desc, win_pts=win_pts, win_norm=win_norm,
        win_mask=win_mask, cur_pose=cur_pose, key=key,
        win_pnp_mask=win_pnp_mask, lidar=lidar)


class LoopDetector:
    """Host-side wrapper: keyframe ingestion with skip gates + jitted detect.

    Mirrors the reference loop node's flow (`loop_detection_node.cc:147-297`):
    keyframes are only processed every SKIP_TIME seconds / SKIP_DIS meters.
    """

    def __init__(self, cfg: LoopConfig, image_shape: tuple[int, int],
                 focal: float = 460.0, lidar_cfg=None):
        self.cfg = cfg
        self.lidar_cfg = lidar_cfg   # enables LiDAR loop-edge refinement
        self.codebook = make_codebook(cfg.brief_bits, cfg.vocab_dim)
        self.db = KeyframeDB.empty(cfg)
        self._last_time = -1e9
        self._last_pos = None
        self._last_loop_time = -1e9   # SKIP_LOOP_* gates (node.cc:284-285)
        self._last_loop_pos = None
        self._key = jax.random.PRNGKey(7)

        H, W = image_shape

        def prep(image, win_uv, win_mask):
            kp_uv, kp_ok = detect_grid(
                image, max(8, H // 24), cfg.max_keypoints,
                jnp.zeros((1, 2)), jnp.zeros((1,), bool))
            if cfg.image_crop > 0:
                # IMAGE_CROP: drop keypoints near the left/right borders.
                # NOTE: intentional extension of the yaml's intent — the
                # reference builds the crop MASK (loop_detection_node.cc:356)
                # but applies it only in the ORB path (KeyFrame.cc passes it
                # solely to orb_detector->detect); its FAST+BRIEF path (the
                # one both shipped datasets run, use_orb: 0) ignores it.
                # Set image_crop=0 for strict FAST-path parity.
                c = float(cfg.image_crop)
                kp_ok = kp_ok & (kp_uv[:, 0] >= c) & (kp_uv[:, 0] <= W - c)
            if cfg.use_orb:
                # ORB path (`use_orb: 1`, KeyFrame.cc:141-170): steer the
                # BRIEF pattern by the intensity-centroid orientation —
                # matching survives in-plane camera roll between visits
                from lmono_tpu.ops.brief import patch_orientation

                desc = brief_describe(
                    image, kp_uv, kp_ok,
                    angle=patch_orientation(image, kp_uv))
                wdesc = brief_describe(
                    image, win_uv, win_mask,
                    angle=patch_orientation(image, win_uv))
            else:
                desc = brief_describe(image, kp_uv, kp_ok)
                wdesc = brief_describe(image, win_uv, win_mask)
            return kp_uv, kp_ok, desc, wdesc

        self._prep_fn = prep          # raw fn (reused by dist_loop)
        self._prep = jax.jit(prep)

        # fused single-dispatch path: prep + detect + add in one jit call
        # (each separate dispatch costs a full tunnel round-trip).  The
        # PRNG key splits INSIDE the program and the next key is returned:
        # an eager jax.random.split per keyframe cost its own ~15 ms
        # round-trip through the remote tunnel (measured: enqueue 52 ms/kf
        # with eager key/time ops, device program only 27 ms)
        def process_fused(db, image, win_uv, win_norm, win_pts, win_mask,
                          wpnp, ct, cq, seq, time, key, cam, lidar_pack):
            k, key_next = jax.random.split(key)
            kp_uv, kp_ok, desc, wdesc = prep(image, win_uv, win_mask)
            kp_norm = cam.lift_to_normalized(kp_uv)
            lidar = None
            if lidar_pack is not None:
                le, lem, lp, lpm, ext, exq = lidar_pack
                lidar = (le, lem, lp, lpm, Pose(ext, exq), self.lidar_cfg)
            res = detect_and_verify(
                db, self.codebook, cfg,
                desc=desc, kp_mask=kp_ok, win_desc=wdesc, win_pts=win_pts,
                win_norm=win_norm, win_mask=win_mask,
                cur_pose=Pose(ct, cq), cur_seq=seq, cur_time=time, key=k,
                win_pnp_mask=wpnp, lidar=lidar)
            kw = dict(desc=desc, kp_norm=kp_norm, kp_mask=kp_ok,
                      win_desc=wdesc, win_pts=win_pts, win_norm=win_norm,
                      win_mask=win_mask, t=ct, q=cq, time=time)
            if lidar_pack is not None:
                kw.update(lidar_edge=lidar_pack[0],
                          lidar_edge_mask=lidar_pack[1],
                          lidar_planar=lidar_pack[2],
                          lidar_planar_mask=lidar_pack[3])
            db2 = db_add(db, self.codebook, **kw)
            return res, db2, key_next

        # no donation: donating the DB trips an axon-runtime
        # InvalidArgument (and the functional copy is ~sub-ms at HBM bw)
        self._process_fused = jax.jit(process_fused,
                                      static_argnames=("cam",))
        self._detect = jax.jit(
            lambda db, desc, kp_mask, wdesc, wpts, wnorm, wmask, ct, cq, seq,
            time, k, wpnp: detect_and_verify(
                db, self.codebook, cfg,
                desc=desc, kp_mask=kp_mask, win_desc=wdesc, win_pts=wpts,
                win_norm=wnorm, win_mask=wmask,
                cur_pose=Pose(ct, cq), cur_seq=seq, cur_time=time, key=k,
                win_pnp_mask=wpnp))
        if lidar_cfg is not None:
            import dataclasses
            # wider correspondence gate: the PnP init can be off by meters
            refine_cfg = dataclasses.replace(
                lidar_cfg, corr_max_dist=max(3.0, lidar_cfg.corr_max_dist))
            lidar_cfg = refine_cfg
            self._detect_lidar = jax.jit(
                lambda db, desc, kp_mask, wdesc, wpts, wnorm, wmask, ct, cq,
                seq, time, k, wpnp, le, lem, lp, lpm, ext, exq:
                detect_and_verify(
                    db, self.codebook, cfg,
                    desc=desc, kp_mask=kp_mask, win_desc=wdesc, win_pts=wpts,
                    win_norm=wnorm, win_mask=wmask,
                    cur_pose=Pose(ct, cq), cur_seq=seq, cur_time=time, key=k,
                    win_pnp_mask=wpnp,
                    lidar=(le, lem, lp, lpm, Pose(ext, exq), lidar_cfg)))
        self._add = jax.jit(
            lambda db, **kw: db_add(db, self.codebook, **kw))

    def process_keyframe(self, image, cam, win_uv, win_norm, win_pts,
                         win_mask, cam_pose: Pose, time: float,
                         win_pnp_mask=None, lidar_features=None,
                         extrinsic: Pose | None = None,
                         defer_note: bool = False, pos=None):
        """Returns LoopResult or None (skip-gated).

        lidar_features: optional (edge, edge_mask, planar, planar_mask) in
        the current sensor frame (already cropped/padded to the DB's
        kf_edge_points / kf_planar_points capacities); with `extrinsic`
        (T_CL) it enables GN refinement of the loop relative pose.

        defer_note=True skips the host sync on `res.found` (async callers
        reap the result later and record accepted loops via `note_loop`);
        the SKIP_LOOP_* gates then see loops with reap latency.
        pos: optionally the already-fetched numpy position (avoids a
        device→host transfer when the caller batched it).
        """
        import numpy as np

        pos = np.asarray(cam_pose.t) if pos is None else np.asarray(pos)
        if time - self._last_time < self.cfg.skip_time:
            return None
        # SKIP_LOOP_* : after an accepted loop, suppress processing for a
        # while / within a radius (reference loop_detection_node.cc:211,242)
        if time - self._last_loop_time < self.cfg.skip_loop_time:
            return None
        # reference parity: last_skip_time advances once the TIME gates
        # pass, even when a distance gate then rejects the frame
        # (loop_detection_node.cc:234) — under distance-gate churn the
        # node stays time-suppressed
        self._last_time = time
        if self._last_pos is not None and \
                np.linalg.norm(pos - self._last_pos) < self.cfg.skip_dis:
            return None
        if self._last_loop_pos is not None and \
                np.linalg.norm(pos - self._last_loop_pos) \
                < self.cfg.skip_loop_dis:
            return None
        self._last_pos = pos

        if win_pnp_mask is None:
            win_pnp_mask = win_mask
        seq = self.db.count
        use_lidar = (lidar_features is not None
                     and self.lidar_cfg is not None
                     and extrinsic is not None)

        # fused single-dispatch path needs the camera hashable (static jit
        # capture); probe hash() itself rather than catching TypeError
        # around the whole dispatch (a tracing bug must surface, not fall
        # through to the slow path)
        try:
            hash(cam)
            cam_hashable = True
        except TypeError:
            cam_hashable = False

        if cam_hashable:
            lidar_pack = None
            if use_lidar:
                le, lem, lp, lpm = lidar_features
                lidar_pack = (le, lem, lp, lpm, extrinsic.t, extrinsic.q)
            # np.float32(time): a numpy scalar rides in the dispatch; a
            # jnp.float32() here was its own eager transfer round-trip
            res, self.db, self._key = self._process_fused(
                self.db, image, win_uv, win_norm, win_pts, win_mask,
                win_pnp_mask, cam_pose.t, cam_pose.q, seq,
                np.float32(time), self._key, cam, lidar_pack)
            return res if defer_note else self._note_result(res, time, pos)

        self._key, k = jax.random.split(self._key)
        kp_uv, kp_ok, desc, wdesc = self._prep(image, win_uv, win_mask)
        kp_norm = cam.lift_to_normalized(kp_uv)
        if use_lidar:
            le, lem, lp, lpm = lidar_features
            res = self._detect_lidar(
                self.db, desc, kp_ok, wdesc, win_pts, win_norm, win_mask,
                cam_pose.t, cam_pose.q, seq, np.float32(time), k,
                win_pnp_mask, le, lem, lp, lpm, extrinsic.t, extrinsic.q)
        else:
            res = self._detect(self.db, desc, kp_ok, wdesc, win_pts,
                               win_norm, win_mask, cam_pose.t, cam_pose.q,
                               seq, np.float32(time), k, win_pnp_mask)
        kw = dict(desc=desc, kp_norm=kp_norm, kp_mask=kp_ok,
                  win_desc=wdesc, win_pts=win_pts, win_norm=win_norm,
                  win_mask=win_mask, t=cam_pose.t, q=cam_pose.q,
                  time=np.float32(time))
        if use_lidar:
            kw.update(lidar_edge=le, lidar_edge_mask=lem,
                      lidar_planar=lp, lidar_planar_mask=lpm)
        self.db = self._add(self.db, **kw)
        return res if defer_note else self._note_result(res, time, pos)

    def _note_result(self, res, time, pos):
        """Record accepted-loop time/position for the SKIP_LOOP_* gates.
        The host sync on `res.found` is only paid when the gates are on."""
        if res is not None and (self.cfg.skip_loop_time > 0
                                or self.cfg.skip_loop_dis > 0):
            if bool(res.found):
                self.note_loop(time, pos)
        return res

    def note_loop(self, time, pos) -> None:
        """Record an accepted loop for the SKIP_LOOP_* gates (called by
        async reapers that checked `res.found` themselves)."""
        self._last_loop_time = time
        self._last_loop_pos = pos
