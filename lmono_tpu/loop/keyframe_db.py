"""Fixed-capacity keyframe database for place recognition.

Replaces the reference's DBoW2 database + std::list<KeyFrame*>
(`src/loop_detection/LoopDetector.cc:32-150`): keyframes live in fixed
arrays; querying is one masked cosine matmul over the global-descriptor
bank followed by top-k — O(N·dim) on the MXU, no inverted index.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.config import LoopConfig
from lmono_tpu.ops.brief import global_descriptor, make_codebook


class KeyframeDB(NamedTuple):
    gdesc: jax.Array       # (C, dim) global descriptors (L2-normalized)
    desc: jax.Array        # (C, K, B//8) BITPACKED BRIEF descriptors
    kp_norm: jax.Array     # (C, K, 2) keypoint normalized coords
    kp_mask: jax.Array     # (C, K)
    win_desc: jax.Array    # (C, Kw, B//8) bitpacked window-landmark descs
    win_pts: jax.Array     # (C, Kw, 3) world 3D points of window landmarks
    win_norm: jax.Array    # (C, Kw, 2) their normalized obs in this keyframe
    win_mask: jax.Array    # (C, Kw)
    t: jax.Array           # (C, 3) keyframe pose (world-from-camera)
    q: jax.Array           # (C, 4)
    time: jax.Array        # (C,) timestamps
    seq: jax.Array         # (C,) global keyframe index
    valid: jax.Array       # (C,)
    count: jax.Array       # () int32 — next write slot (ring)
    # LiDAR features in the keyframe's sensor frame (loop-edge refinement)
    lidar_edge: jax.Array      # (C, Ke, 3)
    lidar_edge_mask: jax.Array # (C, Ke)
    lidar_planar: jax.Array    # (C, Kp, 3)
    lidar_planar_mask: jax.Array  # (C, Kp)

    @staticmethod
    def empty(cfg: LoopConfig) -> "KeyframeDB":
        """Fresh DB (fixed-capacity masked arrays).  The per-keyframe
        db_add copies the bank (functional update; donating it trips an
        axon-runtime InvalidArgument, and at 819 GB/s the ~0.6 GB KITTI
        -preset copy costs under a millisecond anyway)."""
        C, K, Kw, B = (cfg.db_capacity, cfg.max_keypoints,
                       cfg.window_points, cfg.brief_bits)
        return KeyframeDB(
            gdesc=jnp.zeros((C, cfg.vocab_dim), jnp.float32),
            # packed all-ones rows (= unpacked all +1, the masked filler)
            desc=jnp.full((C, K, B // 8), 255, jnp.uint8),
            kp_norm=jnp.zeros((C, K, 2), jnp.float32),
            kp_mask=jnp.zeros((C, K), bool),
            win_desc=jnp.full((C, Kw, B // 8), 255, jnp.uint8),
            win_pts=jnp.zeros((C, Kw, 3), jnp.float32),
            win_norm=jnp.zeros((C, Kw, 2), jnp.float32),
            win_mask=jnp.zeros((C, Kw), bool),
            t=jnp.zeros((C, 3), jnp.float32),
            q=jnp.tile(jnp.array([1.0, 0, 0, 0], jnp.float32), (C, 1)),
            time=jnp.zeros((C,), jnp.float32),
            seq=jnp.zeros((C,), jnp.int32),
            valid=jnp.zeros((C,), bool),
            count=jnp.zeros((), jnp.int32),
            lidar_edge=jnp.zeros((C, cfg.kf_edge_points, 3), jnp.float32),
            lidar_edge_mask=jnp.zeros((C, cfg.kf_edge_points), bool),
            lidar_planar=jnp.zeros((C, cfg.kf_planar_points, 3), jnp.float32),
            lidar_planar_mask=jnp.zeros((C, cfg.kf_planar_points), bool),
        )


def db_add(db: KeyframeDB, codebook: jax.Array, *,
           desc, kp_norm, kp_mask, win_desc, win_pts, win_norm, win_mask,
           t, q, time, lidar_edge=None, lidar_edge_mask=None,
           lidar_planar=None, lidar_planar_mask=None) -> KeyframeDB:
    """Append one keyframe (ring buffer; oldest evicted at capacity).
    `desc`/`win_desc` arrive unpacked (K, B) ±1 and are stored bitpacked."""
    from lmono_tpu.ops.brief import pack_bits

    C = db.valid.shape[0]
    slot = db.count % C
    g = global_descriptor(desc, kp_mask, codebook)
    desc = pack_bits(desc)
    win_desc = pack_bits(win_desc)
    if lidar_edge is not None:
        db = db._replace(
            lidar_edge=db.lidar_edge.at[slot].set(lidar_edge),
            lidar_edge_mask=db.lidar_edge_mask.at[slot].set(lidar_edge_mask),
            lidar_planar=db.lidar_planar.at[slot].set(lidar_planar),
            lidar_planar_mask=db.lidar_planar_mask.at[slot].set(
                lidar_planar_mask),
        )
    return db._replace(
        gdesc=db.gdesc.at[slot].set(g),
        desc=db.desc.at[slot].set(desc),
        kp_norm=db.kp_norm.at[slot].set(kp_norm),
        kp_mask=db.kp_mask.at[slot].set(kp_mask),
        win_desc=db.win_desc.at[slot].set(win_desc),
        win_pts=db.win_pts.at[slot].set(win_pts),
        win_norm=db.win_norm.at[slot].set(win_norm),
        win_mask=db.win_mask.at[slot].set(win_mask),
        t=db.t.at[slot].set(t),
        q=db.q.at[slot].set(q),
        time=db.time.at[slot].set(time),
        seq=db.seq.at[slot].set(db.count),
        valid=db.valid.at[slot].set(True),
        count=db.count + 1,
    )


def db_query(db: KeyframeDB, codebook: jax.Array, desc, kp_mask,
             cur_seq, cur_time, cfg: LoopConfig, top_k: int = 4):
    """Query: tf-idf-weighted cosine scores, excluding the last `search_gap`
    keyframes and anything newer than `search_time` seconds before the query
    (reference `detectLoop`, LoopDetector.cc:167-260; DBoW2's vocabulary
    carries idf weights the same way, `TemplatedVocabulary.h` TF_IDF).

    idf downweights vocabulary buckets that fire in most keyframes (ground,
    sky, repeated façades) — the buckets that cause perceptual aliasing —
    and is recomputed from the live bank each query (one O(C·dim) pass, the
    same cost as the score matmul itself).

    Returns (scores (top_k,), slots (top_k,), mask (top_k,)).
    """
    g = global_descriptor(desc, kp_mask, codebook)
    n_valid = jnp.sum(db.valid).astype(jnp.float32)
    df = jnp.sum((db.gdesc > 0) & db.valid[:, None], axis=0)       # (dim,)
    idf = jnp.log((1.0 + n_valid) / (1.0 + df.astype(jnp.float32)))
    bank = db.gdesc * idf[None, :]
    bank = bank / jnp.maximum(
        jnp.linalg.norm(bank, axis=1, keepdims=True), 1e-6)
    qv = g * idf
    qv = qv / jnp.maximum(jnp.linalg.norm(qv), 1e-6)
    scores = bank @ qv                                             # (C,)
    old_enough = (cur_seq - db.seq > cfg.search_gap) \
        & (cur_time - db.time > cfg.search_time)
    ok = db.valid & old_enough
    scores = jnp.where(ok, scores, -1.0)
    top_s, top_i = jax.lax.top_k(scores, top_k)
    return top_s, top_i.astype(jnp.int32), top_s > -0.5
