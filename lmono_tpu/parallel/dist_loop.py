"""kf-sharded loop detection: keyframe DB partitioned over the mesh.

The loop lane's O(C) work — the tf-idf cosine score over the whole
keyframe bank and the per-row storage — partitions trivially over DB
slots (VERDICT r4 #5).  Device d owns global slots [d·C/D, (d+1)·C/D);
per shard work is O(C/D·dim) and the communication is tiny:

  * score merge: per-shard top-4 (score, slot) pairs all-gathered over
    the kf axis and reduced to the global top-4 on every device —
    exactly the `dist_knn` candidate-merge pattern, O(D·4) floats;
  * candidate row fetch: each winner's row is contributed by its owner
    shard and psum-merged (non-owners add zeros) — O(4·rowbytes) on ICI;
  * db_add: only the owner shard writes the new row; the ring counter
    stays replicated.

Verification (BRIEF match, vmapped PnP-RANSAC, LiDAR GN refinement) is
O(1) in C and runs replicated inside the same `shard_map` program, so the
whole keyframe-rate lane stays ONE dispatch, mesh or not.  Parity with
the single-device detector is bitwise for the query/fetch path
(`tests/test_dist_loop.py`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lmono_tpu.config import LoopConfig
from lmono_tpu.loop.detector import CandidateRows, verify_candidates
from lmono_tpu.loop.keyframe_db import KeyframeDB
from lmono_tpu.ops.brief import global_descriptor
from lmono_tpu.utils.lie import Pose


def db_specs(axis: str = "kf") -> KeyframeDB:
    """PartitionSpec tree: every (C, ...) leaf shards its slot axis; the
    ring counter is replicated."""
    row = P(axis)
    return KeyframeDB(
        gdesc=row, desc=row, kp_norm=row, kp_mask=row,
        win_desc=row, win_pts=row, win_norm=row, win_mask=row,
        t=row, q=row, time=row, seq=row, valid=row,
        count=P(),
        lidar_edge=row, lidar_edge_mask=row,
        lidar_planar=row, lidar_planar_mask=row)


def put_db_sharded(mesh: Mesh, db: KeyframeDB, axis: str = "kf"
                   ) -> KeyframeDB:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        db, db_specs(axis))


def _fetch_row(arr, own, lslot, axis):
    """Owner shard contributes its row, others zero; psum replicates.
    Boolean/int rows ride as int32."""
    row = arr[lslot]
    if row.dtype == jnp.bool_:
        row = row.astype(jnp.int32)
        out = jax.lax.psum(jnp.where(own, row, 0), axis)
        return out > 0
    if row.dtype in (jnp.int8, jnp.uint8):
        out = jax.lax.psum(jnp.where(own, row.astype(jnp.int32), 0), axis)
        return out.astype(row.dtype)
    return jax.lax.psum(jnp.where(own, row, jnp.zeros_like(row)), axis)


def sharded_query_fetch(db: KeyframeDB, g: jax.Array, cur_seq, cur_time,
                        cfg: LoopConfig, axis: str, top_k: int = 4):
    """Inside shard_map: tf-idf scores over the LOCAL shard, global top-k
    merge, and psum row fetch.  Mirrors `keyframe_db.db_query` +
    `detector.gather_rows` semantics exactly (global idf via psum)."""
    Cd = db.valid.shape[0]
    my = jax.lax.axis_index(axis)

    n_valid = jax.lax.psum(jnp.sum(db.valid).astype(jnp.float32), axis)
    df_local = jnp.sum((db.gdesc > 0) & db.valid[:, None], axis=0)
    df = jax.lax.psum(df_local, axis)                        # (dim,)
    idf = jnp.log((1.0 + n_valid) / (1.0 + df.astype(jnp.float32)))
    bank = db.gdesc * idf[None, :]
    bank = bank / jnp.maximum(
        jnp.linalg.norm(bank, axis=1, keepdims=True), 1e-6)
    qv = g * idf
    qv = qv / jnp.maximum(jnp.linalg.norm(qv), 1e-6)
    scores = bank @ qv                                       # (Cd,)
    old_enough = (cur_seq - db.seq > cfg.search_gap) \
        & (cur_time - db.time > cfg.search_time)
    ok = db.valid & old_enough
    scores = jnp.where(ok, scores, -1.0)
    loc_s, loc_i = jax.lax.top_k(scores, top_k)
    gslot = loc_i.astype(jnp.int32) + my * Cd

    # candidate merge over the kf axis (dist_knn pattern)
    all_s = jax.lax.all_gather(loc_s, axis, axis=0, tiled=True)   # (D·k,)
    all_g = jax.lax.all_gather(gslot, axis, axis=0, tiled=True)
    top_s, sel = jax.lax.top_k(all_s, top_k)
    top_gslot = all_g[sel]

    own = (top_gslot // Cd) == my                           # (k,)
    lslot = jnp.clip(top_gslot - my * Cd, 0, Cd - 1)
    from lmono_tpu.ops.brief import unpack_bits

    fetch = lambda arr: jax.vmap(
        lambda o, s: _fetch_row(arr, o, s, axis))(own, lslot)
    rows = CandidateRows(
        desc=unpack_bits(fetch(db.desc)), kp_norm=fetch(db.kp_norm),
        kp_mask=fetch(db.kp_mask), t=fetch(db.t), q=fetch(db.q),
        seq=fetch(db.seq),
        lidar_edge=fetch(db.lidar_edge),
        lidar_edge_mask=fetch(db.lidar_edge_mask),
        lidar_planar=fetch(db.lidar_planar),
        lidar_planar_mask=fetch(db.lidar_planar_mask))
    return top_s, top_gslot, top_s > -0.5, rows


def sharded_db_add(db: KeyframeDB, g: jax.Array, axis: str, *,
                   desc, kp_norm, kp_mask, win_desc, win_pts, win_norm,
                   win_mask, t, q, time, lidar_edge=None,
                   lidar_edge_mask=None, lidar_planar=None,
                   lidar_planar_mask=None) -> KeyframeDB:
    """Ring append where only the owner shard writes the row (the counter
    advances replicated on every shard).  Descriptors arrive unpacked and
    are stored bitpacked, as in `keyframe_db.db_add`."""
    from lmono_tpu.ops.brief import pack_bits

    desc = pack_bits(desc)
    win_desc = pack_bits(win_desc)
    Cd = db.valid.shape[0]
    D = jax.lax.axis_size(axis)
    my = jax.lax.axis_index(axis)
    slot = db.count % (Cd * D)
    own = (slot // Cd) == my
    ls = jnp.clip(slot - my * Cd, 0, Cd - 1)

    def w(arr, val):
        return arr.at[ls].set(jnp.where(own, val, arr[ls]))

    if lidar_edge is not None:
        db = db._replace(
            lidar_edge=w(db.lidar_edge, lidar_edge),
            lidar_edge_mask=w(db.lidar_edge_mask, lidar_edge_mask),
            lidar_planar=w(db.lidar_planar, lidar_planar),
            lidar_planar_mask=w(db.lidar_planar_mask, lidar_planar_mask))
    return db._replace(
        gdesc=w(db.gdesc, g), desc=w(db.desc, desc),
        kp_norm=w(db.kp_norm, kp_norm), kp_mask=w(db.kp_mask, kp_mask),
        win_desc=w(db.win_desc, win_desc), win_pts=w(db.win_pts, win_pts),
        win_norm=w(db.win_norm, win_norm), win_mask=w(db.win_mask, win_mask),
        t=w(db.t, t), q=w(db.q, q), time=w(db.time, time),
        seq=w(db.seq, db.count), valid=w(db.valid, jnp.ones((), bool)),
        count=db.count + 1)


def make_dist_process_fused(mesh: Mesh, detector, cfg: LoopConfig,
                            axis: str = "kf"):
    """Sharded drop-in for `LoopDetector._process_fused` (same signature:
    prep + detect + add in ONE dispatch, db sharded over `axis`)."""
    codebook = detector.codebook
    prep = detector._prep_fn          # (image, win_uv, win_mask) -> ...
    lidar_cfg = detector.lidar_cfg

    def process(db, image, win_uv, win_norm, win_pts, win_mask,
                wpnp, ct, cq, seq, time, key, cam, lidar_pack):
        rep = jax.tree.map(lambda _: P(),
                           (image, win_uv, win_norm, win_pts, win_mask,
                            wpnp, ct, cq, seq, time, key, lidar_pack))

        @partial(jax.shard_map, mesh=mesh, check_vma=False,
                 in_specs=(db_specs(axis),) + (rep,),
                 out_specs=(P(), db_specs(axis), P()))
        def inner(db_shard, args):
            (image, win_uv, win_norm, win_pts, win_mask, wpnp,
             ct, cq, seq, time, key, lidar_pack) = args
            k, key_next = jax.random.split(key)
            kp_uv, kp_ok, desc, wdesc = prep(image, win_uv, win_mask)
            kp_norm = cam.lift_to_normalized(kp_uv)
            g = global_descriptor(desc, kp_ok, codebook)
            top_s, top_i, top_ok, rows = sharded_query_fetch(
                db_shard, g, seq, time, cfg, axis)
            gate = (top_ok & (top_s > cfg.score_accept)
                    & (top_s[0] > cfg.score_best_min))
            lidar = None
            kw = {}
            if lidar_pack is not None:
                le, lem, lp, lpm, ext, exq = lidar_pack
                lidar = (le, lem, lp, lpm, Pose(ext, exq), lidar_cfg)
                kw = dict(lidar_edge=le, lidar_edge_mask=lem,
                          lidar_planar=lp, lidar_planar_mask=lpm)
            res = verify_candidates(
                rows, top_s, top_i, gate, cfg,
                win_desc=wdesc, win_pts=win_pts, win_norm=win_norm,
                win_mask=win_mask, cur_pose=Pose(ct, cq), key=k,
                win_pnp_mask=wpnp, lidar=lidar)
            db2 = sharded_db_add(
                db_shard, g, axis,
                desc=desc, kp_norm=kp_norm, kp_mask=kp_ok,
                win_desc=wdesc, win_pts=win_pts, win_norm=win_norm,
                win_mask=win_mask, t=ct, q=cq, time=time, **kw)
            return res, db2, key_next

        return inner(db, (image, win_uv, win_norm, win_pts, win_mask,
                          wpnp, ct, cq, seq, time, key, lidar_pack))

    return jax.jit(process, static_argnames=("cam",))
