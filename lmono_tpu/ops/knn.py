"""Streaming brute-force KNN over fixed-capacity masked point banks.

TPU-native replacement for the reference stack's PCL KD-trees (used by
A-LOAM's correspondence search): instead of a pointer-chasing tree, distances
are computed as dense (Q, chunk) blocks on the VPU/MXU and reduced on the fly
with a running top-k — O(Q·M) FLOPs but perfectly regular, fully fused by
XLA, and far faster on TPU than any tree for the M ≤ 100k banks SLAM uses.

`knn` is the reference implementation; `lmono_tpu.ops.pallas.knn` provides a
hand-tiled Pallas kernel for the hot path with identical semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_INF = 1e12


def knn(query: jax.Array, target: jax.Array, target_mask: jax.Array,
        k: int, chunk: int = 4096, center: jax.Array | None = None,
        select_dtype=None,
        select_precision=None) -> tuple[jax.Array, jax.Array]:
    """k nearest targets for each query point.

    query: (Q, 3); target: (M, 3); target_mask: (M,) bool.
    Returns (dists2 (Q, k), idx (Q, k) int32).  Invalid targets never match;
    if fewer than k valid targets exist, trailing entries have dist2=_INF.

    Fast path: one fused Q×M distance matrix + `lax.approx_min_k` (the
    TPU-optimized partial reduction).  Falls back to a chunked streaming
    top-k only when Q·M would blow past ~64M elements of HBM traffic.

    center/select_dtype/select_precision: optional reduced-precision
    neighbor SELECTION — coordinates are recentered by `center` (distances
    are translation invariant; recentering keeps magnitudes small so
    reduced precision stays accurate) and the Q×M score matrix's cross
    term runs either in `select_dtype` (e.g. bf16 — half the HBM traffic,
    double the MXU rate) or as an f32 matmul at `select_precision` (e.g.
    Precision.HIGH = 3-pass bf16x3 — error ~2⁻¹⁶·|q||t|, ≤0.05 m² after
    recentering: selection is effectively exact).  The returned distances
    are always exact f32 recomputed on the selected k, so downstream
    gating is unaffected; only the neighbor *choice* is approximate.
    """
    Q = query.shape[0]
    M = target.shape[0]
    if center is not None:
        query = query - center
        target = target - center
    approx_select = select_dtype is not None or select_precision is not None
    # approx_min_k lowers to the TPU-optimized PartialReduce; its CPU
    # fallback is a full sort, so keep the streaming path off-TPU
    if jax.default_backend() == "tpu":
        tsel = target.astype(select_dtype) if select_dtype is not None else target
        t2 = jnp.sum(target * target, axis=-1)          # always f32

        def slab(q):
            if not approx_select:
                # exact f32 distances via the fused broadcast-diff form.
                # The matmul expansion q²-2q·t+t² runs the MXU at bf16
                # precision by default, which at world-frame magnitudes
                # (|p| ~ 100 m ⇒ q·t ~ 1e4) injects O(10-70 m²) errors
                # into d2 — catastrophic for 1.5 m gates; measured on-chip
                # at Q=1536/M=16k: default-matmul 1.28 ms err 70 m²,
                # HIGHEST-matmul 2.43 ms, broadcast-diff 1.63 ms exact —
                # the K=3 matmul wastes the MXU anyway, the VPU form wins.
                d2 = jnp.sum((q[:, None, :] - target[None, :, :]) ** 2, -1)
            else:
                qs = q.astype(tsel.dtype)
                q2 = jnp.sum(q * q, axis=-1, keepdims=True)
                # only the cross term runs reduced; accumulation and the
                # squared-norm terms stay f32
                d2 = (q2 - 2.0 * jnp.dot(
                    qs, tsel.T, preferred_element_type=jnp.float32,
                    precision=select_precision)
                      + t2[None, :])
            d2 = jnp.where(target_mask[None, :], d2, _INF)
            vals, idx = jax.lax.approx_min_k(d2, k)
            if approx_select:
                # exact re-distance on the selected k (tiny gather)
                nbr = target[idx]                       # (Qs, k, 3)
                vals = jnp.sum((q[:, None, :] - nbr) ** 2, axis=-1)
                vals = jnp.where(target_mask[idx], vals, _INF)
            return vals, idx

        if Q * M <= (1 << 26):
            vals, idx = slab(query)
            return vals, idx.astype(jnp.int32)
        # large banks: slab over the query dim — per-row top-k needs no
        # cross-slab merge, so HBM pressure stays bounded
        qc = max(1, (1 << 26) // M)
        qc = min(Q, qc)
        n_slabs = (Q + qc - 1) // qc
        pad = n_slabs * qc - Q
        qpad = jnp.concatenate([query, jnp.zeros((pad, 3), query.dtype)])
        vals, idx = jax.lax.map(slab, qpad.reshape(n_slabs, qc, 3))
        return (vals.reshape(-1, k)[:Q],
                idx.reshape(-1, k)[:Q].astype(jnp.int32))
    chunk = min(chunk, M)
    n_chunks = (M + chunk - 1) // chunk
    pad = n_chunks * chunk - M
    tgt = jnp.concatenate([target, jnp.zeros((pad, 3), target.dtype)])
    tmask = jnp.concatenate([target_mask, jnp.zeros(pad, bool)])
    tgt = tgt.reshape(n_chunks, chunk, 3)
    tmask = tmask.reshape(n_chunks, chunk)

    q2 = jnp.sum(query * query, axis=-1, keepdims=True)  # (Q,1)

    def body(carry, inp):
        best_d, best_i = carry              # (Q,k), (Q,k)
        t, m, base = inp                    # (chunk,3), (chunk,), ()
        t2 = jnp.sum(t * t, axis=-1)        # (chunk,)
        # ||q-t||² = q² - 2 q·t + t²  (MXU-friendly inner product; HIGHEST:
        # see the slab path — bf16 default precision corrupts d2 at
        # world-frame magnitudes)
        d2 = (q2 - 2.0 * jnp.dot(query, t.T,
                                 precision=jax.lax.Precision.HIGHEST)
              + t2[None, :])
        d2 = jnp.where(m[None, :], d2, _INF)
        idx = base + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        # merge with running best and re-take top-k smallest
        cat_d = jnp.concatenate([best_d, d2], axis=1)
        cat_i = jnp.concatenate([best_i, idx], axis=1)
        neg_d, sel = jax.lax.top_k(-cat_d, k)
        return (-neg_d, jnp.take_along_axis(cat_i, sel, axis=1)), None

    init = (jnp.full((Q, k), _INF, query.dtype),
            jnp.zeros((Q, k), jnp.int32))
    bases = (jnp.arange(n_chunks) * chunk).astype(jnp.int32)
    (best_d, best_i), _ = jax.lax.scan(body, init, (tgt, tmask, bases))
    return best_d, best_i


def nn1(query: jax.Array, target: jax.Array, target_mask: jax.Array,
        chunk: int = 4096) -> tuple[jax.Array, jax.Array]:
    """Single nearest neighbor (streamlined k=1 case)."""
    d, i = knn(query, target, target_mask, 1, chunk)
    return d[:, 0], i[:, 0]
