"""Pallas TPU kernel: streaming brute-force KNN, per-chunk top-k + XLA merge.

The XLA path (`lmono_tpu.ops.knn`) computes the full Q×M distance matrix and
reduces it with `approx_min_k` (recall ≈ 0.95); this kernel is EXACT and
never materializes the matrix in HBM: the bank streams through VMEM in
chunks, each (TQ, C) distance block is produced on the MXU and reduced to
that chunk's k best (distance, index) pairs in-register; a tiny XLA top_k
merges the per-chunk candidates.  Designed for the SLAM bank sizes
(M ≤ ~10⁵: per-chunk candidates cost (Q · M/C · 128) · 8 B of HBM, which at
M = 64k / C = 1024 is ~4 MB per 1k queries).

Two axon-toolchain lessons (r3's kernel hung Mosaic > 25 min; VERDICT r3 #4):
  * cross-grid-step state (revisited output blocks holding a running sorted
    best-list, inserted via `pltpu.roll`) is what hung the pipeliner — this
    version keeps every grid step independent;
  * a (C,)→(TQ, C) sublane→lane mask broadcast (`jnp.where(msk[None, :] …)`)
    also hangs Mosaic — masked/padded bank rows are pre-moved to a far
    sentinel instead, so their distances are ~3e12 and never win a min.

Matmul precision: the MXU multiplies f32 at bf16 precision by default;
at world-frame magnitudes that injects O(10 m²) error into d², so the
cross-term dot runs with Precision.HIGHEST (inner dim is 3 — the matmul is
output-bound and the multi-pass f32 mode costs ~nothing).

Semantics match `ops.knn.knn` (masked targets never match; short banks pad
with +inf-grade sentinel distances).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e12
_FAR = 1e6


def _knn_chunk_kernel(q_ref, bank_ref, out_d_ref, out_i_ref,
                      *, k: int, chunk: int, TQ: int):
    """Grid = (q_tiles, bank_chunks); every step independent (no revisited
    state).  Reduces one (TQ, chunk) distance block to the chunk's k best
    (d², index) pairs via k min-extractions, written to lanes 0..k-1 of the
    per-chunk output block."""
    j = pl.program_id(1)
    q = q_ref[:, 0:3]                                   # (TQ, 3)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)          # (TQ, 1)
    tile4 = bank_ref[:, :]                              # (C, 4)
    tile = tile4[:, 0:3]
    t2 = jnp.sum(tile * tile, axis=1)
    d2 = (q2 - 2.0 * jax.lax.dot_general(
        q, tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) + t2[None, :])
    base = j * chunk
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (TQ, chunk), 1)

    lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, 128), 1)
    acc_d = jnp.full((TQ, 128), _INF, jnp.float32)
    acc_i = jnp.zeros((TQ, 128), jnp.int32)
    for step in range(k):
        m = jnp.min(d2, axis=1, keepdims=True)               # (TQ, 1)
        is_m = d2 == m
        big = jnp.where(is_m, idx, jnp.int32(2 ** 30))
        mi = jnp.min(big, axis=1, keepdims=True)             # earliest index
        d2 = jnp.where(is_m & (idx == mi), _INF, d2)
        acc_d = jnp.where(lane == step, m, acc_d)
        acc_i = jnp.where(lane == step, mi, acc_i)
    out_d_ref[:, :] = acc_d
    out_i_ref[:, :] = acc_i


@functools.partial(jax.jit, static_argnames=("k", "chunk", "tq", "interpret"))
def knn_pallas(query, target, target_mask, k: int = 5, chunk: int = 1024,
               tq: int = 256, interpret: bool = False):
    """Streaming KNN: query (Q,3), target (M,3), mask (M,) → ((Q,k), (Q,k)).

    Q pads to a multiple of `tq`; M pads to a multiple of `chunk`.
    Exact (unlike the XLA `approx_min_k` path's 0.95 recall target).
    """
    Q = query.shape[0]
    M = target.shape[0]
    Qp = ((Q + tq - 1) // tq) * tq
    Mp = ((M + chunk - 1) // chunk) * chunk
    nj = Mp // chunk
    q4 = jnp.zeros((Qp, 4), jnp.float32).at[:Q, :3].set(query)
    # masked / padded bank rows move to a far sentinel instead of an
    # in-kernel mask select (Mosaic hang — see module docstring)
    far = jnp.full((3,), _FAR, jnp.float32)
    tgt = jnp.where(target_mask[:, None], target, far[None, :])
    t4 = jnp.full((Mp, 4), _FAR, jnp.float32).at[:M, :3].set(tgt)

    kernel = functools.partial(_knn_chunk_kernel, k=k, chunk=chunk, TQ=tq)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(Qp // tq, nj),
        in_specs=[
            pl.BlockSpec((tq, 4), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk, 4), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 128), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, nj * 128), jnp.float32),
            jax.ShapeDtypeStruct((Qp, nj * 128), jnp.int32),
        ],
        interpret=interpret,
    )(q4, t4)
    # gather each chunk's k candidates and merge with one small XLA top_k.
    # masked/padded rows surface as sentinel distances ≥ _FAR² ≫ any real
    # d²; re-flag them to _INF for `ops.knn.knn` parity.
    cd = out_d.reshape(Qp, nj, 128)[:, :, :k].reshape(Qp, nj * k)
    ci = out_i.reshape(Qp, nj, 128)[:, :, :k].reshape(Qp, nj * k)
    neg_d, sel = jax.lax.top_k(-cd, k)
    d = -neg_d[:Q]
    d = jnp.where(d >= 0.9 * _FAR * _FAR, _INF, d)
    return d, jnp.take_along_axis(ci, sel, axis=1)[:Q]
