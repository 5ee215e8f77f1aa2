"""Pallas TPU kernel: streaming brute-force KNN with in-kernel top-k merge.

The XLA path (`lmono_tpu.ops.knn`) computes the full Q×M distance matrix and
reduces it with `approx_min_k` (recall ≈ 0.95); this kernel is EXACT and
never materializes the matrix in HBM: the bank streams through VMEM in
chunks, each (TQ, C) distance block is produced on the MXU and merged into a
RUNNING best-k accumulator held in the revisited output block — the global
top-k leaves the kernel directly, with no per-chunk candidate spill.

This replaces the r4 design (per-chunk k-best written to HBM + XLA top_k
merge), whose O(nj·128) lanes of candidate output made it LOSE to XLA
exactly at large M (KERNELS.json r4: 0.48x at M=131072 — the candidate
arrays alone were ~nj·128·8 B per query row).  The accumulator form writes
k values per query total, so HBM traffic is just the bank stream.

Two axon-toolchain lessons kept from r3/r4 (r3's kernel hung Mosaic >25 min):
  * `pltpu.roll`-based sorted-insert state hung the pipeliner — the running
    best here is maintained by k min-extractions over [chunk | acc] lanes,
    pure elementwise min/compare ops;
  * a (C,)→(TQ, C) sublane→lane mask broadcast also hangs Mosaic — masked/
    padded bank rows are pre-moved to a far sentinel instead, so their
    distances are ~3e12 and never win a min.

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


def _knn_acc_kernel(q_ref, bank_ref, out_d_ref, out_i_ref,
                    *, k: int, chunk: int, TQ: int):
    """Grid = (q_tiles, bank_chunks), bank axis innermost.  The output
    block (TQ, 128) is revisited across the bank axis and carries the
    running best-k in lanes 0..k-1 (remaining lanes stay _INF)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        out_d_ref[:, :] = jnp.full((TQ, 128), _INF, jnp.float32)
        out_i_ref[:, :] = jnp.zeros((TQ, 128), jnp.int32)

    q = q_ref[:, 0:3]                                   # (TQ, 3)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)          # (TQ, 1)
    tile = bank_ref[:, 0:3]                             # (C, 3)
    t2 = jnp.sum(tile * tile, axis=1)
    d2 = (q2 - 2.0 * jax.lax.dot_general(
        q, tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST) + t2[None, :])
    base = j * chunk
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (TQ, chunk), 1)

    # merge [this chunk | accumulator] by k min-extractions: chunks cover
    # disjoint index ranges, so ties can only collide on equal distances,
    # which the earliest-global-index rule breaks deterministically
    cat_d = jnp.concatenate([d2, out_d_ref[:, :]], axis=1)  # (TQ, C+128)
    cat_i = jnp.concatenate([idx, out_i_ref[:, :]], axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, 128), 1)
    acc_d = jnp.full((TQ, 128), _INF, jnp.float32)
    acc_i = jnp.zeros((TQ, 128), jnp.int32)
    for step in range(k):
        m = jnp.min(cat_d, axis=1, keepdims=True)            # (TQ, 1)
        is_m = cat_d == m
        big = jnp.where(is_m, cat_i, jnp.int32(2 ** 30))
        mi = jnp.min(big, axis=1, keepdims=True)             # earliest index
        cat_d = jnp.where(is_m & (cat_i == mi), _INF, cat_d)
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

    kernel = functools.partial(_knn_acc_kernel, k=k, chunk=chunk, TQ=tq)
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
            pl.BlockSpec((tq, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 128), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Qp, 128), jnp.int32),
        ],
        interpret=interpret,
    )(q4, t4)
    # lanes 0..k-1 already hold the exact global top-k.  masked/padded rows
    # surface as sentinel distances ≥ _FAR² ≫ any real d²; re-flag them to
    # _INF for `ops.knn.knn` parity.
    d = out_d[:Q, :k]
    d = jnp.where(d >= 0.9 * _FAR * _FAR, _INF, d)
    return d, out_i[:Q, :k]
