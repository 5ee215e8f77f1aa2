"""Pallas TPU kernel: streaming brute-force KNN with in-VMEM running top-k.

The XLA path (`lmono_tpu.ops.knn`) computes the full Q×M distance matrix and
reduces it with `approx_min_k`; at map scale that matrix is hundreds of MB of
HBM traffic.  This kernel never materializes it: the bank streams through
VMEM in chunks, each (TQ, C) distance block is produced on the MXU and
immediately reduced into a running (TQ, k) sorted best list — total HBM
traffic is just Q + M + outputs.

Semantics match `ops.knn.knn` (masked targets never match; short banks pad
with +inf).  The bank's validity mask rides in the 4th coordinate.

KNOWN TOOLCHAIN ISSUE (2026-08-20): on the axon remote-compile path the
Mosaic compile of this kernel hangs >25 minutes (isolated probe; the LK
Pallas kernel compiles fine on the same rig).  Logic parity is covered in
interpret mode (`tests/test_pallas_knn.py`); the engine's default KNN is
the XLA `approx_min_k` streaming path (`ops/knn.py`), so nothing in the
live system traces this kernel unless explicitly requested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e12


def _knn_kernel(q_ref, bank_ref, out_d_ref, out_i_ref,
                *, k: int, chunk: int, TQ: int):
    """Grid = (q_tiles, bank_chunks).  The bank-chunk loop rides the pallas
    grid (Mosaic's pipelined dimension) and the running best lists live in
    the revisited output blocks — far friendlier to the compiler than one
    giant fori body (which hung Mosaic)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_d_ref[:, :] = jnp.full((TQ, 128), _INF, jnp.float32)
        out_i_ref[:, :] = jnp.zeros((TQ, 128), jnp.int32)

    q = q_ref[:, 0:3]                                   # (TQ, 3)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)          # (TQ, 1)
    tile4 = bank_ref[:, :]                              # (C, 4)
    tile = tile4[:, 0:3]
    msk = tile4[:, 3]
    t2 = jnp.sum(tile * tile, axis=1)
    d2 = (q2 - 2.0 * jax.lax.dot_general(
        q, tile, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) + t2[None, :])
    d2 = jnp.where(msk[None, :] > 0.5, d2, _INF)        # (TQ, C)
    base = j * chunk
    idx = base + jax.lax.broadcasted_iota(jnp.int32, (TQ, chunk), 1)

    bd = out_d_ref[:, :]
    bi = out_i_ref[:, :]
    # k min-extractions, each inserted into the sorted best list
    for _ in range(k):
        m = jnp.min(d2, axis=1, keepdims=True)               # (TQ, 1)
        is_m = d2 == m
        big = jnp.where(is_m, idx, jnp.int32(2 ** 30))
        mi = jnp.min(big, axis=1, keepdims=True)             # (TQ, 1)
        d2 = jnp.where(is_m & (idx == mi), _INF, d2)
        # sorted insert: bd ascending ⇒ `worse` is a suffix mask; lane
        # shifts via pltpu.roll (Mosaic rejects bool shifts and cumsum)
        lane = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1)
        bd_prev = pltpu.roll(bd, 1, 1)
        bd_prev = jnp.where(lane == 0, -_INF, bd_prev)
        bi_prev = pltpu.roll(bi, 1, 1)
        worse = bd > m
        first_worse = worse & ~(bd_prev > m)
        bd = jnp.where(worse, jnp.where(first_worse, m, bd_prev), bd)
        bi = jnp.where(worse, jnp.where(first_worse, mi, bi_prev), bi)
    out_d_ref[:, :] = bd
    out_i_ref[:, :] = bi


@functools.partial(jax.jit, static_argnames=("k", "chunk", "tq", "interpret"))
def knn_pallas(query, target, target_mask, k: int = 5, chunk: int = 1024,
               tq: int = 256, interpret: bool = False):
    """Streaming KNN: query (Q,3), target (M,3), mask (M,) → ((Q,k), (Q,k)).

    Q pads to a multiple of `tq`; M pads to a multiple of `chunk`.
    """
    Q = query.shape[0]
    M = target.shape[0]
    Qp = ((Q + tq - 1) // tq) * tq
    Mp = ((M + chunk - 1) // chunk) * chunk
    q4 = jnp.zeros((Qp, 4), jnp.float32).at[:Q, :3].set(query)
    t4 = jnp.zeros((Mp, 4), jnp.float32).at[:M, :3].set(target)
    t4 = t4.at[:M, 3].set(target_mask.astype(jnp.float32))

    kernel = functools.partial(_knn_kernel, k=k, chunk=chunk, TQ=tq)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(Qp // tq, Mp // chunk),
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
    return out_d[:Q, :k], out_i[:Q, :k]
