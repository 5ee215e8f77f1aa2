"""Pallas TPU kernel: streaming brute-force KNN with in-VMEM running top-k.

The XLA path (`lmono_tpu.ops.knn`) computes the full Q×M distance matrix and
reduces it with `approx_min_k`; at map scale that matrix is hundreds of MB of
HBM traffic.  This kernel never materializes it: the bank streams through
VMEM in chunks, each (TQ, C) distance block is produced on the MXU and
immediately reduced into a running (TQ, k) sorted best list — total HBM
traffic is just Q + M + outputs.

Semantics match `ops.knn.knn` (masked targets never match; short banks pad
with +inf).  The bank's validity mask rides in the 4th coordinate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 1e12


def _knn_kernel(q_ref, bank_ref, out_d_ref, out_i_ref,
                *, k: int, chunk: int, M: int, TQ: int):
    n_chunks = M // chunk
    q = q_ref[:, 0:3]                                   # (TQ, 3)
    q2 = jnp.sum(q * q, axis=1, keepdims=True)          # (TQ, 1)

    def process_chunk(c, best):
        best_d, best_i = best                           # (TQ, k), sorted asc
        base = pl.multiple_of(c * chunk, chunk)
        tile4 = bank_ref[pl.ds(base, chunk), :]         # (C, 4)
        tile = tile4[:, 0:3]
        msk = tile4[:, 3]
        t2 = jnp.sum(tile * tile, axis=1)
        d2 = (q2 - 2.0 * jax.lax.dot_general(
            q, tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) + t2[None, :])
        d2 = jnp.where(msk[None, :] > 0.5, d2, _INF)    # (TQ, C)
        idx = base + jax.lax.broadcasted_iota(jnp.int32, (TQ, chunk), 1)

        # k sequential min-extractions, each inserted into the sorted list
        def extract(j, carry):
            d2c, bd, bi = carry
            m = jnp.min(d2c, axis=1, keepdims=True)          # (TQ, 1)
            is_m = d2c == m
            big = jnp.where(is_m, idx, jnp.int32(2 ** 30))
            mi = jnp.min(big, axis=1, keepdims=True)         # (TQ, 1)
            d2c = jnp.where(is_m & (idx == mi), _INF, d2c)
            # sorted insert of (m, mi): bd is sorted ascending, so `worse`
            # is a suffix mask — its first True is the insertion slot.
            # Lane shifts go through pltpu.roll on numeric vectors (Mosaic
            # rejects bool lane shifts and cumsum).
            lane = jax.lax.broadcasted_iota(jnp.int32, bd.shape, 1)
            bd_prev = pltpu.roll(bd, 1, 1)
            bd_prev = jnp.where(lane == 0, -_INF, bd_prev)
            bi_prev = pltpu.roll(bi, 1, 1)
            worse = bd > m
            first_worse = worse & ~(bd_prev > m)
            nbd = jnp.where(worse, jnp.where(first_worse, m, bd_prev), bd)
            nbi = jnp.where(worse, jnp.where(first_worse, mi, bi_prev), bi)
            return d2c, nbd, nbi

        _, best_d, best_i = jax.lax.fori_loop(
            0, k, extract, (d2, best_d, best_i))
        return best_d, best_i

    # best lists are carried at full 128-lane width (Mosaic rejects
    # narrow-lane vectors); only the first k slots are meaningful
    init = (jnp.full((TQ, 128), _INF, jnp.float32),
            jnp.zeros((TQ, 128), jnp.int32))
    best_d, best_i = jax.lax.fori_loop(0, n_chunks, process_chunk, init)
    out_d_ref[:, :] = best_d
    out_i_ref[:, :] = best_i


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

    kernel = functools.partial(_knn_kernel, k=k, chunk=chunk, M=Mp, TQ=tq)
    out_d, out_i = pl.pallas_call(
        kernel,
        grid=(Qp // tq,),
        in_specs=[
            pl.BlockSpec((tq, 4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Mp, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Qp, 128), jnp.float32),
            jax.ShapeDtypeStruct((Qp, 128), jnp.int32),
        ],
        interpret=interpret,
    )(q4, t4)
    return out_d[:Q, :k], out_i[:Q, :k]
