"""Distributed KNN: map point banks sharded across devices.

The local map (edge/planar banks) is partitioned over the mesh's map axis;
each device streams top-k over its shard (`lmono_tpu.ops.knn`), then the
per-device candidate sets are all-gathered over ICI and reduced to the
global top-k.  Communication is O(Q·k·devices) — tiny next to the O(Q·M/d)
local work, so scaling is near-linear.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from lmono_tpu.ops.knn import knn


def sharded_knn(mesh: Mesh, query, target_sharded, mask_sharded, k: int,
                axis: str = "map"):
    """query (Q,3) replicated; target (D, M/D, 3) + mask sharded on `axis`.

    Returns (dists2 (Q,k), global idx (Q,k)) where idx indexes the
    concatenated bank (shard-major).
    """
    shard_size = target_sharded.shape[1]

    @partial(jax.shard_map, mesh=mesh, check_vma=False,
             in_specs=(P(), P(axis), P(axis)), out_specs=P(axis))
    def local_topk(q, tgt, msk):
        d2, idx = knn(q, tgt[0], msk[0], k)
        shard_id = jax.lax.axis_index(axis)
        gidx = idx + shard_id * shard_size
        return jnp.stack([d2, gidx.astype(d2.dtype)])[None]

    packed = local_topk(query, target_sharded, mask_sharded)  # (D,2,Q,k)
    d2_all = packed[:, 0].transpose(1, 0, 2).reshape(query.shape[0], -1)
    idx_all = packed[:, 1].transpose(1, 0, 2).reshape(query.shape[0], -1)
    neg, sel = jax.lax.top_k(-d2_all, k)
    gidx = jnp.take_along_axis(idx_all, sel, axis=1).astype(jnp.int32)
    return -neg, gidx
