"""Fixed-capacity voxel-deduplicated point banks (the TPU 'KD-tree + voxel
filter' replacement).

The reference stack's local map lives in PCL KD-trees rebuilt per frame by
A-LOAM; here the map is a fixed-shape (capacity, 3) masked array.  Updates
are pure array ops: exact 30-bit voxel keys, a lexsort-based first-occupant
dedup, radius-based eviction, and a stable compaction — all jit-safe, no
host interaction, O(N log N) on the VPU.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PointBank(NamedTuple):
    points: jax.Array  # (capacity, 3) world frame
    mask: jax.Array    # (capacity,) bool

    @staticmethod
    def empty(capacity: int, dtype=jnp.float32) -> "PointBank":
        return PointBank(jnp.zeros((capacity, 3), dtype),
                         jnp.zeros((capacity,), bool))

    @property
    def capacity(self) -> int:
        return self.points.shape[0]


def _voxel_keys(pts: jax.Array, voxel: float, origin: jax.Array) -> jax.Array:
    """Exact packed voxel id: 10 bits per axis around `origin` (int32).

    Points outside the ±511-voxel cube clamp to the boundary cell — they are
    evicted by the radius gate anyway for sane voxel/radius configs.
    """
    ij = jnp.floor((pts - origin) / voxel).astype(jnp.int32)
    ij = jnp.clip(ij + 512, 0, 1023)
    return (ij[:, 0] << 20) | (ij[:, 1] << 10) | ij[:, 2]


def bank_update(bank: PointBank, new_pts: jax.Array, new_mask: jax.Array,
                voxel: float, center: jax.Array,
                keep_radius: float) -> PointBank:
    """Merge new points into the bank with voxel dedup + radius eviction.

    Existing bank points win their voxel (map stability, as LOAM's voxel
    filter effectively does); the result is compacted to the front and
    truncated at capacity, preferring older points.
    """
    cap = bank.capacity
    pts = jnp.concatenate([bank.points, new_pts], axis=0)
    mask = jnp.concatenate([bank.mask, new_mask], axis=0)
    # radius eviction relative to the current pose
    d2 = jnp.sum((pts - center) ** 2, axis=-1)
    mask = mask & (d2 < keep_radius * keep_radius)

    keys = _voxel_keys(pts, voxel, center)
    # invalid entries get a sentinel key that sorts last
    keys = jnp.where(mask, keys, jnp.int32(2 ** 30))
    # stable sort by key keeps bank-before-new within equal keys
    order = jnp.argsort(keys, stable=True)
    k_sorted = keys[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), k_sorted[1:] != k_sorted[:-1]])
    keep = first & (k_sorted < 2 ** 30)
    # map the keep decision back to original (age) order so that capacity
    # truncation drops the newest points, not a spatial chunk of key space
    n = pts.shape[0]
    keep_orig = jnp.zeros((n,), bool).at[order].set(keep)
    rank = jnp.cumsum(keep_orig) - 1
    dest = jnp.where(keep_orig, rank, n - 1)
    out_pts = jnp.zeros((n, 3), pts.dtype).at[dest].set(pts, mode="drop")
    out_msk = jnp.zeros((n,), bool).at[dest].set(keep_orig, mode="drop")
    # the overflow slot n-1 collects all dropped writes; gate by true count
    n_keep = jnp.sum(keep_orig)
    out_msk = out_msk & (jnp.arange(n) < n_keep)
    return PointBank(out_pts[:cap], out_msk[:cap])


# --------------------------------------------------------------------------
# O(N) spatial-hash variant (the hot-path map for odometry)
# --------------------------------------------------------------------------

_HP = (73856093, 19349663, 83492791)   # classic spatial-hash primes


def _hash_slots(pts: jax.Array, voxel: float, capacity: int) -> jax.Array:
    """World-stable voxel hash slot per point (no origin, no range limit)."""
    ijk = jnp.floor(pts / voxel).astype(jnp.int32)
    h = (ijk[:, 0] * _HP[0]) ^ (ijk[:, 1] * _HP[1]) ^ (ijk[:, 2] * _HP[2])
    return (h & 0x7FFFFFFF) % capacity


def bank_update_hash(bank: PointBank, new_pts: jax.Array, new_mask: jax.Array,
                     voxel: float, center: jax.Array,
                     keep_radius: float, axis: str | None = None) -> PointBank:
    """O(N) scatter-based merge: each voxel hashes to one bank slot.

    Semantics vs `bank_update` (the sort-based exact dedup):
      * existing points still win their voxel (slot occupancy blocks writes);
      * hash collisions (different voxels, same slot) drop the newcomer —
        a bounded, graceful quality loss instead of an O(N log N) argsort;
      * contested slots (several new points, one slot, one frame) go to the
        lowest point index — deterministic, so sharded and single-device
        banks are bitwise identical;
      * point indices are stable across frames (good for correspondence
        caching), and there is no compaction pass.
    ~8× cheaper than the sort path on TPU; this is what the per-frame
    odometry uses (`LidarConfig.map_update == "hash"`).

    axis: inside `shard_map`, shard the global slot space over this mesh
    axis — device d owns global slots [d·C, (d+1)·C) of the C·axis_size
    space; `new_pts` is the full (replicated) frame and each device keeps
    only the writes landing in its range.  Concatenating the shards
    reproduces the single-device bank exactly.
    """
    C = bank.capacity
    r2 = keep_radius * keep_radius
    d2 = jnp.sum((bank.points - center) ** 2, axis=-1)
    mask = bank.mask & (d2 < r2)
    nd2 = jnp.sum((new_pts - center) ** 2, axis=-1)
    new_mask = new_mask & (nd2 < r2)

    if axis is None:
        slots = _hash_slots(new_pts, voxel, C)
    else:
        slots = _hash_slots(new_pts, voxel, C * jax.lax.axis_size(axis))
        my = jax.lax.axis_index(axis)
        new_mask = new_mask & ((slots // C) == my)
        slots = jnp.clip(slots - my * C, 0, C - 1)
    occupied = mask[slots]
    write = new_mask & ~occupied
    n = new_pts.shape[0]
    dest = jnp.where(write, slots, C)          # C = out-of-range ⇒ dropped
    winner = jnp.full((C,), n, jnp.int32).at[dest].min(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    won = winner < n
    widx = jnp.clip(winner, 0, n - 1)
    pts = jnp.where(won[:, None], new_pts[widx], bank.points)
    msk = mask | won
    return PointBank(pts, msk)
