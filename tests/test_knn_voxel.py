"""Tests for streaming KNN and the voxel point bank."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.ops.knn import knn
from lmono_tpu.ops.voxelmap import PointBank, bank_update


def test_knn_matches_bruteforce():
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (37, 3)) * 10
    t = jax.random.normal(jax.random.PRNGKey(1), (501, 3)) * 10
    mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.8, (501,))
    d2, idx = knn(q, t, mask, k=4, chunk=128)
    # numpy reference
    D = ((np.asarray(q)[:, None, :] - np.asarray(t)[None]) ** 2).sum(-1)
    D[:, ~np.asarray(mask)] = np.inf
    ref_idx = np.argsort(D, axis=1)[:, :4]
    ref_d = np.take_along_axis(D, ref_idx, axis=1)
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1),
                               np.sort(ref_d, axis=1), rtol=1e-4, atol=1e-4)
    # indices must agree as sets (ties may reorder)
    for i in range(q.shape[0]):
        assert set(np.asarray(idx[i]).tolist()) == set(ref_idx[i].tolist())


def test_knn_fewer_valid_than_k():
    q = jnp.zeros((3, 3))
    t = jnp.ones((10, 3))
    mask = jnp.arange(10) < 2
    d2, idx = knn(q, t, mask, k=5)
    assert np.asarray(d2)[0, 2:].min() > 1e11  # padded with _INF
    assert set(np.asarray(idx)[0, :2].tolist()) <= {0, 1}


def test_bank_dedup_and_capacity():
    bank = PointBank.empty(16)
    center = jnp.zeros(3)
    pts1 = jnp.array([[0.1, 0.1, 0.1], [2.0, 0.0, 0.0], [0.12, 0.11, 0.1]])
    b1 = bank_update(bank, pts1, jnp.ones(3, bool), 0.5, center, 50.0)
    # first and third share a voxel → 2 survive
    assert int(b1.mask.sum()) == 2
    # re-inserting the same points adds nothing
    b2 = bank_update(b1, pts1, jnp.ones(3, bool), 0.5, center, 50.0)
    assert int(b2.mask.sum()) == 2
    # old points win their voxel
    np.testing.assert_allclose(np.asarray(b2.points[0]), [0.1, 0.1, 0.1])


def test_bank_radius_eviction():
    bank = PointBank.empty(8)
    pts = jnp.array([[0.0, 0, 0], [30.0, 0, 0]])
    b = bank_update(bank, pts, jnp.ones(2, bool), 0.5, jnp.zeros(3), 10.0)
    assert int(b.mask.sum()) == 1
    np.testing.assert_allclose(np.asarray(b.points[0]), [0, 0, 0])


def test_bank_capacity_truncation_prefers_old():
    bank = PointBank.empty(4)
    old = jnp.array([[float(i) * 3, 0, 0] for i in range(4)])
    b1 = bank_update(bank, old, jnp.ones(4, bool), 0.5, jnp.zeros(3), 100.0)
    assert int(b1.mask.sum()) == 4
    new = jnp.array([[50.0, 50.0, 0]])
    b2 = bank_update(b1, new, jnp.ones(1, bool), 0.5, jnp.zeros(3), 100.0)
    # capacity 4: the new point is the one dropped
    assert int(b2.mask.sum()) == 4
    pts = np.asarray(b2.points[np.asarray(b2.mask)])
    assert not (pts == [50.0, 50.0, 0.0]).all(axis=1).any()


# --------------------------------------------------------------------------
# spatial-hash bank (the O(N) hot-path variant)
# --------------------------------------------------------------------------

from lmono_tpu.ops.voxelmap import bank_update_hash


def test_hash_bank_dedup_and_stability():
    bank = PointBank.empty(64)
    center = jnp.zeros(3)
    pts1 = jnp.array([[0.1, 0.1, 0.1], [2.0, 0.0, 0.0], [0.12, 0.11, 0.1]])
    b1 = bank_update_hash(bank, pts1, jnp.ones(3, bool), 0.5, center, 50.0)
    # first and third share a voxel → 2 survive
    assert int(b1.mask.sum()) == 2
    # re-inserting adds nothing; occupants keep their slots (stable indices)
    b2 = bank_update_hash(b1, pts1, jnp.ones(3, bool), 0.5, center, 50.0)
    assert int(b2.mask.sum()) == 2
    np.testing.assert_array_equal(np.asarray(b1.mask), np.asarray(b2.mask))
    np.testing.assert_allclose(np.asarray(b1.points), np.asarray(b2.points))


def test_hash_bank_radius_eviction_frees_slots():
    bank = PointBank.empty(64)
    pts = jnp.array([[0.0, 0, 0], [30.0, 0, 0]])
    b = bank_update_hash(bank, pts, jnp.ones(2, bool), 0.5, jnp.zeros(3), 10.0)
    assert int(b.mask.sum()) == 1
    # the far point was evicted; inserting a same-voxel point later succeeds
    b2 = bank_update_hash(b, jnp.array([[30.1, 0, 0.1]]), jnp.ones(1, bool),
                          0.5, jnp.array([30.0, 0.0, 0.0]), 10.0)
    got = np.asarray(b2.points[np.asarray(b2.mask)])
    assert (np.abs(got - [30.1, 0, 0.1]) < 1e-6).all(axis=1).any()


def test_hash_bank_masked_new_points_ignored():
    bank = PointBank.empty(32)
    pts = jnp.array([[1.0, 0, 0], [5.0, 0, 0]])
    b = bank_update_hash(bank, pts, jnp.array([True, False]), 0.5,
                         jnp.zeros(3), 50.0)
    assert int(b.mask.sum()) == 1


def test_hash_bank_world_stable_keys():
    """Slot assignment must not depend on the (moving) center."""
    bank = PointBank.empty(128)
    pts = jnp.array([[3.0, 4.0, 0.5], [-2.0, 7.0, 1.0]])
    b1 = bank_update_hash(bank, pts, jnp.ones(2, bool), 0.5,
                          jnp.zeros(3), 100.0)
    b2 = bank_update_hash(bank, pts, jnp.ones(2, bool), 0.5,
                          jnp.array([10.0, -5.0, 2.0]), 100.0)
    np.testing.assert_array_equal(np.asarray(b1.mask), np.asarray(b2.mask))
