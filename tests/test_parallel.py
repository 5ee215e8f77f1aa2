"""Multi-device tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmono_tpu.config import LidarConfig
from lmono_tpu.ops.knn import knn
from lmono_tpu.parallel import make_mesh, sharded_knn

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def test_sharded_knn_matches_single_device():
    mesh = make_mesh(8, axis="map")
    key = jax.random.PRNGKey(0)
    query = jax.random.normal(key, (32, 3)) * 5
    bank_full = jax.random.normal(jax.random.PRNGKey(1), (8 * 128, 3)) * 5
    mask_full = jax.random.bernoulli(jax.random.PRNGKey(2), 0.9, (8 * 128,))
    bank = bank_full.reshape(8, 128, 3)
    mask = mask_full.reshape(8, 128)

    d2_ref, idx_ref = knn(query, bank_full, mask_full, 5)
    d2, idx = sharded_knn(mesh, query, bank, mask, k=5, axis="map")
    np.testing.assert_allclose(np.sort(np.asarray(d2), axis=1),
                               np.sort(np.asarray(d2_ref), axis=1),
                               rtol=1e-4, atol=1e-4)
    for r in range(query.shape[0]):
        assert set(np.asarray(idx[r]).tolist()) == \
            set(np.asarray(idx_ref[r]).tolist())


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert all(np.all(np.isfinite(np.asarray(o))) for o in out)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
