"""Parity test: Pallas streaming KNN vs the reference knn (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.ops.knn import knn
from lmono_tpu.ops.pallas.knn import knn_pallas


def test_pallas_knn_matches_reference():
    key = jax.random.PRNGKey(0)
    Q, M, k = 70, 300, 5
    q = jax.random.normal(key, (Q, 3)) * 10
    t = jax.random.normal(jax.random.PRNGKey(1), (M, 3)) * 10
    mask = jax.random.bernoulli(jax.random.PRNGKey(2), 0.85, (M,))

    d_ref, i_ref = knn(q, t, mask, k)
    d_p, i_p = knn_pallas(q, t, mask, k=k, chunk=128, tq=8, interpret=True)

    np.testing.assert_allclose(np.sort(np.asarray(d_p), 1),
                               np.sort(np.asarray(d_ref), 1),
                               rtol=1e-4, atol=1e-3)
    for r in range(Q):
        assert set(np.asarray(i_p[r]).tolist()) == \
            set(np.asarray(i_ref[r]).tolist()), r


def test_pallas_knn_sorted_and_masked():
    q = jnp.zeros((3, 3))
    t = jnp.arange(30, dtype=jnp.float32).reshape(10, 3)
    mask = jnp.arange(10) < 4
    d, i = knn_pallas(q, t, mask, k=5, chunk=8, tq=8, interpret=True)
    d = np.asarray(d)
    # sorted ascending, trailing entries padded with inf-like sentinels
    assert (np.diff(d[0]) >= -1e-3).all()
    assert d[0, 4] > 1e11  # only 4 valid targets
    assert set(np.asarray(i)[0, :4].tolist()) == {0, 1, 2, 3}
