"""Landmark-sharded window BA vs the single-device solver (8-dev CPU mesh).

The distributed solve must be numerically the *same algorithm*: same robust
weights, damping, Schur elimination and accept/reject schedule — only the
assembly of the reduced pose system is psum-reduced across shards.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmono_tpu.estimator.solver import solve_window
from lmono_tpu.parallel import make_mesh
from lmono_tpu.parallel.dist_window import (
    make_sharded_solve,
    window_shardings,
)
from lmono_tpu.utils.lie import boxminus, quat_mul, quat_normalize, so3_exp_quat

from test_window_solver import CFG, M, W1, make_problem

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _perturbed_problem():
    state, lm, T_CL = make_problem()
    key = jax.random.PRNGKey(5)
    dp = 0.1 * jax.random.normal(key, (W1, 3)).at[0].set(0.0)
    dth = 0.02 * jax.random.normal(
        jax.random.PRNGKey(6), (W1, 3)).at[0].set(0.0)
    bad = state._replace(
        t=state.t + dp,
        q=quat_normalize(quat_mul(state.q, so3_exp_quat(dth))),
        feats=state.feats._replace(
            inv_depth=state.feats.inv_depth *
            (1.0 + 0.2 * jax.random.normal(jax.random.PRNGKey(7), (M,)))),
    )
    return bad, state


def test_sharded_solve_matches_single_device():
    bad, truth = _perturbed_problem()
    cfg = CFG

    ref, ref_diag = solve_window(bad, cfg)

    mesh = make_mesh(8, axis="kf")
    solve = make_sharded_solve(mesh, cfg, axis="kf")
    bad_sh = jax.tree.map(jax.device_put, bad, window_shardings(mesh, "kf"))
    out, diag = solve(bad_sh)
    jax.block_until_ready(out)

    # identical LM trajectory: same accepted-iteration count and costs
    assert int(diag.iters) == int(ref_diag.iters)
    np.testing.assert_allclose(float(diag.cost0), float(ref_diag.cost0),
                               rtol=1e-4)
    # at convergence both costs sit at the f32 noise floor (≪ cost0);
    # compare with an absolute floor tolerance, not pure rtol
    np.testing.assert_allclose(float(diag.cost1), float(ref_diag.cost1),
                               rtol=1e-3, atol=1e-4)
    assert float(diag.cost1) < 1e-3 * float(diag.cost0)

    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t),
                               rtol=1e-4, atol=1e-4)
    q_gap = np.asarray(jnp.linalg.norm(boxminus(ref.q, out.q), axis=-1))
    assert q_gap.max() < 1e-4, q_gap
    np.testing.assert_allclose(np.asarray(out.ex_t), np.asarray(ref.ex_t),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.feats.inv_depth),
                               np.asarray(ref.feats.inv_depth),
                               rtol=1e-3, atol=1e-4)

    # and it actually solved the problem (pulls back to ground truth)
    t_err = float(jnp.max(jnp.linalg.norm(out.t - truth.t, axis=-1)))
    assert t_err < 5e-3, t_err


def test_sharded_solve_rejects_bad_tracks_divisibility():
    mesh = make_mesh(8, axis="kf")
    with pytest.raises(ValueError):
        make_sharded_solve(
            mesh, dataclasses.replace(CFG, max_tracks=50), axis="kf")
