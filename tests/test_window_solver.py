"""Window factor / solver / marginalization tests on synthetic geometry.

Builds an exact window problem (known trajectory, landmarks, extrinsic),
perturbs the state, and checks the GN solver pulls it back — the same
validation the reference lacks entirely (it has zero tests, SURVEY §4).
"""

import jax
import jax.numpy as jnp
import numpy as np

from lmono_tpu.config import EstimatorConfig
from lmono_tpu.estimator import factors
from lmono_tpu.estimator.feature_manager import triangulate
from lmono_tpu.estimator.marginalization import marginalize_oldest
from lmono_tpu.estimator.solver import solve_window
from lmono_tpu.estimator.window import FeatureTable, WindowState
from lmono_tpu.io.synthetic import synthetic_T_CL
from lmono_tpu.utils.lie import Pose, boxminus, quat_mul, quat_normalize, quat_rotate, quat_rotate_inv, so3_exp_quat

CFG = EstimatorConfig(window_size=6, max_tracks=48, gn_iters=10,
                      estimate_laser=1, fine_times=1000)
W1 = CFG.window_size + 1
M = CFG.max_tracks


def make_problem(key=jax.random.PRNGKey(0), noise=0.0, yaw_rate=0.02):
    """Ground-truth window: smooth forward motion + landmark cloud.

    yaw_rate controls rotational excitation: extrinsic translation is only
    observable with rotation (same physics as the reference's requirement of
    turning motion for ESTIMATE_LASER calibration).
    """
    ts = jnp.arange(W1, dtype=jnp.float32)
    t = jnp.stack([ts * 1.0, 0.02 * ts ** 2, jnp.zeros_like(ts)], -1)
    # non-constant twist: a constant-rate screw trajectory leaves an exact
    # 1-dof gauge freedom in the extrinsic (relative motions commute with
    # the screw axis), so modulate the angular velocity per frame
    q = so3_exp_quat(jnp.stack(
        [0.2 * yaw_rate * ts + 0.1 * yaw_rate * jnp.sin(1.7 * ts),
         0.5 * yaw_rate * ts - 0.2 * yaw_rate * jnp.cos(1.3 * ts),
         yaw_rate * ts + 0.3 * yaw_rate * jnp.sin(0.9 * ts)], -1))
    T_CL = synthetic_T_CL()

    # landmarks in front of the trajectory
    lm = jnp.concatenate([
        jax.random.uniform(key, (M, 1), minval=5.0, maxval=25.0),   # x ahead
        jax.random.uniform(jax.random.PRNGKey(1), (M, 2), minval=-8.0,
                           maxval=8.0),
    ], axis=-1)
    lm = lm.at[:, 2].set(lm[:, 2] * 0.3 + 1.0)

    # observations: project into each frame's camera
    def project(frame_t, frame_q, pts):
        p_l = quat_rotate_inv(frame_q, pts - frame_t)
        p_c = quat_rotate(T_CL.q, p_l) + T_CL.t
        return p_c[:, :2] / p_c[:, 2:3], p_c[:, 2]

    obs = []
    masks = []
    for i in range(W1):
        o, z = project(t[i], q[i], lm)
        ok = z > 1.0
        obs.append(o)
        masks.append(ok)
    obs = jnp.stack(obs, axis=1)          # (M, W1, 2)
    obs_mask = jnp.stack(masks, axis=1)

    # anchor = first observed frame
    anchor = jnp.argmax(obs_mask, axis=1).astype(jnp.int32)
    # inverse depth at anchor
    anchor_t = t[anchor]
    anchor_q = q[anchor]
    p_l = quat_rotate_inv(anchor_q, lm - anchor_t)
    p_c = quat_rotate(T_CL.q, p_l) + T_CL.t
    inv_depth = 1.0 / p_c[:, 2]

    feats = FeatureTable(
        ids=jnp.arange(M, dtype=jnp.int32),
        anchor=anchor,
        obs=obs, obs_mask=obs_mask,
        inv_depth=inv_depth,
        depth_ok=jnp.ones(M, bool),
        alive=jnp.ones(M, bool),
    )
    state = WindowState.init(CFG, T_CL)
    state = state._replace(
        t=t, q=q, lt=t, lq=q, feats=feats,
        count=jnp.asarray(W1, jnp.int32),
        initialized=jnp.ones((), bool),
    )
    return state, lm, T_CL


def test_residuals_zero_at_truth():
    state, lm, T_CL = make_problem()
    D = 6 * W1 + 6 + M
    r = factors.all_residuals(jnp.zeros(D), state, CFG,
                              factors.cauchy_weights(state, CFG))
    np.testing.assert_allclose(np.asarray(r), 0.0, atol=2e-2)


def test_jacobian_matches_finite_difference():
    state, _, _ = make_problem()
    D = 6 * W1 + 6 + M
    rw = factors.cauchy_weights(state, CFG)
    f = lambda d: factors.all_residuals(d, state, CFG, rw)
    J = jax.jacfwd(f)(jnp.zeros(D))
    # probe a few random directions
    key = jax.random.PRNGKey(3)
    for i in range(3):
        v = jax.random.normal(jax.random.fold_in(key, i), (D,))
        v = v / jnp.linalg.norm(v)
        eps = 1e-3
        fd = (f(eps * v) - f(-eps * v)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(J @ v), np.asarray(fd),
                                   atol=2e-1, rtol=2e-2)


def test_solver_recovers_perturbed_window():
    state, lm, T_CL = make_problem()
    true_t = state.t
    true_q = state.q
    # perturb poses (except 0: gauge) and depths
    key = jax.random.PRNGKey(5)
    dp = 0.1 * jax.random.normal(key, (W1, 3)).at[0].set(0.0)
    dth = 0.02 * jax.random.normal(jax.random.PRNGKey(6), (W1, 3)).at[0].set(0.0)
    bad = state._replace(
        t=state.t + dp,
        q=quat_normalize(quat_mul(state.q, so3_exp_quat(dth))),
        feats=state.feats._replace(
            inv_depth=state.feats.inv_depth *
            (1.0 + 0.2 * jax.random.normal(jax.random.PRNGKey(7), (M,)))),
    )
    solved, diag = solve_window(bad, CFG)
    t_err = float(jnp.max(jnp.linalg.norm(solved.t - true_t, axis=-1)))
    q_err = float(jnp.max(jnp.linalg.norm(
        boxminus(true_q, solved.q), axis=-1)))
    assert t_err < 5e-3, f"pose error {t_err}"
    assert q_err < 5e-3, f"rotation error {q_err}"
    d_err = np.abs(np.asarray(
        solved.feats.inv_depth - state.feats.inv_depth))
    # far landmarks have weak inverse-depth observability → gate the 90th pct
    assert np.percentile(d_err, 90) < 1e-2, f"depth errors {d_err.max()}"


def test_solver_refines_extrinsic():
    # rotational excitation required: T_CL translation is unobservable on a
    # straight trajectory (verified: cost→0 with wrong ex_t at yaw_rate≈0)
    state, lm, T_CL = make_problem(yaw_rate=0.15)
    # perturb the extrinsic; poses stay at truth — reprojection factors must
    # pull T_CL back (online calibration capability, ESTIMATE_LASER>=1)
    bad = state._replace(
        ex_t=state.ex_t + jnp.array([0.03, -0.02, 0.04]),
        ex_q=quat_normalize(quat_mul(
            state.ex_q, so3_exp_quat(jnp.array([0.02, -0.015, 0.01])))),
    )
    import dataclasses
    solved, _ = solve_window(bad, dataclasses.replace(CFG, gn_iters=20))
    t_err = float(jnp.linalg.norm(solved.ex_t - T_CL.t))
    q_err = float(jnp.linalg.norm(boxminus(T_CL.q, solved.ex_q)))
    assert t_err < 1e-2, f"extrinsic t error {t_err}"
    assert q_err < 3e-3, f"extrinsic q error {q_err}"


def test_triangulation_recovers_depths():
    state, lm, T_CL = make_problem()
    st0 = state._replace(feats=state.feats._replace(
        inv_depth=jnp.zeros(M), depth_ok=jnp.zeros(M, bool)))
    st1 = triangulate(st0, CFG)
    ok = np.asarray(st1.feats.depth_ok)
    assert ok.mean() > 0.7, f"triangulated {ok.mean()}"
    err = np.abs(np.asarray(st1.feats.inv_depth - state.feats.inv_depth))[ok]
    assert err.max() < 1e-2


def test_marginalization_preserves_information():
    state, _, _ = make_problem()
    prior = marginalize_oldest(state, CFG)
    assert bool(prior.valid)
    # prior must penalize deviation of (post-slide) pose 0 = old pose 1
    D = 6 * W1 + 6
    dx = jnp.zeros(D).at[0].set(0.1)   # shift new pose0 x by 0.1
    r0 = prior.r0
    r1 = prior.r0 + prior.J @ dx
    assert float(jnp.sum(r1 ** 2)) > float(jnp.sum(r0 ** 2)) + 1e-3
