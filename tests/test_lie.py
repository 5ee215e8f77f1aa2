"""Unit tests for SO(3)/SE(3) ops: roundtrips, composition laws, retraction."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lmono_tpu.utils import lie


def rand_quats(key, n):
    q = jax.random.normal(key, (n, 4))
    return lie.quat_normalize(q)


def test_quat_mul_matches_matmul():
    key = jax.random.PRNGKey(0)
    qa, qb = rand_quats(key, 8), rand_quats(jax.random.PRNGKey(1), 8)
    Rab = lie.quat_to_mat(lie.quat_mul(qa, qb))
    RaRb = lie.quat_to_mat(qa) @ lie.quat_to_mat(qb)
    np.testing.assert_allclose(Rab, RaRb, atol=1e-5)


def test_quat_rotate_matches_matmul():
    key = jax.random.PRNGKey(2)
    q = rand_quats(key, 16)
    v = jax.random.normal(jax.random.PRNGKey(3), (16, 3))
    np.testing.assert_allclose(
        lie.quat_rotate(q, v),
        jnp.einsum("nij,nj->ni", lie.quat_to_mat(q), v),
        atol=1e-5,
    )


def test_mat_quat_roundtrip():
    # include near-degenerate cases: identity, 180-degree rotations
    thetas = jnp.concatenate([
        jax.random.normal(jax.random.PRNGKey(4), (32, 3)),
        jnp.array([[0., 0., 0.], [np.pi, 0, 0], [0, np.pi, 0], [0, 0, np.pi],
                   [np.pi * 0.999, 0, 0.001]]),
    ])
    q = lie.so3_exp_quat(thetas)
    q2 = lie.mat_to_quat(lie.quat_to_mat(q))
    # compare rotations, not quaternion signs
    np.testing.assert_allclose(lie.quat_to_mat(q2), lie.quat_to_mat(q), atol=1e-5)


def test_exp_log_roundtrip():
    thetas = jnp.concatenate([
        0.5 * jax.random.normal(jax.random.PRNGKey(5), (32, 3)),
        jnp.array([[1e-9, 0, 0], [0., 0., 0.], [2.0, 1.0, -0.5]]),
    ])
    out = lie.so3_log_quat(lie.so3_exp_quat(thetas))
    np.testing.assert_allclose(out, thetas, atol=1e-5)


def test_boxplus_boxminus():
    q = rand_quats(jax.random.PRNGKey(6), 8)
    d = 0.3 * jax.random.normal(jax.random.PRNGKey(7), (8, 3))
    np.testing.assert_allclose(lie.boxminus(q, lie.boxplus(q, d)), d, atol=1e-5)


def test_boxplus_derivative_is_identity_at_zero():
    """d/d(dθ) boxminus(q, boxplus(q, dθ)) at 0 == I (local parameterization)."""
    q = rand_quats(jax.random.PRNGKey(8), 1)[0]

    def f(d):
        return lie.boxminus(q, lie.boxplus(q, d))

    J = jax.jacfwd(f)(jnp.zeros(3))
    np.testing.assert_allclose(J, np.eye(3), atol=1e-4)


def test_ypr_roundtrip():
    ypr = jnp.array([[0.3, -0.2, 0.1], [1.5, 0.0, -1.0], [-2.0, 0.4, 2.5]])
    np.testing.assert_allclose(lie.mat_to_ypr(lie.ypr_to_mat(ypr)), ypr, atol=1e-5)


def test_pose_compose_inverse():
    key = jax.random.PRNGKey(9)
    pa = lie.Pose(jax.random.normal(key, (5, 3)), rand_quats(jax.random.PRNGKey(10), 5))
    pb = lie.Pose(jax.random.normal(jax.random.PRNGKey(11), (5, 3)),
                  rand_quats(jax.random.PRNGKey(12), 5))
    pts = jax.random.normal(jax.random.PRNGKey(13), (5, 3))
    # (pa∘pb)(x) == pa(pb(x))
    np.testing.assert_allclose(
        pa.compose(pb).apply(pts), pa.apply(pb.apply(pts)), atol=1e-5)
    # inverse
    ident = pa.compose(pa.inverse())
    np.testing.assert_allclose(ident.apply(pts), pts, atol=1e-4)
    # between: pa ∘ (pa.between(pb)) == pb
    np.testing.assert_allclose(
        pa.compose(pa.between(pb)).apply(pts), pb.apply(pts), atol=1e-4)


def test_pose_mat4_roundtrip():
    p = lie.Pose(jnp.array([1.0, -2.0, 3.0]),
                 lie.so3_exp_quat(jnp.array([0.2, -0.5, 1.0])))
    p2 = lie.Pose.from_mat4(p.to_mat4())
    pts = jax.random.normal(jax.random.PRNGKey(14), (7, 3))
    np.testing.assert_allclose(p2.apply(pts), p.apply(pts), atol=1e-5)


def test_pose_retract_local_roundtrip():
    p = lie.Pose(jnp.array([1.0, 2.0, 3.0]),
                 lie.so3_exp_quat(jnp.array([0.1, 0.2, -0.3])))
    d = jnp.array([0.5, -0.2, 0.1, 0.05, -0.1, 0.2])
    np.testing.assert_allclose(p.local(p.retract(d)), d, atol=1e-5)


def test_pose_slerp_endpoints():
    p0 = lie.Pose(jnp.zeros(3), lie.quat_identity())
    p1 = lie.Pose(jnp.array([1.0, 0, 0]), lie.so3_exp_quat(jnp.array([0, 0, 1.0])))
    mid = lie.pose_slerp(p0, p1, 0.5)
    np.testing.assert_allclose(mid.t, jnp.array([0.5, 0, 0]), atol=1e-6)
    np.testing.assert_allclose(
        lie.so3_log_quat(mid.q), jnp.array([0, 0, 0.5]), atol=1e-5)


def test_skew():
    v = jnp.array([1.0, 2.0, 3.0])
    w = jnp.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(lie.skew(v) @ w, jnp.cross(v, w), atol=1e-6)


def test_jit_vmap_safety():
    f = jax.jit(jax.vmap(lambda t: lie.so3_log_quat(lie.so3_exp_quat(t))))
    x = jax.random.normal(jax.random.PRNGKey(15), (64, 3))
    np.testing.assert_allclose(f(x), x, atol=1e-4)
