"""SO(3)/SE(3) Lie-group operations on quaternions and rotation matrices.

TPU-native replacement for the reference's quaternion helpers
(`mono_lidar_mapping/include/utils/math_utils.h:116-264`) and the Ceres
`PoseLocalParameterization` (`src/factor/PoseLocalParameterization.cc:15-40`).

Conventions
-----------
* Quaternions are Hamilton, stored ``(w, x, y, z)``, unit-norm.
* ``boxplus(q, dtheta)`` applies a *right* (local-frame) perturbation
  ``q ⊗ exp(dtheta/2)`` — the same ⊞ the reference uses for its pose blocks,
  so factor Jacobians match the VINS-style local parameterization.
* All functions broadcast over arbitrary leading batch dimensions and are
  jit/vmap/grad-safe (no data-dependent control flow; small-angle branches
  use `jnp.where` with Taylor guards).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

_EPS = 1e-8


# --------------------------------------------------------------------------
# Quaternion primitives
# --------------------------------------------------------------------------

def quat_identity(dtype=jnp.float32) -> jax.Array:
    return jnp.array([1.0, 0.0, 0.0, 0.0], dtype=dtype)


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_positify(q: jax.Array) -> jax.Array:
    """Flip sign so the scalar part is non-negative (reference `positify`)."""
    return jnp.where(q[..., :1] < 0.0, -q, q)


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_mul(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b, broadcasting over leading dims."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v by quaternion(s) q: R(q) @ v."""
    qw = q[..., :1]
    qv = q[..., 1:]
    t = 2.0 * jnp.cross(qv, v)
    return v + qw * t + jnp.cross(qv, t)


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """Unit quaternion → 3x3 rotation matrix (batched)."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """3x3 rotation matrix → unit quaternion (w,x,y,z), branch-free Shepperd.

    Computes all four candidate quaternions and selects the best-conditioned
    one with `where` — safe under vmap/jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates, each scaled by 4*q_i^2 >= 0.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    # Pick candidate with the largest pivot.
    pivots = jnp.stack([1.0 + tr, 1.0 + m00 - m11 - m22,
                        1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22], axis=-1)
    idx = jnp.argmax(pivots, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 candidates, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q.squeeze(-2)
    return quat_positify(quat_normalize(q))


# --------------------------------------------------------------------------
# exp / log maps
# --------------------------------------------------------------------------

def so3_exp_quat(theta: jax.Array) -> jax.Array:
    """Axis-angle vector (3,) → unit quaternion exp(theta/2)."""
    angle2 = jnp.sum(theta * theta, axis=-1, keepdims=True)
    angle = jnp.sqrt(angle2 + _EPS * _EPS)
    half = 0.5 * angle
    # sinc-style guard: sin(half)/angle ≈ 0.5 - angle^2/48 for small angle
    small = angle2 < 1e-8
    k = jnp.where(small, 0.5 - angle2 / 48.0, jnp.sin(half) / angle)
    w = jnp.where(small, 1.0 - angle2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w, k * theta], axis=-1)


def so3_log_quat(q: jax.Array) -> jax.Array:
    """Unit quaternion → axis-angle vector (inverse of so3_exp_quat)."""
    q = quat_positify(q)
    w = q[..., :1]
    v = q[..., 1:]
    vn2 = jnp.sum(v * v, axis=-1, keepdims=True)
    vn = jnp.sqrt(vn2 + _EPS * _EPS)
    angle = 2.0 * jnp.arctan2(vn, w)
    small = vn2 < 1e-10
    k = jnp.where(small, 2.0 / jnp.maximum(w, _EPS), angle / vn)
    return k * v


def so3_exp_mat(theta: jax.Array) -> jax.Array:
    return quat_to_mat(so3_exp_quat(theta))


def so3_log_mat(m: jax.Array) -> jax.Array:
    return so3_log_quat(mat_to_quat(m))


def skew(v: jax.Array) -> jax.Array:
    """Skew-symmetric matrix [v]_x (reference `SkewSymmetric`)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def boxplus(q: jax.Array, dtheta: jax.Array) -> jax.Array:
    """Right-perturbation retraction q ⊞ dθ = q ⊗ exp(dθ/2)."""
    return quat_normalize(quat_mul(q, so3_exp_quat(dtheta)))


def boxminus(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Local difference q2 ⊟ q1 = log(q1⁻¹ ⊗ q2)."""
    return so3_log_quat(quat_mul(quat_conj(q1), q2))


# --------------------------------------------------------------------------
# Euler helpers (for the 4-DoF pose graph; reference `R2ypr` / `ypr2R`)
# --------------------------------------------------------------------------

def mat_to_ypr(m: jax.Array) -> jax.Array:
    """Rotation matrix → (yaw, pitch, roll) in radians (ZYX)."""
    yaw = jnp.arctan2(m[..., 1, 0], m[..., 0, 0])
    pitch = jnp.arctan2(-m[..., 2, 0],
                        jnp.sqrt(m[..., 2, 1] ** 2 + m[..., 2, 2] ** 2))
    roll = jnp.arctan2(m[..., 2, 1], m[..., 2, 2])
    return jnp.stack([yaw, pitch, roll], axis=-1)


def ypr_to_mat(ypr: jax.Array) -> jax.Array:
    """(yaw, pitch, roll) radians → rotation matrix Rz(y) Ry(p) Rx(r)."""
    y, p, r = ypr[..., 0], ypr[..., 1], ypr[..., 2]
    cy, sy = jnp.cos(y), jnp.sin(y)
    cp, sp = jnp.cos(p), jnp.sin(p)
    cr, sr = jnp.cos(r), jnp.sin(r)
    m = jnp.stack(
        [
            cy * cp, cy * sp * sr - sy * cr, cy * sp * cr + sy * sr,
            sy * cp, sy * sp * sr + cy * cr, sy * sp * cr - cy * sr,
            -sp, cp * sr, cp * cr,
        ],
        axis=-1,
    )
    return m.reshape(ypr.shape[:-1] + (3, 3))


# --------------------------------------------------------------------------
# Pose (SE(3)) value type — replaces the reference's `lclio::Twist`
# --------------------------------------------------------------------------

class Pose(NamedTuple):
    """Rigid transform: x_world = R(q) @ x_local + t.  Pytree-compatible."""

    t: jax.Array  # (..., 3)
    q: jax.Array  # (..., 4) unit (w,x,y,z)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "Pose":
        t = jnp.zeros(batch_shape + (3,), dtype)
        q = jnp.broadcast_to(quat_identity(dtype), batch_shape + (4,))
        return Pose(t, q)

    @staticmethod
    def from_mat4(m: jax.Array) -> "Pose":
        return Pose(m[..., :3, 3], mat_to_quat(m[..., :3, :3]))

    @staticmethod
    def from_Rt(R: jax.Array, t: jax.Array) -> "Pose":
        return Pose(t, mat_to_quat(R))

    def to_mat4(self) -> jax.Array:
        R = quat_to_mat(self.q)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=self.t.dtype),
            self.t.shape[:-1] + (1, 4),
        )
        return jnp.concatenate([top, bottom], axis=-2)

    @property
    def R(self) -> jax.Array:
        return quat_to_mat(self.q)

    def compose(self, other: "Pose") -> "Pose":
        """self ∘ other: apply `other` first, then `self`."""
        return Pose(self.t + quat_rotate(self.q, other.t),
                    quat_normalize(quat_mul(self.q, other.q)))

    def inverse(self) -> "Pose":
        qinv = quat_conj(self.q)
        return Pose(-quat_rotate(qinv, self.t), qinv)

    def apply(self, pts: jax.Array) -> jax.Array:
        """Transform points (..., 3)."""
        return quat_rotate(self.q, pts) + self.t

    def apply_inv(self, pts: jax.Array) -> jax.Array:
        return quat_rotate_inv(self.q, pts - self.t)

    def between(self, other: "Pose") -> "Pose":
        """Relative transform self⁻¹ ∘ other."""
        return self.inverse().compose(other)

    def retract(self, delta: jax.Array) -> "Pose":
        """⊞ with 6-vector delta = (dp[3], dθ[3]): t+dp, q⊗exp(dθ/2).

        Matches the reference's PoseLocalParameterization::Plus
        (global translation increment, local rotation increment).
        """
        return Pose(self.t + delta[..., :3], boxplus(self.q, delta[..., 3:6]))

    def local(self, other: "Pose") -> jax.Array:
        """6-vector such that (approximately) self.retract(v) == other."""
        return jnp.concatenate(
            [other.t - self.t, boxminus(self.q, other.q)], axis=-1)


def pose_stack(poses: list) -> Pose:
    return Pose(jnp.stack([p.t for p in poses]), jnp.stack([p.q for p in poses]))


def pose_slerp(p0: Pose, p1: Pose, alpha) -> Pose:
    """Linear/slerp interpolation between two poses (for timestamp alignment)."""
    alpha = jnp.asarray(alpha)
    t = p0.t + alpha[..., None] * (p1.t - p0.t)
    dq = quat_mul(quat_conj(p0.q), p1.q)
    q = quat_mul(p0.q, so3_exp_quat(alpha[..., None] * so3_log_quat(dq)))
    return Pose(t, quat_normalize(q))
