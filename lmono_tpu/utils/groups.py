"""SO(2)/SE(2)/Sim(3) Lie-group operations (batched, jit/vmap/grad-safe).

Completes the Lie-group surface the reference vendors via Sophus
(`mono_lidar_mapping/include/3rdparty/sophus/{so2,se2,sim3}.hpp`) — lmono's
own code only exercises SO(3)/SE(3) (covered by `lmono_tpu.utils.lie`), but
the vendored library ships the 2D groups and Sim(3), so the rebuilt
framework provides them too (Sim(3) is also what a scale-drift-aware
mono pose graph optimizes over).

Conventions match `lmono_tpu.utils.lie`: Hamilton quaternions ``(w,x,y,z)``,
right (local-frame) perturbations, Taylor-guarded small-angle branches via
``jnp.where`` with safe denominators (both branches are always computed under
jit, so every division is shielded).

Tangent layouts:
* se2: ``(vx, vy, theta)`` (translation first, as Sophus `se2.hpp`)
* sim3: ``(rho[3], phi[3], sigma)`` — translation, rotation, log-scale
  (Sophus `sim3.hpp` / RxSO3 ordering).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.utils.lie import (
    quat_conj,
    quat_mul,
    quat_normalize,
    quat_rotate,
    quat_to_mat,
    skew,
    so3_exp_quat,
    so3_log_quat,
)

_EPS = 1e-6


def _safe(x: jax.Array, eps: float = _EPS) -> jax.Array:
    """Magnitude-clamped denominator (keeps sign, never < eps)."""
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


# --------------------------------------------------------------------------
# SO(2)
# --------------------------------------------------------------------------

def so2_exp(theta: jax.Array) -> jax.Array:
    """Angle → 2x2 rotation matrix (batched over leading dims)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def so2_log(R: jax.Array) -> jax.Array:
    """2x2 rotation matrix → angle in (-pi, pi]."""
    return jnp.arctan2(R[..., 1, 0], R[..., 0, 0])


# --------------------------------------------------------------------------
# SE(2)
# --------------------------------------------------------------------------

class SE2(NamedTuple):
    """Planar rigid transform: ``x_out = R(theta) @ x + t`` (batched)."""

    t: jax.Array      # (..., 2)
    theta: jax.Array  # (...,)

    @staticmethod
    def identity(dtype=jnp.float32) -> "SE2":
        return SE2(jnp.zeros(2, dtype), jnp.zeros((), dtype))

    def matrix(self) -> jax.Array:
        R = so2_exp(self.theta)
        top = jnp.concatenate([R, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 3)
        )
        return jnp.concatenate([top, bottom], axis=-2)

    def apply(self, x: jax.Array) -> jax.Array:
        R = so2_exp(self.theta)
        return jnp.einsum("...ij,...j->...i", R, x) + self.t

    def compose(self, other: "SE2") -> "SE2":
        R = so2_exp(self.theta)
        return SE2(
            jnp.einsum("...ij,...j->...i", R, other.t) + self.t,
            self.theta + other.theta,
        )

    def inverse(self) -> "SE2":
        Rinv = so2_exp(-self.theta)
        return SE2(-jnp.einsum("...ij,...j->...i", Rinv, self.t), -self.theta)


def _se2_V(theta: jax.Array) -> jax.Array:
    """Left Jacobian of SO(2) lifted to the SE(2) translation block."""
    th = _safe(theta)
    a = jnp.where(jnp.abs(theta) < _EPS, 1.0 - theta * theta / 6.0,
                  jnp.sin(th) / th)
    b = jnp.where(jnp.abs(theta) < _EPS, theta / 2.0,
                  (1.0 - jnp.cos(th)) / th)
    row0 = jnp.stack([a, -b], axis=-1)
    row1 = jnp.stack([b, a], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def se2_exp(xi: jax.Array) -> SE2:
    """Tangent ``(vx, vy, theta)`` → SE2 via the closed-form V matrix."""
    v, theta = xi[..., :2], xi[..., 2]
    V = _se2_V(theta)
    return SE2(jnp.einsum("...ij,...j->...i", V, v), theta)


def se2_log(g: SE2) -> jax.Array:
    # principal branch: SE2.theta is unbounded (compose adds angles), but
    # V(θ) is singular at θ = ±2π — wrap to (-π, π] first, matching the
    # vendored Sophus se2.hpp semantics (always returns the principal angle).
    theta = jnp.arctan2(jnp.sin(g.theta), jnp.cos(g.theta))
    V = _se2_V(theta)
    # V is 2x2: invert in closed form.
    det = V[..., 0, 0] * V[..., 1, 1] - V[..., 0, 1] * V[..., 1, 0]
    inv00 = V[..., 1, 1] / det
    inv11 = V[..., 0, 0] / det
    inv01 = -V[..., 0, 1] / det
    inv10 = -V[..., 1, 0] / det
    vx = inv00 * g.t[..., 0] + inv01 * g.t[..., 1]
    vy = inv10 * g.t[..., 0] + inv11 * g.t[..., 1]
    return jnp.stack([vx, vy, theta], axis=-1)


# --------------------------------------------------------------------------
# Sim(3)
# --------------------------------------------------------------------------

class Sim3(NamedTuple):
    """Similarity transform: ``x_out = s * R(q) @ x + t`` (batched)."""

    q: jax.Array  # (..., 4) unit quaternion (w,x,y,z)
    t: jax.Array  # (..., 3)
    s: jax.Array  # (...,) positive scale

    @staticmethod
    def identity(dtype=jnp.float32) -> "Sim3":
        return Sim3(
            jnp.array([1.0, 0.0, 0.0, 0.0], dtype),
            jnp.zeros(3, dtype),
            jnp.ones((), dtype),
        )

    def matrix(self) -> jax.Array:
        """4x4 homogeneous matrix with sR upper-left block."""
        sR = self.s[..., None, None] * quat_to_mat(self.q)
        top = jnp.concatenate([sR, self.t[..., :, None]], axis=-1)
        bottom = jnp.broadcast_to(
            jnp.array([0.0, 0.0, 0.0, 1.0], dtype=top.dtype),
            top.shape[:-2] + (1, 4),
        )
        return jnp.concatenate([top, bottom], axis=-2)

    def apply(self, x: jax.Array) -> jax.Array:
        return self.s[..., None] * quat_rotate(self.q, x) + self.t

    def compose(self, other: "Sim3") -> "Sim3":
        return Sim3(
            quat_normalize(quat_mul(self.q, other.q)),
            self.s[..., None] * quat_rotate(self.q, other.t) + self.t,
            self.s * other.s,
        )

    def inverse(self) -> "Sim3":
        qinv = quat_conj(self.q)
        sinv = 1.0 / self.s
        return Sim3(qinv, -sinv[..., None] * quat_rotate(qinv, self.t), sinv)


def _sim3_W(phi: jax.Array, sigma: jax.Array) -> jax.Array:
    """The Sim(3) translation mixer: ``t = W @ rho`` in exp (Strasdat's W).

    Closed form with four regimes (sigma→0 × theta→0) selected by
    ``jnp.where`` over safe denominators.
    """
    theta = jnp.linalg.norm(phi, axis=-1)
    Om = skew(phi)
    Om2 = jnp.einsum("...ij,...jk->...ik", Om, Om)
    s = jnp.exp(sigma)

    th = _safe(theta)
    sig = _safe(sigma)
    small_th = theta < _EPS
    small_sig = jnp.abs(sigma) < _EPS

    # sigma ≈ 0 branch
    A0 = jnp.where(small_th, 0.5 - theta * theta / 24.0,
                   (1.0 - jnp.cos(th)) / (th * th))
    B0 = jnp.where(small_th, 1.0 / 6.0 - theta * theta / 120.0,
                   (th - jnp.sin(th)) / (th * th * th))
    C0 = jnp.ones_like(sigma)

    # sigma != 0 branch
    C1 = (s - 1.0) / sig
    a = s * jnp.sin(th)
    b = s * jnp.cos(th)
    c = th * th + sigma * sigma
    A1_big = (a * sigma + (1.0 - b) * th) / (th * c)
    B1_big = (C1 - ((b - 1.0) * sigma + a * th) / c) / (th * th)
    A1_small = ((sigma - 1.0) * s + 1.0) / (sig * sig)
    B1_small = ((0.5 * sigma * sigma - sigma + 1.0) * s - 1.0) / (sig ** 3)
    A1 = jnp.where(small_th, A1_small, A1_big)
    B1 = jnp.where(small_th, B1_small, B1_big)

    A = jnp.where(small_sig, A0, A1)
    B = jnp.where(small_sig, B0, B1)
    C = jnp.where(small_sig, C0, C1)

    eye = jnp.eye(3, dtype=phi.dtype)
    return (A[..., None, None] * Om + B[..., None, None] * Om2
            + C[..., None, None] * eye)


def sim3_exp(xi: jax.Array) -> Sim3:
    """Tangent ``(rho[3], phi[3], sigma)`` → Sim3."""
    rho, phi, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    q = so3_exp_quat(phi)
    W = _sim3_W(phi, sigma)
    return Sim3(q, jnp.einsum("...ij,...j->...i", W, rho), jnp.exp(sigma))


def sim3_log(g: Sim3) -> jax.Array:
    phi = so3_log_quat(g.q)
    sigma = jnp.log(g.s)
    W = _sim3_W(phi, sigma)
    rho = jnp.linalg.solve(W, g.t[..., :, None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], axis=-1)
