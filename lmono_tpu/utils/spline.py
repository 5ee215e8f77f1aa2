"""Splines: natural cubic interpolation and cumulative SE(3) B-splines.

Rebuilds the reference's `camera_models/src/gpl/` spline utility surface
(camodocal ships a generic cubic `Spline` class used by its calibration
tooling) the TPU way: coefficient solves are batched linear algebra, and
evaluation is gather + polynomial — no per-knot Python loops, so both jit
and vmap cleanly.

The cumulative SE(3) B-spline (`pose_bspline_eval`) is the pose-trajectory
analogue (Lovegrove-style cumulative form on our quaternion poses): useful
for continuous-time resampling of the fused trajectory, which the reference
can only output at frame timestamps (`Estimator.cc:642-644`).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lmono_tpu.utils.lie import Pose, boxplus, quat_conj, quat_mul, so3_log_quat


class CubicSpline(NamedTuple):
    """Natural cubic spline y(x) through knots (x strictly increasing)."""

    x: jax.Array   # (N,)
    y: jax.Array   # (N, ...) values (trailing dims broadcast)
    m: jax.Array   # (N, ...) second derivatives at the knots


def _thomas_solve(lower: jax.Array, main: jax.Array, upper: jax.Array,
                  d: jax.Array) -> jax.Array:
    """Tridiagonal solve (Thomas algorithm) via two `lax.scan` sweeps.

    O(N) work / O(N) memory instead of materializing the dense matrix —
    the system here (natural cubic spline) is diagonally dominant, so no
    pivoting is needed.  lower[0] and upper[-1] are ignored.
    """
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        lo, mi, up, di = inp
        denom = mi - lo * cp_prev
        cp = up / denom
        dp = (di - lo * dp_prev) / denom
        return (cp, dp), (cp, dp)

    zeros_d = jnp.zeros_like(d[0])
    _, (cp, dp) = jax.lax.scan(
        fwd, (jnp.zeros_like(main[0]), zeros_d), (lower, main, upper, d))

    def bwd(x_next, inp):
        cpi, dpi = inp
        x = dpi - cpi * x_next
        return x, x

    _, xs = jax.lax.scan(bwd, zeros_d, (cp, dp), reverse=True)
    return xs


def cubic_spline_fit(x: jax.Array, y: jax.Array) -> CubicSpline:
    """Solve the natural-spline tridiagonal system for knot curvatures."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    N = x.shape[0]
    h = x[1:] - x[:-1]                       # (N-1,)
    yf = y.reshape(N, -1)                    # flatten value dims
    d = 6.0 * ((yf[2:] - yf[1:-1]) / h[1:, None]
               - (yf[1:-1] - yf[:-2]) / h[:-1, None])   # (N-2, D)
    # Tridiagonal system A m_inner = d with natural BCs m_0 = m_{N-1} = 0,
    # solved by the Thomas algorithm (O(N), no dense matrix).
    main = 2.0 * (h[:-1] + h[1:])
    lower = jnp.concatenate([jnp.zeros((1,), h.dtype), h[1:-1]])
    upper = jnp.concatenate([h[1:-1], jnp.zeros((1,), h.dtype)])
    m_inner = _thomas_solve(lower[:, None], main[:, None],
                            upper[:, None], d)
    zeros = jnp.zeros((1, yf.shape[1]), yf.dtype)
    m = jnp.concatenate([zeros, m_inner, zeros], axis=0)
    return CubicSpline(x, y, m.reshape(y.shape))


def cubic_spline_eval(sp: CubicSpline, xq: jax.Array) -> jax.Array:
    """Evaluate the spline at query points (clamped to the knot range)."""
    x, y, m = sp.x, sp.y, sp.m
    N = x.shape[0]
    xq = jnp.clip(xq, x[0], x[-1])
    i = jnp.clip(jnp.searchsorted(x, xq, side="right") - 1, 0, N - 2)
    x0, x1 = x[i], x[i + 1]
    h = x1 - x0
    t0 = (x1 - xq) / h
    t1 = (xq - x0) / h
    y0, y1 = y[i], y[i + 1]
    m0, m1 = m[i], m[i + 1]
    # Broadcast scalars over trailing value dims.
    extra = (1,) * (y.ndim - 1)
    t0e = t0.reshape(t0.shape + extra)
    t1e = t1.reshape(t1.shape + extra)
    he = h.reshape(h.shape + extra)
    return (t0e * y0 + t1e * y1
            + ((t0e ** 3 - t0e) * m0 + (t1e ** 3 - t1e) * m1) * (he ** 2) / 6.0)


# --------------------------------------------------------------------------
# Cumulative SE(3) B-spline
# --------------------------------------------------------------------------

# Cumulative cubic B-spline basis: Btilde(u) = C @ [1, u, u², u³]ᵀ rows 1..3.
_CUM_C = jnp.array(
    [
        [5.0, 3.0, -3.0, 1.0],
        [1.0, 3.0, 3.0, -2.0],
        [0.0, 0.0, 0.0, 1.0],
    ]
) / 6.0


def pose_bspline_eval(poses: Pose, u: jax.Array, i0: jax.Array) -> Pose:
    """Evaluate a cumulative cubic B-spline over control poses.

    poses: (N,) Pose control points (uniform knots).
    u in [0,1): normalized position inside segment starting at control i0
    (needs i0 .. i0+3 in range). Batched over u/i0 leading dims.
    """
    uu = jnp.stack([jnp.ones_like(u), u, u * u, u * u * u], axis=-1)
    B = jnp.einsum("kj,...j->...k", _CUM_C, uu)   # (..., 3)

    q = poses.q
    t = poses.t

    def rel_log(i, k):
        dq = quat_mul(quat_conj(q[i + k - 1]), q[i + k])
        return so3_log_quat(dq), t[i + k] - t[i + k - 1]

    q_out = q[i0]
    t_out = t[i0]
    for k in (1, 2, 3):
        w = B[..., k - 1]
        dphi, dt = rel_log(i0, k)
        q_out = boxplus(q_out, w[..., None] * dphi)
        t_out = t_out + w[..., None] * dt
    return Pose(q=q_out, t=t_out)


def pose_bspline_resample(poses: Pose, times: jax.Array,
                          query: jax.Array) -> Pose:
    """Resample a discrete pose trajectory at arbitrary timestamps.

    Control points are the trajectory poses themselves with their (sorted)
    timestamps as knots; each query lands in a cubic segment via
    searchsorted.  The control sequence is padded at both ends with
    *linearly extrapolated* virtual poses (p₋₁ = p₀ ∘ (p₀⁻¹p₁)⁻¹ and its
    mirror at the tail) so the spline covers the full [t₀, t_N] range with
    no endpoint collapse — a constant-velocity trajectory is reproduced
    exactly everywhere, including the first and last knot intervals.
    """
    N = times.shape[0]
    q, t = poses.q, poses.t

    # virtual controls by mirroring the boundary relative motion
    dq_head = quat_mul(quat_conj(q[1]), q[0])         # p1→p0 motion
    q_pre = quat_mul(q[0], dq_head)
    t_pre = t[0] + (t[0] - t[1])
    dq_tail = quat_mul(quat_conj(q[-2]), q[-1])       # pN-2→pN-1 motion
    q_post = quat_mul(q[-1], dq_tail)
    t_post = t[-1] + (t[-1] - t[-2])
    q_pad = jnp.concatenate([q_pre[None], q, q_post[None]], axis=0)
    t_pad = jnp.concatenate([t_pre[None], t, t_post[None]], axis=0)
    padded = Pose(t=t_pad, q=q_pad)

    idx = jnp.clip(jnp.searchsorted(times, query, side="right") - 1, 0, N - 2)
    t0 = times[idx]
    t1 = times[idx + 1]
    u = jnp.clip((query - t0) / jnp.maximum(t1 - t0, 1e-9), 0.0, 1.0)
    # padded index: segment [times[idx], times[idx+1]] uses padded controls
    # idx .. idx+3 == original idx-1 .. idx+2
    return pose_bspline_eval(padded, u, idx)
