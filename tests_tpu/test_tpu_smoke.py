"""TPU-path numerics: the two Pallas kernels + one fused dispatch, checked
against their CPU/XLA reference implementations on the real chip
(VERDICT r1 #10 — Pallas regressions must not be discovered only through
bench ATE drift)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_pallas_knn_matches_exact():
    """r4: the kernel was restructured (per-chunk top-k, no revisited
    state, sentinel masking) after bisecting the r3 Mosaic hang to (a) the
    running-best insert over revisited output blocks and (b) the
    (C,)→(TQ,C) sublane→lane mask broadcast — both removed; compile is now
    ~3 s.  Compared against a NUMPY exact reference: the XLA `knn` path on
    TPU uses `approx_min_k` (recall target 0.95), so it is the wrong
    oracle — the Pallas kernel is exact."""
    from lmono_tpu.ops.pallas.knn import knn_pallas

    Q, M, k = 512, 8192, 5
    rng = np.random.RandomState(0)
    qn = (rng.randn(Q, 3) * 30).astype(np.float32)
    tn = (rng.randn(M, 3) * 30).astype(np.float32)
    mn = rng.rand(M) < 0.9
    d2 = ((qn[:, None] - tn[None]) ** 2).sum(-1)
    d2[:, ~mn] = np.inf
    d_exact = np.sort(d2, axis=1)[:, :k]

    d_pal, i_pal = jax.jit(lambda q, t, m: knn_pallas(q, t, m, k))(
        jnp.asarray(qn), jnp.asarray(tn), jnp.asarray(mn))
    jax.block_until_ready((d_pal, i_pal))
    np.testing.assert_allclose(np.sort(np.asarray(d_pal), axis=1), d_exact,
                               rtol=1e-3, atol=1e-3)


def test_pallas_lk_matches_vmapped():
    from lmono_tpu.ops.image import scharr_gradients
    from lmono_tpu.ops.lk import lk_level
    from lmono_tpu.ops.pallas.lk import lk_level_pallas

    H, W, N = 256, 512, 64
    # smoothed noise: raw per-pixel noise is pathological for LK (the
    # bilinear cost landscape has no basin — measured ~20% convergence on
    # BOTH backends); a few box blurs give a smooth texture where LK
    # recovers the injected translation exactly
    img0 = jax.random.uniform(jax.random.PRNGKey(0), (H, W))
    for _ in range(4):
        img0 = (img0 + jnp.roll(img0, 1, 0) + jnp.roll(img0, -1, 0)
                + jnp.roll(img0, 1, 1) + jnp.roll(img0, -1, 1)) / 5.0
    # pure translation: both trackers must find ~(2, 1)
    img1 = jnp.roll(img0, (1, 2), (0, 1))
    ix, iy = scharr_gradients(img0)
    pts = jnp.stack(
        [jax.random.uniform(jax.random.PRNGKey(1), (N,)) * (W - 80) + 40,
         jax.random.uniform(jax.random.PRNGKey(2), (N,)) * (H - 80) + 40], -1)

    flow_p, ok_p = jax.jit(lambda p: lk_level_pallas(
        img0, ix, iy, img1, p, p, patch=21, iters=10))(pts)
    f_vm = jax.jit(lambda p: jax.vmap(
        lambda p0: lk_level(img0, ix, iy, img1, p0, p0, 21, 10, 0.01))(p))
    flow_v, ok_v, _ = f_vm(pts)
    jax.block_until_ready((flow_p, flow_v))

    both = np.asarray(ok_p) & np.asarray(ok_v)
    assert both.mean() > 0.8
    np.testing.assert_allclose(np.asarray(flow_p)[both],
                               np.asarray(flow_v)[both], atol=0.05)
    # and the flow is the injected translation
    d = np.asarray(flow_p)[both] - np.asarray(pts)[both]
    np.testing.assert_allclose(d.mean(0), [2.0, 1.0], atol=0.1)


def test_fused_dispatch_numerics_vs_cpu_golden():
    """One jitted window solve on the chip vs the same solve math's known
    cost-reduction behavior (the full CPU comparison lives in tests/)."""
    from lmono_tpu.config import EstimatorConfig
    from lmono_tpu.estimator.solver import solve_window
    from lmono_tpu.parallel.dist_ba import demo_window

    cfg = EstimatorConfig(window_size=6, max_tracks=48, gn_iters=8)
    win = demo_window(cfg)
    out, diag = jax.jit(lambda s: solve_window(s, cfg))(win)
    jax.block_until_ready(out)
    assert bool(jnp.isfinite(diag.cost1))
    assert float(diag.cost1) < 1e-3 * float(diag.cost0)
    assert bool(jnp.all(jnp.isfinite(out.t)))
