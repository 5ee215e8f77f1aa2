"""BA iterations/s micro-benchmark (BASELINE.json metric 3: "BA iters/s").

Times the sliding-window bundle-adjustment Gauss-Newton iteration — the
replacement for the reference's Ceres DENSE_SCHUR solve, which it caps at 30
iterations / `solver_time: 30` s (`kitti_config_00.yaml:61-62`,
`Estimator.cc:1260-1277`).  The timed unit is one damped-GN iteration of the
full window problem (residuals + one-pass jacfwd Jacobian + Schur depth
elimination + pose solve) at reference scale: window 10, 150 tracks.

Runs on whatever backend is active (TPU under axon; pass --cpu to force the
host).  Prints iterations/s and ms/iteration.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import time

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--window", type=int, default=10)
    ap.add_argument("--tracks", type=int, default=150)
    ap.add_argument("--gn-iters", type=int, default=30,
                    help="iterations per solve (reference Ceres cap: 30)")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lmono_tpu.config import EstimatorConfig
    from lmono_tpu.estimator.solver import solve_window
    from lmono_tpu.estimator.window import FeatureTable, WindowState
    from lmono_tpu.io.synthetic import synthetic_T_CL
    from lmono_tpu.utils.lie import so3_exp_quat

    cfg = EstimatorConfig(window_size=args.window, max_tracks=args.tracks,
                          gn_iters=args.gn_iters)
    w1 = cfg.window_size + 1
    M = cfg.max_tracks

    ts = jnp.arange(w1, dtype=jnp.float32)
    t = jnp.stack([ts, 0.02 * ts ** 2, jnp.zeros_like(ts)], -1)
    q = so3_exp_quat(jnp.stack([0.01 * ts, 0.02 * ts, 0.05 * ts], -1))
    key = jax.random.PRNGKey(0)
    obs = 0.2 * jax.random.normal(key, (M, w1, 2))
    feats = FeatureTable(
        ids=jnp.arange(M, dtype=jnp.int32),
        anchor=jnp.zeros((M,), jnp.int32),
        obs=obs,
        obs_mask=jnp.ones((M, w1), bool),
        inv_depth=0.1 * jnp.ones((M,)),
        depth_ok=jnp.ones((M,), bool),
        alive=jnp.ones((M,), bool),
    )
    state = WindowState.init(cfg, synthetic_T_CL())
    state = state._replace(t=t, q=q, lt=t, lq=q, feats=feats,
                           count=jnp.asarray(w1, jnp.int32),
                           initialized=jnp.ones((), bool))

    solve = jax.jit(lambda s: solve_window(s, cfg))
    out, diag = solve(state)            # compile
    jax.block_until_ready(out.t)

    t0 = time.perf_counter()
    for _ in range(args.reps):
        out, diag = solve(state)
    jax.block_until_ready(out.t)
    dt = (time.perf_counter() - t0) / args.reps
    iters = cfg.gn_iters
    print(f"backend: {jax.devices()[0].platform}  "
          f"window={args.window} tracks={args.tracks}")
    print(f"solve: {dt * 1e3:.3f} ms  ({iters} GN iters)  "
          f"→ {iters / dt:.1f} BA iters/s  "
          f"(reference budget: 30 iters / 30 s cap)")


if __name__ == "__main__":
    main()
