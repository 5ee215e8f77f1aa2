"""On-device kernel benchmarks: Pallas KNN vs XLA `approx_min_k` across map
sizes, and Pallas LK vs the vmapped LK — with FLOP/byte/utilization
estimates (VERDICT r1 #5: device-level perf accounting).

Run ON THE TPU (PYTHONPATH=/root/repo:/root/.axon_site python
examples/bench_kernels.py); also runs on CPU for completeness (the numbers
then characterize the host, not the chip).  Writes KERNELS.json.

Utilization model (v5e reference peaks: ~197 TFLOP/s bf16, ~98 f32,
~819 GB/s HBM):
  KNN: the Q×M score matrix is a (Q,3)x(3,M) matmul + top-k: FLOPs ≈ 8·Q·M
       (dist expansion + compare), bytes ≈ 4·(Q·3 + M·3 + Q·k·2) — compute
       bound for large M only if the reduction stays on-chip.
  LK:  per feature per iter: patch² bilinear samples (4 muls each) + 2x2
       solve — FLOPs ≈ N·iters·patch²·20.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

F32_PEAK = 98e12       # v5e f32 matmul peak FLOP/s (MXU)
HBM_BW = 819e9         # v5e HBM bandwidth B/s


def _med(fn, *args, reps=7):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def bench_knn():
    from lmono_tpu.ops.knn import knn
    from lmono_tpu.ops.pallas.knn import knn_pallas

    on_tpu = (jax.default_backend() == "tpu"
              and "--skip-pallas-knn" not in _sys.argv)
    Q, k = 4096, 5
    rows = []
    for M in (32_768, 131_072, 524_288, 1_048_576):
        key = jax.random.PRNGKey(0)
        q = jax.random.normal(key, (Q, 3)) * 30
        t = jax.random.normal(jax.random.PRNGKey(1), (M, 3)) * 30
        m = jnp.ones((M,), bool)

        f_xla = jax.jit(lambda q, t, m: knn(q, t, m, k))
        t_xla = _med(f_xla, q, t, m)
        row = {"M": M, "Q": Q, "xla_ms": t_xla * 1e3}
        if on_tpu:
            f_pal = jax.jit(lambda q, t, m: knn_pallas(q, t, m, k))
            t_pal = _med(f_pal, q, t, m)
            row["pallas_ms"] = t_pal * 1e3
            row["pallas_speedup"] = t_xla / t_pal
            best = min(t_xla, t_pal)
        else:
            best = t_xla
        flops = 8.0 * Q * M
        bytes_ = 4.0 * (Q * 3 + M * 3 + Q * k * 2) + 4.0 * Q * M  # score mat
        row["flops"] = flops
        row["mxu_util"] = flops / best / F32_PEAK
        row["hbm_frac"] = bytes_ / best / HBM_BW
        rows.append(row)
        print({kk: (round(v, 4) if isinstance(v, float) else v)
               for kk, v in row.items()}, flush=True)
    return rows


def bench_lk():
    from lmono_tpu.ops.image import build_pyramid, scharr_gradients
    from lmono_tpu.ops.lk import track_pyramid
    from lmono_tpu.ops.pallas.lk import lk_level_pallas

    on_tpu = jax.default_backend() == "tpu"
    H, W, N, patch, iters = 512, 1024, 256, 21, 10
    key = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(key, (H, W))
    img1 = jnp.roll(img0, (1, 2), (0, 1))
    ix, iy = scharr_gradients(img0)
    pts = jnp.stack([jax.random.uniform(jax.random.PRNGKey(1), (N,)) * (W - 60) + 30,
                     jax.random.uniform(jax.random.PRNGKey(2), (N,)) * (H - 60) + 30], -1)
    guess = pts

    rows = {"H": H, "W": W, "N": N, "patch": patch, "iters": iters}
    if on_tpu:
        f_pal = jax.jit(lambda *a: lk_level_pallas(*a, patch=patch,
                                                   iters=iters))
        t_pal = _med(f_pal, img0, ix, iy, img1, pts, guess)
        rows["pallas_ms"] = t_pal * 1e3

    # vmapped single-level reference
    from lmono_tpu.ops.lk import lk_level
    f_vm = jax.jit(lambda p, g: jax.vmap(
        lambda p0, g0: lk_level(img0, ix, iy, img1, p0, g0, patch, iters,
                                0.01))(p, g))
    t_vm = _med(f_vm, pts, guess)
    rows["vmap_ms"] = t_vm * 1e3
    if on_tpu:
        rows["pallas_speedup"] = t_vm / (rows["pallas_ms"] / 1e3)
    flops = N * iters * patch * patch * 20.0
    best = min(t_vm, rows.get("pallas_ms", 1e9) / 1e3)
    rows["flops"] = flops
    rows["vpu_util_est"] = flops / best / F32_PEAK
    print(rows, flush=True)
    return rows


def main():
    backend = jax.default_backend()
    print(f"backend: {backend} devices: {jax.devices()}", flush=True)
    out = {"backend": backend, "knn": bench_knn(), "lk": bench_lk()}
    path = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "KERNELS.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
