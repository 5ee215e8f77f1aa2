"""Train the place-recognition vocabulary (k-means over BRIEF descriptors).

The reference ships an offline-trained DBoW2 vocabulary (`brief_k10L6.bin`,
k=10 L=6 tree, loaded at `src/loop_detection_node.cc:369`); round 2 stood in
a random Gaussian projection, which cost recall (0.34 at precision 1.0).
This trains the real thing: spherical k-means on BRIEF descriptors harvested
from many rendered viewpoints — unit-norm centroids stored as the codebook,
so `global_descriptor`'s argmax bucket is exactly the nearest-centroid word
(±1 descriptors have constant norm).

Writes `lmono_tpu/assets/vocab_brief_{bits}x{dim}.npz`, the committed
artifact `make_codebook` picks up automatically.

Usage: python examples/train_vocab.py [--dim 128] [--views 160] [--iters 30]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

import jax

# vocabulary training is an offline CPU job (keep the TPU free for runs)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from lmono_tpu.config import synthetic_config
from lmono_tpu.io import synthetic as syn
from lmono_tpu.ops.brief import BRIEF_BITS, brief_describe, vocab_asset_path
from lmono_tpu.ops.corners import detect_grid
from lmono_tpu.utils.lie import Pose, so3_exp_quat


def harvest(views: int, kp_per_view: int, cam_cfg) -> np.ndarray:
    """BRIEF descriptors from random viewpoints in the raycast city."""
    scene = syn.make_city_scene()
    rng = np.random.RandomState(3)
    desc_fn = jax.jit(lambda img, uv, ok: brief_describe(img, uv, ok))
    out = []
    for v in range(views):
        # random position on/near the road network, random yaw, slight tilt
        ang = rng.uniform(0, 2 * np.pi)
        rad = rng.uniform(6.0, 18.0)
        t = jnp.asarray([rad * np.cos(ang), rad * np.sin(ang),
                         rng.uniform(1.2, 2.2)], jnp.float32)
        ypr = jnp.asarray([rng.uniform(0, 2 * np.pi),
                           rng.uniform(-0.08, 0.08),
                           rng.uniform(-0.05, 0.05)], jnp.float32)
        q = so3_exp_quat(ypr)
        img = syn.render_camera(scene, Pose(t, q), cam_cfg)
        uv, ok = detect_grid(img, 16, kp_per_view, jnp.zeros((1, 2)),
                             jnp.zeros(1, bool))
        d = desc_fn(img, uv, ok)
        out.append(np.asarray(d)[np.asarray(ok)])
        if v % 40 == 0:
            print(f"view {v}/{views}: {sum(len(x) for x in out)} descriptors",
                  flush=True)
    return np.concatenate(out).astype(np.float32)


def spherical_kmeans(X: np.ndarray, k: int, iters: int, seed: int = 0):
    """Cosine k-means on constant-norm vectors; returns unit centroids
    (d, k) plus diagnostics.  Runs on-device (one matmul per iteration)."""
    rng = np.random.RandomState(seed)
    Xj = jnp.asarray(X)
    C = jnp.asarray(X[rng.choice(len(X), k, replace=False)].T)  # (d, k)
    C = C / jnp.maximum(jnp.linalg.norm(C, axis=0, keepdims=True), 1e-6)

    @jax.jit
    def step(C, key):
        a = jnp.argmax(Xj @ C, axis=1)                    # (N,)
        sums = jnp.zeros_like(C).T.at[a].add(Xj)          # (k, d)
        cnt = jnp.zeros((k,)).at[a].add(1.0)
        # dead centroids re-seed from random points
        rnd = Xj[jax.random.randint(key, (k,), 0, Xj.shape[0])]
        newC = jnp.where(cnt[:, None] > 0, sums, rnd).T
        newC = newC / jnp.maximum(
            jnp.linalg.norm(newC, axis=0, keepdims=True), 1e-6)
        sim = jnp.max(Xj @ newC, axis=1).mean()
        return newC, (cnt, sim)

    key = jax.random.PRNGKey(seed)
    for i in range(iters):
        key, k1 = jax.random.split(key)
        C, (cnt, sim) = step(C, k1)
        if i % 5 == 0 or i == iters - 1:
            occ = float((cnt > 0).mean())
            print(f"iter {i}: mean cos {float(sim):.4f}, "
                  f"occupied {100 * occ:.0f}%", flush=True)
    return np.asarray(C), float(sim), float((cnt > 0).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--views", type=int, default=160)
    ap.add_argument("--kp-per-view", type=int, default=200)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    cam_cfg = synthetic_config().camera
    X = harvest(args.views, args.kp_per_view, cam_cfg)
    print(f"harvested {len(X)} descriptors from {args.views} views")
    C, sim, occ = spherical_kmeans(X, args.dim, args.iters)

    path = vocab_asset_path(BRIEF_BITS, args.dim)
    _os.makedirs(_os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path, codebook=C.astype(np.float32),
        meta=np.array([len(X), args.views, args.iters], np.int64))
    print(f"wrote {path} (mean cos {sim:.4f}, occupancy {100 * occ:.0f}%)")


if __name__ == "__main__":
    main()
