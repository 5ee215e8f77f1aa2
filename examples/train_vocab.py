"""Train the place-recognition vocabulary (k-means over BRIEF descriptors).

The reference ships an offline-trained DBoW2 vocabulary (`brief_k10L6.bin`,
k=10 L=6 hierarchical tree ≈ 10⁶ leaf words, loaded at
`src/loop_detection_node.cc:369`); round 2 stood in a random Gaussian
projection (recall 0.34 at precision 1.0), round 3 trained a flat 128-word
spherical k-means (recall 0.55).  This trains the DBoW2-style construction:
**hierarchical** spherical k-means (branch k at each level, L levels →
k^L leaf words) on BRIEF descriptors harvested from rendered viewpoints
with photometric jitter (brightness/gamma) — the leaf centroids are stored
as one flat codebook, and `global_descriptor`'s argmax bucket is exactly
the nearest-leaf word (±1 descriptors have constant norm; we can afford the
exact argmax as one MXU matmul where DBoW2 needs the greedy tree descent).

Writes `lmono_tpu/assets/vocab_brief_{bits}x{dim}.npz`, the committed
artifact `make_codebook` picks up automatically.

Usage:
  python examples/train_vocab.py --branch 10 --levels 3   # 1000 words
  python examples/train_vocab.py --dim 128                # flat k-means
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
    """BRIEF descriptors from random viewpoints in the raycast city.

    Each view also contributes a photometrically jittered copy (brightness
    scale + gamma — BRIEF's pairwise comparisons are invariant to monotonic
    maps, but the blur + bilinear sampling make the bits only *nearly*
    invariant, and the jitter teaches the vocabulary that residual): the
    perturbed-lap PR benchmark (`bench_loop_pr.py --perturb`) replays the
    same nuisances at query time."""
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
        # photometric jitter copy (keypoints re-detected on the jittered
        # image so the corner-position shift is part of the training signal)
        scale = rng.uniform(0.6, 1.4)
        gamma = rng.uniform(0.7, 1.4)
        jimg = jnp.clip(jnp.clip(img * scale, 0.0, 1.0) ** gamma, 0.0, 1.0)
        juv, jok = detect_grid(jimg, 16, kp_per_view, jnp.zeros((1, 2)),
                               jnp.zeros(1, bool))
        jd = desc_fn(jimg, juv, jok)
        out.append(np.asarray(jd)[np.asarray(jok)])
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


def hierarchical_kmeans(X: np.ndarray, branch: int, levels: int,
                        iters: int, seed: int = 0):
    """DBoW2-style vocabulary tree: recursive spherical k-means, `branch`
    children per node, `levels` deep → branch**levels leaf words
    (`TemplatedVocabulary.h` k=10 L=6 construction).  Returns the flat
    (d, branch**levels) leaf-centroid codebook — lookup is an exact argmax
    matmul over leaves rather than DBoW2's greedy descent."""
    def rec(idx: np.ndarray, level: int, seed: int) -> list:
        if level == levels:
            # leaf: centroid of this cell (unit-normalized mean)
            c = X[idx].mean(axis=0)
            n = np.linalg.norm(c)
            return [c / n if n > 1e-6 else c]
        k = min(branch, max(1, len(idx)))
        if len(idx) < 2 * branch:
            # too few descriptors to split further: pad with copies so the
            # leaf count stays branch**levels (duplicate words are harmless
            # — argmax ties resolve deterministically)
            leaf = rec(idx, levels, seed)
            return leaf * (branch ** (levels - level))
        C, _, _ = spherical_kmeans(X[idx], k, iters, seed=seed)
        a = np.argmax(X[idx] @ C, axis=1)
        out = []
        for c in range(branch):
            sub = idx[a == min(c, k - 1)] if c < k else idx[a == k - 1]
            if len(sub) == 0:
                sub = idx[:1]
            out.extend(rec(sub, level + 1, seed * branch + c + 1))
        return out

    leaves = rec(np.arange(len(X)), 0, seed + 1)
    C = np.stack(leaves, axis=1).astype(np.float32)       # (d, k^L)
    sim = float(np.max(X[: 20000] @ C, axis=1).mean())
    occ = float(len(np.unique(np.argmax(X[: 20000] @ C, axis=1)))
                / C.shape[1])
    return C, sim, occ


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dim", type=int, default=128,
                    help="flat k-means word count (ignored with --levels)")
    ap.add_argument("--branch", type=int, default=10)
    ap.add_argument("--levels", type=int, default=0,
                    help=">0: hierarchical k-means, branch**levels words")
    ap.add_argument("--views", type=int, default=160)
    ap.add_argument("--kp-per-view", type=int, default=200)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    cam_cfg = synthetic_config().camera
    X = harvest(args.views, args.kp_per_view, cam_cfg)
    print(f"harvested {len(X)} descriptors from {args.views} views")
    if args.levels > 0:
        args.dim = args.branch ** args.levels
        C, sim, occ = hierarchical_kmeans(X, args.branch, args.levels,
                                          args.iters)
    else:
        C, sim, occ = spherical_kmeans(X, args.dim, args.iters)

    path = vocab_asset_path(BRIEF_BITS, args.dim)
    _os.makedirs(_os.path.dirname(path), exist_ok=True)
    np.savez_compressed(
        path, codebook=C.astype(np.float32),
        meta=np.array([len(X), args.views, args.iters], np.int64))
    print(f"wrote {path} (mean cos {sim:.4f}, occupancy {100 * occ:.0f}%)")


if __name__ == "__main__":
    main()
