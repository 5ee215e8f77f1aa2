"""Binary (BRIEF-style) descriptors and Hamming matching as matmuls.

Replaces the reference's vendored DVision BRIEF
(`src/loop_detection/DVision/BRIEF.cpp`) + DBoW2 inverted index
(`include/loop_detection/DBoW/TemplatedDatabase.h`): descriptors are 256
comparisons of blurred intensities on a fixed deterministic pattern, stored
as ±1 int8 so that Hamming distance becomes an MXU matmul:
    ham(a, b) = (B − a·b)/2   for a, b ∈ {±1}^B.
Place recognition scores come from a soft-BoW global descriptor (codebook
projection + bucket histogram + tf-idf-free L2 normalization) — a masked
cosine top-k matmul over the keyframe bank instead of an inverted file.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from lmono_tpu.ops.image import bilinear_sample, gauss_blur5

BRIEF_BITS = 256
_PATTERN_SCALE = 15.0


def brief_pattern(bits: int = BRIEF_BITS, seed: int = 1234) -> np.ndarray:
    """Deterministic sampling pattern: (bits, 4) = (x1, y1, x2, y2), from an
    isotropic Gaussian like the original BRIEF paper (σ = patch/5)."""
    rng = np.random.RandomState(seed)
    pat = rng.normal(0.0, _PATTERN_SCALE / 2.5, size=(bits, 4))
    return np.clip(pat, -_PATTERN_SCALE, _PATTERN_SCALE).astype(np.float32)


_PATTERN = jnp.asarray(brief_pattern())


def brief_describe(image: jax.Array, kps: jax.Array,
                   mask: jax.Array, angle: jax.Array | None = None
                   ) -> jax.Array:
    """Compute ±1 BRIEF descriptors at keypoints.

    image: (H, W) in [0,1]; kps: (K, 2) pixel coords.
    angle: optional (K,) per-keypoint orientation (radians) — the sampling
    pattern rotates with it (the ORB "steered BRIEF" variant the reference
    offers behind `use_orb: 1`, KeyFrame.cc:141-170).
    Returns (K, 256) int8 in {±1} (masked rows are +1 everywhere).
    """
    sm = gauss_blur5(gauss_blur5(image))
    off1 = _PATTERN[None, :, :2]                      # (1, B, 2)
    off2 = _PATTERN[None, :, 2:]
    if angle is not None:
        ca, sa = jnp.cos(angle)[:, None], jnp.sin(angle)[:, None]

        def rot(o):
            x, y = o[..., 0], o[..., 1]
            return jnp.stack([ca * x - sa * y, sa * x + ca * y], -1)

        off1, off2 = rot(off1), rot(off2)
    p1 = kps[:, None, :] + off1                       # (K, B, 2)
    p2 = kps[:, None, :] + off2
    i1 = bilinear_sample(sm, p1)
    i2 = bilinear_sample(sm, p2)
    bits = jnp.where(i1 < i2, 1, -1).astype(jnp.int8)
    return jnp.where(mask[:, None], bits, jnp.ones_like(bits))


def patch_orientation(image: jax.Array, kps: jax.Array,
                      radius: int = 7) -> jax.Array:
    """ORB intensity-centroid orientation per keypoint:
    θ = atan2(m01, m10) over a (2r+1)² patch (disc-masked).

    Returns (K,) radians.  Used when `LoopConfig.use_orb` — the reference's
    alternative descriptor path (`KeyFrame.cc:141-170`, `use_orb: 1`)."""
    sm = gauss_blur5(image)
    d = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(d, d, indexing="ij")
    disc = (ox ** 2 + oy ** 2) <= radius ** 2
    grid = jnp.stack([ox, oy], -1).reshape(-1, 2)     # (P, 2)
    pts = kps[:, None, :] + grid[None, :, :]          # (K, P, 2)
    vals = bilinear_sample(sm, pts) * disc.reshape(-1)[None, :]
    m10 = jnp.sum(vals * grid[None, :, 0], axis=1)
    m01 = jnp.sum(vals * grid[None, :, 1], axis=1)
    return jnp.arctan2(m01, m10)


def pack_bits(desc: jax.Array) -> jax.Array:
    """±1 int8 (..., B) → packed uint8 (..., B//8): bit j of byte i is
    (desc[8i+j] > 0).  The keyframe DB stores descriptors packed — 8× less
    HBM and 8× cheaper functional bank copies per db_add; candidate rows
    unpack on the fly for the Hamming matmul."""
    B = desc.shape[-1]
    bits = (desc > 0).astype(jnp.uint8).reshape(desc.shape[:-1] + (B // 8, 8))
    weights = (2 ** jnp.arange(8, dtype=jnp.uint32)).astype(jnp.uint8)
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint8)


def unpack_bits(packed: jax.Array) -> jax.Array:
    """Packed uint8 (..., B//8) → ±1 int8 (..., B) (inverse of pack_bits)."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)
    pm1 = jnp.where(bits > 0, jnp.int8(1), jnp.int8(-1))
    return pm1.reshape(packed.shape[:-1] + (packed.shape[-1] * 8,))


def hamming_matrix(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise Hamming distances between ±1 descriptor sets.

    a: (Na, B) int8; b: (Nb, B) int8 → (Na, Nb) int32.
    """
    dot = jax.lax.dot_general(
        a.astype(jnp.int32), b.astype(jnp.int32),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (a.shape[1] - dot) // 2


def match_descriptors(a: jax.Array, a_mask: jax.Array,
                      b: jax.Array, b_mask: jax.Array,
                      max_hamming: int = 80):
    """Mutual-best matching under a Hamming gate (reference `searchInAera`,
    KeyFrame.cc:217-246, uses one-way best < 80; we add mutuality for
    precision).  Returns (idx_b_for_a (Na,), ok (Na,))."""
    D = hamming_matrix(a, b)
    D = jnp.where(b_mask[None, :], D, 10 ** 6)
    D = jnp.where(a_mask[:, None], D, 10 ** 6)
    best_b = jnp.argmin(D, axis=1)
    best_d = jnp.min(D, axis=1)
    best_a_of_b = jnp.argmin(D, axis=0)
    mutual = best_a_of_b[best_b] == jnp.arange(a.shape[0])
    ok = a_mask & (best_d <= max_hamming) & mutual
    return best_b.astype(jnp.int32), ok


def vocab_asset_path(bits: int, dim: int) -> str:
    import os

    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets",
        f"vocab_brief_{bits}x{dim}.npz")


def make_codebook(bits: int = BRIEF_BITS, dim: int = 128,
                  seed: int = 77) -> jax.Array:
    """Vocabulary codebook (bits, dim) replacing the reference's
    offline-trained DBoW2 binary tree (`brief_k10L6.bin`, loaded at
    `src/loop_detection_node.cc:369`).

    Loads the shipped k-means-trained vocabulary asset when one matches
    (trained by `examples/train_vocab.py` on BRIEF descriptors harvested
    from rendered viewpoints — unit-norm centroids, so the
    `global_descriptor` argmax bucket IS the nearest-centroid word, since
    ±1 descriptors have constant norm).  Falls back to a random signed
    projection when no asset exists."""
    import os

    path = vocab_asset_path(bits, dim)
    if os.path.exists(path):
        C = np.load(path)["codebook"].astype(np.float32)
        assert C.shape == (bits, dim), C.shape
        return jnp.asarray(C)
    rng = np.random.RandomState(seed)
    C = rng.normal(size=(bits, dim)).astype(np.float32)
    C /= np.linalg.norm(C, axis=0, keepdims=True)
    return jnp.asarray(C)


def global_descriptor(desc: jax.Array, mask: jax.Array,
                      codebook: jax.Array) -> jax.Array:
    """Soft-BoW global descriptor: project each local descriptor, histogram
    its argmax bucket, L2-normalize.  desc (K, B) ±1 int8 → (dim,) f32."""
    proj = desc.astype(jnp.float32) @ codebook          # (K, dim)
    bucket = jnp.argmax(proj, axis=-1)                  # (K,)
    dim = codebook.shape[1]
    hist = jnp.zeros((dim,), jnp.float32).at[bucket].add(
        mask.astype(jnp.float32), mode="drop")
    n = jnp.linalg.norm(hist)
    return hist / jnp.maximum(n, 1e-6)
