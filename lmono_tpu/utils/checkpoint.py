"""Checkpoint / resume of full SLAM state as flat arrays.

The reference has **no** live-state checkpointing (SURVEY §5: only the DBoW
vocabulary load and PLY snapshots); this module serializes any pytree of
arrays (window state, odometry map banks, keyframe DB, pose graph, colored
map) to one .npz for deterministic resume and bitwise replay.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np


def save_state(path: str, state: Any) -> int:
    """Serialize a pytree of arrays to npz.  Returns number of leaves."""
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return len(leaves)


def load_state(path: str, template: Any) -> Any:
    """Restore a pytree saved by `save_state`; `template` supplies structure
    and dtypes (shapes must match the saved arrays)."""
    data = np.load(path)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    leaves = []
    for i, lt in enumerate(leaves_t):
        arr = data[f"leaf_{i}"]
        want = np.asarray(lt)
        if arr.shape != want.shape:
            raise ValueError(
                f"leaf {i}: saved shape {arr.shape} != template {want.shape}")
        leaves.append(jax.numpy.asarray(arr.astype(want.dtype)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
