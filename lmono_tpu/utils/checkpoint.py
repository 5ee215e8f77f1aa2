"""Checkpoint / resume of full SLAM state as flat arrays.

The reference has **no** live-state checkpointing (SURVEY §5: only the DBoW
vocabulary load and PLY snapshots); this module serializes any pytree of
arrays (window state, odometry map banks, keyframe DB, pose graph, colored
map) to one .npz for deterministic resume and bitwise replay.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def save_state(path: str, state: Any,
               extra: Optional[dict] = None) -> int:
    """Serialize a pytree of arrays to npz.  Returns number of leaves.

    `extra` holds variable-length arrays (e.g. per-node history whose
    leading axis grows with the run) saved under their own names and
    restored with `load_extras` — they bypass the template shape check.
    """
    leaves, treedef = jax.tree_util.tree_flatten(state)
    arrays = {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)}
    arrays["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    for k, v in (extra or {}).items():
        arrays[f"extra_{k}"] = np.asarray(v)
    np.savez_compressed(path, **arrays)
    return len(leaves)


def load_state(path: str, template: Any) -> Any:
    """Restore a pytree saved by `save_state`; `template` supplies structure
    and dtypes (shapes must match the saved arrays).  On mismatch raises
    ValueError listing EVERY mismatched leaf with its key path, so callers
    can tell a grown pose graph from an incompatible checkpoint."""
    data = np.load(path)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    paths = [jax.tree_util.keystr(p) for p, _ in
             jax.tree_util.tree_flatten_with_path(template)[0]]
    leaves = []
    mismatches = []
    for i, lt in enumerate(leaves_t):
        arr = data[f"leaf_{i}"]
        want = np.asarray(lt)
        if arr.shape != want.shape:
            mismatches.append(
                f"{paths[i]}: saved {arr.shape} != template {want.shape}")
            continue
        leaves.append(jax.numpy.asarray(arr.astype(want.dtype)))
    if mismatches:
        raise ValueError("checkpoint shape mismatch: "
                         + "; ".join(mismatches))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def load_extras(path: str) -> dict:
    """Return the `extra` arrays saved alongside a checkpoint (empty dict
    for checkpoints written before extras existed)."""
    data = np.load(path)
    return {k[len("extra_"):]: data[k] for k in data.files
            if k.startswith("extra_")}
