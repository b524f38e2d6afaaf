"""Checkpoint/resume of engine state.

The reference has no state persistence beyond OBS's settings JSON —
re-``update()`` rebuilds everything from scratch (SURVEY.md §5).  A serving
framework needs more: EMA trails, silence latches, and device ring contents
survive process restarts so a redeploy doesn't blank every client's graph.
State pytrees serialize to a single ``.npz`` (no orbax dependency needed at
this scale; the arrays total a few MB).
"""

from __future__ import annotations

import numpy as np

import jax


def save_pytree(path: str, tree) -> None:
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    np.savez_compressed(path, __treedef__=str(treedef), **arrays)


def load_pytree(path: str, like):
    """Load into the structure of ``like`` (shapes/dtypes must match)."""
    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree.flatten(like)
    loaded = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != ref.shape:
            if arr.size == np.prod(ref.shape, dtype=np.int64) \
                    and arr.ndim != np.ndim(ref):
                # layout evolution, not a config change: r3 checkpoints
                # store the sample ring [S, C, L]; r4 engines carry it
                # flat [S*C, L] (dsp/devring.py DeviceRing.channels) —
                # the row-major reshape is exactly the flatten
                arr = arr.reshape(ref.shape)
            else:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != expected "
                    f"{ref.shape}; was the config or stream count changed?")
        loaded.append(arr.astype(ref.dtype))
    return jax.tree.unflatten(treedef, loaded)
