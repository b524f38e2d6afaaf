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
    from ..dsp.devring import DeviceRing

    data = np.load(path, allow_pickle=False)
    leaves, treedef = jax.tree.flatten(like)
    # nodes[i] is the DeviceRing owning leaf i (rings have exactly one
    # array leaf, ``buf``, so stopping the flatten at DeviceRing keeps the
    # leaf indices aligned) or the leaf itself otherwise — this is how the
    # r3-compat fixup below knows the ring's channel count, which is
    # static pytree aux data and therefore invisible at leaf granularity
    nodes, _ = jax.tree.flatten(
        like, is_leaf=lambda x: isinstance(x, DeviceRing))
    loaded = []
    for i, ref in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        if arr.shape != ref.shape:
            ref_shape = tuple(np.shape(ref))
            node = nodes[i] if i < len(nodes) else None
            if (isinstance(node, DeviceRing)
                    and arr.ndim == 3 and len(ref_shape) == 2
                    and arr.shape[1] == node.channels
                    and arr.shape[2] == ref_shape[1]
                    and arr.shape[0] * arr.shape[1] == ref_shape[0]):
                # the ONE known layout evolution, not a config change: r3
                # checkpoints store the sample ring [S, C, L]; r4 engines
                # carry it flat [S*C, L] (dsp/devring.py
                # DeviceRing.channels) — the row-major reshape is exactly
                # the flatten.  The channel-count guard matters: a
                # [8, 1, L] mono-8-stream r3 ring element-count-matches a
                # stereo-4-stream engine's flat [8, L] ring, but reshaping
                # it would map rows to the wrong (stream, channel) pairs —
                # that is a config change and must raise.
                arr = arr.reshape(ref_shape)
            else:
                raise ValueError(
                    f"checkpoint leaf {i} shape {arr.shape} != expected "
                    f"{ref.shape}; was the config or stream count changed?")
        loaded.append(arr.astype(ref.dtype))
    return jax.tree.unflatten(treedef, loaded)
