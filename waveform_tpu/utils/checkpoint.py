"""Checkpoint/resume of engine state.

The reference has no state persistence beyond OBS's settings JSON —
re-``update()`` rebuilds everything from scratch (SURVEY.md §5).  A serving
framework needs more: EMA trails, silence latches, and device ring contents
survive process restarts so a redeploy doesn't blank every client's graph.
State pytrees serialize to a single ``.npz`` (no orbax dependency needed at
this scale; the arrays total a few MB).

Multi-host: ``save_pytree`` is a COLLECTIVE — every process must call it
(sharded leaves allgather across processes), and process 0 writes the file.
``load_pytree``'s optional ``keep`` performs the stream-row migration that
live ``resized()`` cannot do across processes (the re-provision flow
``ShardedServingEngine.resized`` documents): checkpoint row ``keep[i]``
lands in new row ``i``, rows beyond ``len(keep)`` keep their fresh-init
values — the multi-host analog of the reference tearing down and
re-allocating every buffer on a topology change
(/root/reference/src/source.cpp:1077-1322).
"""

from __future__ import annotations

import numpy as np

import jax


def to_host(x) -> np.ndarray:
    """Leaf -> host numpy, gathering across processes when the leaf is a
    multi-host sharded array (``np.asarray`` alone raises on those).
    COLLECTIVE for such leaves: every process must reach this call."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def save_pytree(path: str, tree) -> None:
    """Collective on multi-host (see :func:`to_host`); process 0 writes."""
    leaves, treedef = jax.tree.flatten(tree)
    arrays = {f"leaf_{i}": to_host(x) for i, x in enumerate(leaves)}
    if jax.process_index() == 0:
        np.savez_compressed(path, __treedef__=str(treedef), **arrays)


def load_pytree(path: str, like, keep: list[int] | None = None):
    """Load into the structure of ``like``.

    With ``keep=None`` shapes/dtypes must match (plus the one pinned r3
    ring-layout evolution below).  With ``keep`` the checkpoint may carry
    a DIFFERENT stream count: every leaf's leading axis is per-stream
    (per-(stream·channel) for flat rings — migrated at stream granularity
    through the ring's channel count), new row ``i`` receives checkpoint
    row ``keep[i]``, and rows past ``len(keep)`` retain ``like``'s values.
    """
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
        ref_shape = tuple(np.shape(ref))
        node = nodes[i] if i < len(nodes) else None
        if keep is not None:
            if isinstance(node, DeviceRing) and arr.ndim == 2:
                c = node.channels
                if (arr.shape[0] % c or arr.shape[1] != ref_shape[1]
                        or len(ref_shape) != 2 or ref_shape[0] % c):
                    raise ValueError(
                        f"checkpoint leaf {i} {arr.shape} incompatible with "
                        f"ring {ref_shape} (channels={c}) for row migration")
                old3 = arr.reshape(-1, c, arr.shape[1])
                base = np.array(to_host(ref)).reshape(-1, c, ref_shape[1])
                if any(not 0 <= j < old3.shape[0] for j in keep):
                    raise ValueError(f"keep indices out of range for "
                                     f"checkpoint streams={old3.shape[0]}")
                base[:len(keep)] = old3[keep]
                arr = base.reshape(ref_shape)
            else:
                if arr.shape[1:] != ref_shape[1:]:
                    raise ValueError(
                        f"checkpoint leaf {i} trailing shape {arr.shape} != "
                        f"expected {ref_shape}; row migration only remaps "
                        "the stream axis — was the config changed?")
                if any(not 0 <= j < arr.shape[0] for j in keep):
                    raise ValueError(f"keep indices out of range for "
                                     f"checkpoint streams={arr.shape[0]}")
                base = np.array(to_host(ref))
                base[:len(keep)] = arr[keep]
                arr = base
        elif arr.shape != ref_shape:
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
