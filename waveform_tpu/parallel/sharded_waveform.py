"""Mesh-sharded batched waveform (oscilloscope) serving.

Completes the engine-family trio at pod scale: spectrum
(:class:`~waveform_tpu.parallel.sharded_serving.ShardedServingEngine`) and
meter (:class:`~...ShardedMeterServingEngine`) already shard across a
``jax.sharding.Mesh``; this gives the time-domain waveform mode
(/root/reference/src/source_generic.cpp:271-390) the same treatment.

The waveform step is purely per-stream — the resample gather keys on each
stream's own index row, the scroll is a per-stream dynamic slice, and the
dB/latch tail is elementwise — so stream-axis data parallelism partitions
it with ZERO collectives (FFTW-MPI's per-rank local transforms,
/root/reference/deps/fftw-3.3.11/mpi/block.c).  There is no pixel-axis
tensor parallelism here: the gather needs each stream's whole ring, so a
pixel split would replicate the ring reads it was meant to shard — a mesh
with a pixel axis simply replicates over it.

All host bookkeeping (per-stream chunk queues, int64 timestamp math, the
packed single-upload assembly, microbatch) is inherited unchanged from
:class:`~waveform_tpu.runtime.waveform_device.DeviceWaveformEngine`; only
placement and jit shardings differ, via the same hook seam ServingEngine
exposes to its sharded subclass.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from ..core.config import ResolvedConfig
from ..runtime.waveform_device import DeviceWaveformEngine
from .mesh import (
    from_process_local,
    local_stream_rows,
    make_mesh,
    padded_streams,
    shard_state,
    stream_sharding,
)


class ShardedWaveformEngine(DeviceWaveformEngine):
    """DeviceWaveformEngine over a device mesh (streams data-parallel).

    ``num_streams`` is the user-visible count; internally it rounds up to
    a multiple of the mesh's stream-axis size with inert padding streams
    (never fed → capture-timeout → frozen at DB_MIN).  Host reads
    (:meth:`render_values`, :attr:`last_silent`) trim back to
    ``num_streams`` rows; :attr:`display` stays padded on device.
    """

    def __init__(self, cfg: ResolvedConfig, num_streams: int,
                 mesh: Mesh | None = None, **kw):
        self.mesh = make_mesh() if mesh is None else mesh
        self.user_streams = num_streams
        self._s_sh = stream_sharding(self.mesh)
        padded = padded_streams(self.mesh, num_streams)
        self._local_rows = local_stream_rows(self.mesh, padded)
        super().__init__(cfg, padded, **kw)

    # -- placement hooks -------------------------------------------------

    def _place_buffers(self) -> None:
        self.ring = shard_state(self.mesh, self.ring)
        self.buf = shard_state(self.mesh, self.buf)
        self.latch = shard_state(self.mesh, self.latch)
        if self.rms_ring is not None:
            self.rms_ring = shard_state(self.mesh, self.rms_ring)

    def _prep(self, x):
        """Multi-host: contribute only this process's stream rows (the
        FFTW-MPI 1-D block, mpi/block.c); single-process: hand the host
        array to jit unchanged — in_shardings place it."""
        if jax.process_count() > 1:
            lo, hi = self._local_rows
            x = np.asarray(x)
            return from_process_local(self._s_sh, x[lo:hi], x.shape)
        return x

    def _prep_mb_slot(self, x):
        from ..runtime.serving import chunked_put
        if jax.process_count() > 1:
            return self._prep(x)
        return chunked_put(x, self._s_sh)

    def _jit_tick_packed(self, fn):
        # prefix pytrees: one stream sharding covers every leaf of the
        # packed row block, the ring, the scroll buffer, the latch, and
        # (when present) the RMS ring; a None rms_ring has no leaves, so
        # the prefix is inert there
        s = self._s_sh
        return jax.jit(fn, donate_argnums=(1, 2, 3, 4),
                       in_shardings=(s, s, s, s, s))

    def _jit_scan_packed(self, fn):
        # the k microbatch slots arrive as a tuple of [S, W] arrays: the
        # stream sharding broadcasts over the tuple as a pytree prefix
        s = self._s_sh
        return jax.jit(fn, donate_argnums=(1, 2, 3, 4),
                       in_shardings=(s, s, s, s, s))

    def bind_cohort(self, row0: int) -> None:
        raise NotImplementedError(
            "cohort fusion is a single-chip MultiEngine optimization; a "
            "mesh-sharded waveform engine owns its own packed upload")

    # -- user-facing padding/trimming ------------------------------------

    def render_values(self) -> np.ndarray:
        return np.asarray(self.display)[:self.user_streams]

    @property
    def last_silent(self) -> np.ndarray:
        return np.asarray(self.latch)[:self.user_streams]

    @property
    def local_streams(self) -> tuple[int, int]:
        """[start, stop) of the global stream rows this process feeds."""
        return self._local_rows

    # -- live mesh resize ------------------------------------------------

    def resized(self, num_streams: int, keep: list[int] | None = None,
                mesh: Mesh | None = None) -> "ShardedWaveformEngine":
        """Live resize across the mesh: gather → rebuild → scatter.

        Surviving rows' device state (sample ring, scroll buffer, silence
        latch, RMS window) gathers to the host, a fresh engine builds at
        the new count (optionally on a NEW mesh shape), and the migrated
        rows scatter into the new stream sharding; host sync objects move
        with their rows.  ``keep`` indexes USER rows.  Single-process only
        (the gather materializes kept rows on this host), like
        :meth:`ShardedServingEngine.resized`."""
        if jax.process_count() > 1:
            raise NotImplementedError(
                "multi-host resize: construct a new ShardedWaveformEngine "
                "and re-feed (waveform state is a rolling display window)")
        if keep is None:
            keep = list(range(min(self.user_streams, num_streams)))
        if len(keep) > num_streams:
            raise ValueError(f"keep ({len(keep)} rows) exceeds "
                             f"num_streams={num_streams}")
        if any(not 0 <= j < self.user_streams for j in keep):
            raise ValueError("keep indices out of range for user_streams="
                             f"{self.user_streams}: {keep}")
        eng = type(self)(self.cfg, num_streams,
                         mesh=self.mesh if mesh is None else mesh,
                         hop_budget=self.H, max_lead_s=self._max_lead_s,
                         microbatch=(self._mb_req if self._mb_auto
                                     else self._mb))
        k = len(keep)
        if not k:
            return eng
        idx = np.asarray(keep, np.int64)
        sh = stream_sharding(eng.mesh)

        def mig(new, old):
            host = np.array(new)              # fresh-init values (writable
            host[:k] = np.asarray(old)[idx]   # copy); migrate user rows
            return jax.device_put(host, sh)

        eng.ring = jax.tree.map(mig, eng.ring, self.ring)
        eng.buf = mig(eng.buf, self.buf)
        eng.latch = mig(eng.latch, self.latch)
        if self.rms_ring is not None and eng.rms_ring is not None:
            eng.rms_ring = jax.tree.map(mig, eng.rms_ring, self.rms_ring)
        for i, j in enumerate(keep):
            eng._streams[i] = self._streams[j]
        self._migrate_native(eng, keep)
        return eng
