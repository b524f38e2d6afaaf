"""Mesh-sharded serving engine: multi-chip batched spectrum serving.

The TPU-native answer to FFTW's MPI engine — where FFTW distributes one
problem over ranks with 1-D block distribution and Alltoall transposes
(/root/reference/deps/fftw-3.3.11/mpi/block.c, mpi/api.c,
mpi/transpose-alltoall.c), this engine distributes S concurrent audio
streams over a ``jax.sharding.Mesh``:

* **stream axis** — device rings, EMA state, and every per-stream input
  shard data-parallel; no collectives on the hot path (the analog of
  FFTW's block distribution, with uneven counts rounded up to inert
  padding streams like MPI's partial last block).
* **pixel axis** — the rebin output carries a (stream, ·, pixel) sharding
  constraint so the gather+einsum resample stays tensor-parallel; XLA
  inserts the minimal collective, the analog of the distributed transpose.

All host bookkeeping (packet queues, A/V sync, the native C++ assembler)
is inherited unchanged from :class:`~waveform_tpu.runtime.serving.ServingEngine`;
only placement and jit shardings differ, plus donated sharded state so each
tick updates rings/EMA in place across the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.config import ResolvedConfig
from ..runtime.meter_serving import MeterServingEngine
from ..runtime.serving import ServingEngine
from .mesh import (
    PIXEL_AXIS,
    STREAM_AXIS,
    from_process_local,
    local_stream_rows,
    make_mesh,
    pad_stream_dim,
    padded_streams,
    pixel_constraint,
    replicated,
    shard_state,
    stream_sharding,
)


class ShardedServingEngine(ServingEngine):
    """ServingEngine over a device mesh (streams DP × rebin pixels TP).

    ``num_streams`` is the user-visible count; internally it rounds up to a
    multiple of the mesh's stream-axis size with inactive padding streams.
    Outputs from :meth:`read_pixels`/:meth:`read_decibels` are trimmed back
    to ``num_streams`` rows.
    """

    def _spectrum_step_kwargs(self) -> dict:
        # the Pallas exact kernel is a custom call with no SPMD
        # partitioning rule — under this engine's sharded jit it would
        # either fail to partition or force full replication on a pod.
        # The magnitude pipeline is purely per-stream, so the step wraps
        # it in a stream-axis shard_map (every kernel call shard-local,
        # zero collectives — FFTW-MPI's per-rank local transforms,
        # mpi/dft-problem.c); if the kernel is unavailable the
        # allow_exact_kernel=False fallback keeps the cleanly-
        # partitioning XLA lowering.
        return {"allow_exact_kernel": False,
                "stream_shard": (self.mesh, STREAM_AXIS)}

    def __init__(self, cfg: ResolvedConfig, num_streams: int,
                 mesh: Mesh | None = None, pixel_parallel: int = 1, **kw):
        self.mesh = make_mesh(pixel_parallel=pixel_parallel) \
            if mesh is None else mesh
        self.user_streams = num_streams
        self._s_sh = stream_sharding(self.mesh)
        self._r_sh = replicated(self.mesh)
        self._scan_sh = NamedSharding(self.mesh, P(None, STREAM_AXIS))
        padded = padded_streams(self.mesh, num_streams)
        # which global stream rows this process's devices own (multi-host
        # feeders only ingest these; single process owns them all)
        self._local_rows = local_stream_rows(self.mesh, padded)
        super().__init__(cfg, padded, **kw)

    def resized(self, num_streams: int, keep: list[int] | None = None,
                mesh: Mesh | None = None) -> "ShardedServingEngine":
        """Live resize across the mesh: gather → rebuild → scatter.

        Surviving rows' device state (window ring, EMA trail, dB buffer,
        silence latch, RMS window) gathers to the host, a fresh engine
        builds at the new count (and optionally a NEW mesh shape — scene
        growth can re-balance streams across more chips), and the migrated
        rows scatter into the new stream sharding.  ``keep`` indexes USER
        rows (mesh padding rows carry inert stepped state and never
        migrate).  Host sync bookkeeping moves exactly as in the base
        engine.  The reference rebuilds everything from scratch on any
        topology change (src/source.cpp:1077-1322); carrying sharded
        device state across a mesh re-shape is strictly more continuity.

        Single-process only (the gather materializes the kept rows on this
        host): multi-host pods re-provision — build a new engine at the
        new count/mesh and carry state with save_state +
        load_state(keep=...), both collective (tested end-to-end across
        two real processes in tests/test_multihost.py)."""
        if jax.process_count() > 1:
            raise NotImplementedError(
                "multi-host resize: construct a new ShardedServingEngine "
                "and carry state across with save_state / "
                "load_state(keep=...) — collective on every process")
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
                         hop_budget=self.H, rfft_fn=self._rfft_fn,
                         use_native=self._use_native_req,
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

        def mig_ring(new_r, old_r):
            # flat rings store [S*C, L]: migrate at STREAM granularity
            # through the 3-D view, then restore the flat layout
            from ..dsp.devring import DeviceRing
            host = np.array(np.asarray(new_r.view3))
            host[:k] = np.asarray(old_r.view3)[idx]
            buf = host.reshape(new_r.buf.shape)
            return DeviceRing(buf=jax.device_put(buf, sh),
                              channels=new_r.channels)

        eng.ring = mig_ring(eng.ring, self.ring)
        eng.state = jax.tree.map(mig, eng.state, self.state)
        if self.rms_ring is not None and eng.rms_ring is not None:
            eng.rms_ring = mig_ring(eng.rms_ring, self.rms_ring)
        for i, j in enumerate(keep):
            eng._pending[i] = self._pending[j]
        if self._native is not None and eng._native is not None:
            for i, j in enumerate(keep):
                eng._native.set_sync(i, *self._native.get_sync(j))
        return eng

    # -- placement hooks -------------------------------------------------

    def _place_buffers(self) -> None:
        self.ring = shard_state(self.mesh, self.ring)
        self.state = shard_state(self.mesh, self.state)
        if self.rms_ring is not None:
            self.rms_ring = shard_state(self.mesh, self.rms_ring)

    def _placed(self, x, sharding, row_axis: int, put):
        """Mesh placement for one host batch: multi-host processes
        contribute only the stream rows their devices own (FFTW-MPI's
        per-rank block, mpi/block.c) — no host ever materializes or
        uploads the full batch; a single process ships the whole array
        via ``put``."""
        x = np.asarray(x)
        if jax.process_count() > 1:
            lo, hi = self._local_rows
            sl = x[lo:hi] if row_axis == 0 else x[:, lo:hi]
            return from_process_local(sharding, sl, x.shape)
        return put(x, sharding)

    def _prep(self, x):
        # single-process: hand the host array to jit unchanged — the
        # step's in_shardings place it on the C++ dispatch path (an eager
        # device_put here measured ~5x the jit-argument transfer,
        # serving.py:364-371); multi-host still assembles local rows
        return self._placed(x, self._s_sh, 0, lambda a, sh: a)

    def _prep_scan(self, x):
        from ..runtime.serving import chunked_put
        return self._placed(x, self._scan_sh, 1, chunked_put)

    def _constrain_pixels(self, pixels):
        return pixel_constraint(self.mesh, pixels)

    def _px_pspec(self, scan: bool) -> P:
        """Output partition spec for one tick's display values (the meter
        subclass drops the pixel axis — its [S, 1, C] levels have no
        pixel dimension to tensor-parallelize)."""
        return (P(None, STREAM_AXIS, None, PIXEL_AXIS) if scan
                else P(STREAM_AXIS, None, PIXEL_AXIS))

    def _jit_sharded_step(self, fn, scan: bool, uniform: bool):
        """Shared jit wrapper for the four packed step variants: ``scan``
        adds the leading k/T pixel axis, ``uniform`` appends a replicated
        trailing count argument.  Prefix pytrees: one sharding covers
        every leaf of ring/state."""
        s, r = self._s_sh, self._r_sh
        px = self._px_pspec(scan)
        ins = (s, s, s, r, s) + ((r,) if uniform else ())
        return jax.jit(
            fn, donate_argnums=(1, 2, 4), in_shardings=ins,
            out_shardings=(NamedSharding(self.mesh, px), s, s, s))

    def _jit_tick_packed(self, packed_tick):
        return self._jit_sharded_step(packed_tick, scan=False, uniform=False)

    def _jit_tick_packed_u(self, packed_tick):
        return self._jit_sharded_step(packed_tick, scan=False, uniform=True)

    def _uniform_counts_T(self, T: int, hop: int):
        # [T, S] (not [T]) so the bulk-path counts keep the stream-sharded
        # rank the per-argument shardings in _jit_scan expect
        return jnp.full((T, self.S), hop, jnp.int32)

    def _jit_scan(self, scan_ticks):
        s, r, t = self._s_sh, self._r_sh, self._scan_sh
        px_sh = NamedSharding(self.mesh, self._px_pspec(scan=True))
        return jax.jit(
            scan_ticks, donate_argnums=(2, 3, 7),
            in_shardings=(t, t, s, s, r, t, s, s),
            out_shardings=(px_sh, s, s, s))

    def _jit_scan_packed(self, fn):
        # the slots tuple is k separate [S, W] args: the stream sharding
        # broadcasts over the tuple as a pytree prefix
        return self._jit_sharded_step(fn, scan=True, uniform=False)

    def _jit_scan_packed_u(self, fn):
        return self._jit_sharded_step(fn, scan=True, uniform=True)

    def _prep_mb_slot(self, x):
        from ..runtime.serving import chunked_put
        return self._placed(x, self._s_sh, 0, chunked_put)

    # -- user-facing padding/trimming ------------------------------------

    def feed_batch(self, data: np.ndarray, timestamp_ns: int,
                   now_ns: int | None = None) -> None:
        if data.shape[0] == self.user_streams and self.S != self.user_streams:
            data = pad_stream_dim(np.asarray(data, np.float32), self.S)
        super().feed_batch(data, timestamp_ns, now_ns)

    def tick_many(self, new_samples, counts=None, active=None,
                  dt: float | None = None):
        new_samples = np.asarray(new_samples, np.float32)
        if (new_samples.shape[1] == self.user_streams
                and self.S != self.user_streams):
            T = new_samples.shape[0]
            new_samples = np.concatenate(
                [new_samples, np.zeros(
                    (T, self.S - self.user_streams) + new_samples.shape[2:],
                    np.float32)], axis=1)
            if counts is not None:
                counts = np.concatenate(
                    [np.asarray(counts),
                     np.zeros((T, self.S - self.user_streams), np.int32)],
                    axis=1)
            if active is not None:
                active = np.concatenate(
                    [np.asarray(active),
                     np.zeros((T, self.S - self.user_streams), bool)], axis=1)
            else:   # padded engine and no caller mask: inert pad rows
                active = np.concatenate(
                    [np.ones((T, self.user_streams), bool),
                     np.zeros((T, self.S - self.user_streams), bool)], axis=1)
        return super().tick_many(new_samples, counts, active, dt)

    def read_pixels(self) -> np.ndarray:
        return np.asarray(self._last_pixels)[:self.user_streams]

    def read_decibels(self) -> np.ndarray:
        return super().read_decibels()[:self.user_streams]

    def load_state(self, path: str, keep: list[int] | None = None) -> None:
        """Resume (optionally row-migrating, see ServingEngine.load_state)
        and re-place the loaded host arrays across the mesh — the
        checkpoint-based re-provision flow :meth:`resized` points
        multi-host pods at.  Every process must call this (and the save
        that produced ``path`` is itself collective,
        utils/checkpoint.save_pytree)."""
        super().load_state(path, keep=keep)
        self._place_buffers()

    @property
    def last_silent(self) -> np.ndarray:
        return np.asarray(self.state.last_silent)[:self.user_streams]

    @property
    def local_streams(self) -> tuple[int, int]:
        """[start, stop) of the global stream rows this process feeds.

        Multi-host deployments call ``feed``/``feed_batch`` for these rows
        only; remote rows' host-side queues are ignored at upload time."""
        return self._local_rows

    @property
    def pixels_sharded(self):
        """The untrimmed on-device sharded pixels (for device-side
        consumers composing across the mesh)."""
        return self._last_pixels


class ShardedMeterServingEngine(MeterServingEngine, ShardedServingEngine):
    """Mesh-sharded batched level-meter serving — meter mode at pod scale.

    Cooperative composition: MeterServingEngine contributes the device
    program (ring push → RMS/peak → asymmetric EMA → dBFS → gates,
    runtime/meter_serving.py) and ShardedServingEngine the placement
    (stream-axis data parallelism, padding/trimming, multi-host local
    rows, live mesh resize).  The meter reduction is pure per-stream
    jnp — no Pallas kernel, so it partitions cleanly with zero
    collectives; the [S, 1, C] level output carries a stream-only
    sharding (no pixel axis to tensor-parallelize, :meth:`_px_pspec`).
    """

    def _px_pspec(self, scan: bool) -> P:
        return (P(None, STREAM_AXIS) if scan else P(STREAM_AXIS))

    def _constrain_pixels(self, pixels):
        return jax.lax.with_sharding_constraint(
            pixels, NamedSharding(self.mesh, P(STREAM_AXIS)))

    @property
    def meter_values(self):
        """Latest levels [user_streams, C] dBFS (padding trimmed)."""
        return self.state.meter_val[:self.user_streams]
