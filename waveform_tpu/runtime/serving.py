"""High-throughput serving engine: device-resident windows, fused tick.

The production path for hundreds of concurrent streams: audio packets queue
on the host (metadata-only sync accounting, no sample copying into host
rings); each tick pushes only the newly arrived synced samples to the
device ring (dsp/devring.py) and runs push → spectrum → rebin as ONE jitted
call with donated state.  Display output stays on device; callers read it
back on their own cadence (e.g. every frame over PCIe, or never — downstream
device consumers compose directly).

Host-side A/V sync follows the reference exactly: the window must end
``dtsamples`` behind the freshest audio when timestamps run ahead of the
clock (get_audio_sync, /root/reference/src/source.hpp:279-285), mute
zero-fills (src/source.cpp:1878-1879), bogus timestamps clamp to the wall
clock at 16 s (src/source.cpp:1833-1837).
"""

from __future__ import annotations

import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CAPTURE_TIMEOUT_NS, MAX_TS_DELTA_NS, ResolvedConfig
from ..core.ring import audio_frames_to_ns, ns_to_audio_frames
from ..dsp.devring import DeviceRing, init_ring, push
from ..dsp.spectrum import (
    SpectrumState,
    display_decibels,
    init_state,
    kernel_bin_perm,
    make_spectrum_step,
)
from ..rebin.apply import make_rebin_fn

# Relay/PCIe-friendly upload ceiling: the links this engine crosses degrade
# sharply on very large single transfers (measured on the tunnel: >10 MB
# H2D collapses), so bulk uploads split into <=8 MB chunks along the
# leading axis and concatenate on device.
H2D_CHUNK_BYTES = 8 << 20


def chunked_put(x: np.ndarray, sharding=None):
    """Host→device transfer in <=8 MB pieces (leading-axis split)."""
    x = np.ascontiguousarray(x)
    if x.ndim == 0 or x.nbytes <= H2D_CHUNK_BYTES:
        return jax.device_put(x, sharding)
    row = max(x.nbytes // max(x.shape[0], 1), 1)
    rows = max(int(H2D_CHUNK_BYTES // row), 1)
    parts = [jax.device_put(x[i:i + rows], sharding)
             for i in range(0, x.shape[0], rows)]
    return jnp.concatenate(parts, axis=0)


def link_rtt() -> float:
    """Median round trip of a minimal dispatch on the default backend —
    the per-dispatch overhead microbatching amortizes.  A trivial program
    isolates launch+sync cost from compute/transfer."""
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((), jnp.float32)
    jax.block_until_ready(f(x))          # compile outside the timing
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def choose_microbatch(budget: float, rtt: float, tick: float,
                      mb_max: int = 8,
                      completion_factor: float = 3.0) -> int:
    """The auto-microbatch latency policy (shared by every engine family):

    * one tick already meets the budget → k=1 (lowest completion
      latency; nothing to amortize)
    * the non-RTT share fits the budget → the smallest k whose
      amortized cost RTT/k + (tick−RTT) meets it
    * budget unreachable (transfer/compute alone exceed it) → the
      smallest k whose next doubling would shave less than 10% of
      the non-RTT cost: amortization has flattened, and every further
      k only worsens per-frame completion p99

    Either way a COMPLETION guard bounds k: a flush's first frame
    completes after ~k·(tick−rtt) + rtt (it waits out the whole batch),
    and k stops doubling once the next doubling would push that past
    ``completion_factor × tick`` — amortized gains must not buy an
    unbounded per-frame completion p99 (the r4 artifact recorded k=8
    regressing p99 2.3× over manual k=4 for a 4% amortized gain; the
    reference's analog is its hard real-time frame budget,
    /root/reference/src/source.cpp:1156-1167).  The prediction is only
    as good as the probe's tick/rtt split, so the engines ALSO validate
    the chosen k against measured flushes (see ``validate_flush``).
    """
    rest = max(tick - rtt, 1e-6)
    if tick <= budget:
        return 1
    if rest < budget:
        need = rtt / (budget - rest)
    else:
        need = rtt / (0.2 * rest)   # RTT/(2k) <= 0.1*rest
    cap = max(completion_factor * tick, 2.0 * budget)
    k = 1
    while k < mb_max and k < need and 2 * k * rest + rtt <= cap:
        k *= 2
    return k


def validate_flush(flushes: list, k: int, probe_tick: float, budget: float,
                   completion_factor: float = 3.0) -> tuple[bool, int]:
    """Closed-loop check of a candidate microbatch k against MEASURED
    flush completions (batch-start → flush-ready; ``flushes[0]`` carries
    the scan compile and is dropped).

    The probe's tick/rtt split is unreliable over jittery links — the r4
    bench artifact shows the open-loop policy picking k=8 and regressing
    completion p99 689 ms vs manual k=4's 295 ms for a 4% amortized gain
    — so the engines confirm with real flushes before locking: accept
    only if the measured completion stays under the cap AND the
    amortized cost (flush/k) actually beats the measured k=1 tick.
    Returns (accept, next_k): on reject, retry at k//2 (k=1 always
    accepts by construction — it IS the probe baseline)."""
    flush = float(np.median(flushes[1:]))
    cap = max(completion_factor * probe_tick, 2.0 * budget)
    if flush <= cap and flush / k < probe_tick:
        return True, k
    return False, k // 2


class DeviceScalarCache:
    """Host value → cached device scalar, so steady-state ticks re-upload
    nothing but the packed input rows.  Bounded: clears wholesale past
    ``limit`` entries (shared by the serving engine and the output bus)."""

    __slots__ = ("_dtype", "_limit", "_map")

    def __init__(self, dtype, limit: int):
        self._dtype, self._limit = dtype, limit
        self._map: dict = {}

    def __call__(self, v):
        d = self._map.get(v)
        if d is None:
            if len(self._map) > self._limit:
                self._map.clear()
            d = self._map[v] = self._dtype(v)
        return d


class _PendingStream:
    """Host bookkeeping for one stream: queued packets + sync timestamps."""

    __slots__ = ("chunks", "rms_chunks", "queued", "capture_ts",
                 "audio_ts", "show")

    def __init__(self):
        self.chunks: deque[np.ndarray] = deque()      # [C, n] arrays
        self.rms_chunks: deque[np.ndarray] = deque()  # [n] raw squares
        self.queued = 0            # samples queued
        self.capture_ts = 0
        self.audio_ts = 0
        self.show = True



class AutoMicrobatchMixin:
    """The closed-loop microbatch="auto" state machine, shared by every
    engine family (spectrum/meter via ServingEngine, waveform via
    DeviceWaveformEngine): probe k=1 ticks, pick a completion-capped
    candidate via :func:`choose_microbatch`, then VALIDATE it against
    measured flushes (:func:`validate_flush`) before locking — reject →
    halve → re-validate.  Engines supply two hooks (their plain tick and
    their microbatch flush tick) plus an optional extra-state reset;
    everything else, including the subtle accept/halve bookkeeping that
    previously lived as two drifting copies, is THIS one implementation.
    """

    _PROBE_TICKS = 4        # k=1 ticks timed before deciding (first tick
                            # carries the compile and is discarded)
    _MB_MAX = 8             # worst-case completion grows one frame per k
    _VALIDATE_FLUSHES = 2   # measured flushes per candidate k (plus one
                            # dropped for the scan compile)
    _COMPLETION_FACTOR = 3.0  # flush completion cap, x the k=1 tick

    # -- engine hooks ------------------------------------------------------

    def _mb_plain_tick(self, now_ns: int, dt_f):
        """One normal k=1 tick (self.tick with _mb_auto masked off)."""
        raise NotImplementedError

    def _mb_flush_tick(self, now_ns: int, dt_f):
        """One microbatch-accumulating tick (self._tick_microbatch)."""
        raise NotImplementedError

    def _reset_mb_extra(self) -> None:
        """Engine-specific k-shaped state beyond the shared fields."""

    # ----------------------------------------------------------------------

    def _link_rtt(self) -> float:
        return link_rtt()

    def _choose_microbatch(self, budget: float, rtt: float,
                           tick: float) -> int:
        return choose_microbatch(budget, rtt, tick, self._MB_MAX)

    def _tick_probe(self, now_ns: int, dt_f=None):
        """Auto-mode startup: run normal k=1 ticks, timing completion;
        after _PROBE_TICKS pick a candidate k, then VALIDATE it against
        measured flushes before locking (the open-loop pick alone
        regressed completion p99 in the r4 artifact).  Frame semantics
        are identical to the chosen mode throughout."""
        if self._mb > 1:               # validation phase
            return self._tick_validate(now_ns, dt_f)
        t0 = time.perf_counter()
        self._mb_auto = False          # plain tick below
        try:
            out = self._mb_plain_tick(now_ns, dt_f)
        finally:
            self._mb_auto = True
        jax.block_until_ready(out)
        self._probe_ticks.append(time.perf_counter() - t0)
        if len(self._probe_ticks) > self._PROBE_TICKS:
            self._probe_tick = float(
                np.median(self._probe_ticks[1:]))            # drop compile
            k = self._choose_microbatch(1.0 / self.cfg.fps,
                                        self._link_rtt(), self._probe_tick)
            if k <= 1:
                self._mb_auto = False
                self._mb = 1
            else:
                self._mb = k           # candidate: validate before locking
                self._val_flushes: list[float] = []
        return out

    def _tick_validate(self, now_ns: int, dt_f=None):
        """Run the candidate k as real microbatch ticks, timing each
        batch-start -> flush-ready completion; after _VALIDATE_FLUSHES
        measured flushes (plus one dropped for the scan compile), accept
        or halve (:func:`validate_flush`)."""
        if self._mb_fill == 0:
            self._val_t0 = time.perf_counter()
        self._mb_auto = False
        try:
            out = self._mb_flush_tick(now_ns, dt_f)
        finally:
            self._mb_auto = True
        if self._mb_fill == 0:         # a flush just completed
            jax.block_until_ready(out)
            self._val_flushes.append(time.perf_counter() - self._val_t0)
            if len(self._val_flushes) > self._VALIDATE_FLUSHES:
                ok, nk = validate_flush(
                    self._val_flushes, self._mb, self._probe_tick,
                    1.0 / self.cfg.fps, self._COMPLETION_FACTOR)
                if ok:
                    self._mb_auto = False
                    self._mb_completion = float(
                        np.median(self._val_flushes[1:]))
                elif nk <= 1:
                    self._mb_auto = False
                    self._mb = 1
                    self._reset_mb_state()
                else:
                    self._mb = nk      # re-validate the halved candidate
                    self._val_flushes = []
                    self._reset_mb_state()
        return out

    def _reset_mb_state(self) -> None:
        """Drop k-shaped microbatch machinery so the next tick rebuilds
        it at the current ``self._mb`` (validation stepping k down)."""
        self._mb_bufs = None
        self._mb_fences = [None, None]
        self._mb_fill = 0
        self._mb_slots = []
        self._scan_packed = None
        self._reset_mb_extra()

    @property
    def microbatch(self) -> int:
        """The active microbatch k (after "auto" resolves its probe)."""
        return self._mb

    @property
    def microbatch_completion(self) -> float | None:
        """Measured median batch-start->flush-ready completion (s) of the
        validated k, when "auto" resolved through validation — the
        engine's own per-frame completion prediction for the bench line."""
        return getattr(self, "_mb_completion", None)


class ServingEngine(AutoMicrobatchMixin):
    """Batched device-resident spectrum serving for S streams."""

    # meter subclass (runtime/meter_serving.py) packs (counts, fresh, show)
    # meta columns instead of (counts, show&&fresh, rms)
    _split_meta = False

    def _spectrum_step_kwargs(self) -> dict:
        """Single-device engines use the all-in-VMEM Pallas exact kernel
        directly; the mesh-sharded subclass overrides this (a pallas_call
        has no SPMD partitioning rule — parallel/sharded_serving.py wraps
        it in a stream-axis shard_map instead)."""
        return {}

    def _check_mode(self, cfg: ResolvedConfig) -> None:
        if not cfg.spectrum_mode:
            raise ValueError("ServingEngine handles spectrum mode; use "
                             "MeterServingEngine for meter mode and "
                             "WaveformEngine/DeviceWaveformEngine for "
                             "waveform mode")

    def _wants_rms(self, cfg: ResolvedConfig) -> bool:
        """Whether the packed rows carry the raw RMS-squares block (volume
        normalization applies to spectrum output only, the reference's
        tick_spectrum gain add, src/source_generic.cpp:161-167)."""
        return cfg.normalize_volume

    def __init__(self, cfg: ResolvedConfig, num_streams: int,
                 hop_budget: int | None = None, rfft_fn=None,
                 use_native: bool | None = None,
                 microbatch: int | str = 1):
        self._check_mode(cfg)
        self.cfg = cfg
        self.S = num_streams
        self.C = max(cfg.capture_channels, 1)
        # kept for resized(): rebuild with identical construction choices
        self._rfft_fn = rfft_fn
        self._use_native_req = use_native
        # microbatch > 1: ticks accumulate k assembled frames and dispatch
        # them as ONE lax.scan every k-th tick (see :meth:`tick`) — the
        # live-path latency amortizer for links where each dispatch pays a
        # round trip.  Per-frame semantics are identical to k single ticks.
        # "auto": probe the link at startup and choose k (see
        # :meth:`_auto_microbatch`).
        self._mb_auto = microbatch == "auto"
        self._mb_req = microbatch
        self._probe_ticks: list[float] = []
        self._mb = 1 if self._mb_auto else max(int(microbatch), 1)
        self._mb_fill = 0
        self._mb_slots: list = []
        self._mb_uniform: list = []
        self._mb_dts: list = []
        self._mb_bufs = None
        self._mb_fences: list = [None, None]
        self._mb_flip = 0
        self._scan_packed = None
        self._scan_packed_u = None
        self._last_batch = None
        # hop budget: max new samples consumed per stream per tick; default
        # 2 video frames of audio so jitter doesn't stall the window
        self.H = hop_budget or (2 * int(cfg.audio.samples_per_sec / cfg.fps)
                                + 16)
        self._pending = [_PendingStream() for _ in range(num_streams)]
        self._normalize = self._wants_rms(cfg)
        # One packed row per stream — C*H samples, the H raw RMS squares
        # ONLY when volume normalization needs them (the upload is the
        # live path's dominant cost over thin links; at C=2 the optional
        # block is a third of the row), then (counts, active, input_rms) —
        # so a per-tick dispatch costs ONE host→device transfer instead of
        # five.  Over links where every transfer pays a round trip (the
        # relay tunnel here; PCIe doorbells in production) this is the
        # difference between ~5 RTTs and 1 on the latency-critical path.
        #
        # The buffer is DOUBLE-buffered with a completion fence: jit-argument
        # transfers may be consumed asynchronously after dispatch returns
        # (and `device_put(...).block_until_ready()` does not guarantee the
        # host source was read on every backend — observed on the forced
        # multi-device CPU client), so a tick must not overwrite the host
        # memory a still-in-flight tick reads.  Alternating two buffers and
        # blocking on the output of the tick that last used a buffer before
        # rewriting it makes reuse safe while keeping one tick in flight.
        self._bufs = [np.zeros((num_streams, self.packed_width), np.float32)
                      for _ in range(2)]
        self._fences: list = [None, None]
        self._flip = 0
        # The deferred-read hazard is a property of XLA:CPU's client (it may
        # consume a jit-argument's host memory after dispatch returns —
        # reproduced on the forced multi-device CPU mesh).  Accelerator
        # clients serialize/stage the transfer during the call, and blocking
        # costs a link round trip per tick there, so the fence only arms on
        # CPU.  The two-buffer rotation itself stays on everywhere.
        self._fence_on = jax.default_backend() == "cpu"
        self._bind_buf(0)
        self._dt_scalar = DeviceScalarCache(jnp.float32, 64)
        self._count_scalar = DeviceScalarCache(jnp.int32, 4096)
        # feed_batch fast path (shared sync state)
        self._batch_chunks: deque[np.ndarray] = deque()
        self._batch_queued = 0
        self._batch_mode = False

        # native C++ assembler (waveform_tpu/native): per-stream rings +
        # sync + batched hop assembly without per-stream Python work
        self._native = None
        if use_native or use_native is None:
            try:
                from ..native import NativeAssembler
                self._native = NativeAssembler(
                    num_streams, self.C, cfg.fft_size,
                    cfg.audio.samples_per_sec, cfg.ts_offset_ns,
                    prefill=False, rms=self._normalize)
            except (RuntimeError, OSError):
                if use_native:
                    raise
                self._native = None

        self._init_device_state()
        # natural bin order unless the spectrum program build resolves the
        # Pallas kernel's block layout (mode hooks that never build a
        # spectrum step — the meter engine — keep None)
        self._bin_perm = None
        self._bin_inv = None
        self._build_device_programs()
        assert np.shares_memory(self._push_buf, self._in_buf)
        self._tick_cohort = None
        self._row0 = 0
        self._last_pixels = None
        self._render_batch = None
        self._place_buffers()

    def _init_device_state(self) -> None:
        """Allocate the device-resident per-stream state (mode hook).

        The sample ring stores FLAT [S*C, L] (see DeviceRing.channels):
        the 3-D [S, 2, L] form tiled T(2,128) and paid a full-ring
        relayout copy into the exact kernel's T(8,128) blocks every tick
        plus a 2-sublane push fusion — measured −13% device-true tick
        time from this one representation change (v5e, N=4096/S=256)."""
        cfg = self.cfg
        self.ring = init_ring(self.S, self.C, cfg.fft_size, flat=True)
        self.state = init_state(cfg, self.S)
        # device-resident volume-normalization RMS window: the reference
        # keeps a 1 s host ring of per-timepoint max-channel squares
        # (src/source.cpp:1843-1871, 810-835); here it rides the same
        # device-ring mechanism as the samples, synced by construction
        if self._normalize:
            self.rms_ring = init_ring(self.S, 1, cfg.input_rms_size,
                                      flat=True)
        else:
            self.rms_ring = None

    def _display_values(self, state):
        """State → display output for one tick (mode hook): rebinned
        spectrum dBFS here; meter levels in MeterServingEngine."""
        return display_decibels(self.cfg, state)

    def _build_device_programs(self) -> None:
        """Compile the mode's packed-tick and bulk-scan programs (mode
        hook; MeterServingEngine swaps the spectrum step for the meter
        reduction, keeping every host-side path identical).

        When the magnitudes ride the Pallas exact kernel, the WHOLE
        device pipeline (kernel output, EMA trail, dB buffer, rebin
        input) carries the kernel's block bin layout: the kernel writes
        its native rows, the rebin's constant tables permute to match
        (rebin/apply.py), and no per-tick bin relayout exists anywhere —
        the r4 device trace itemized 21 µs/tick (12%) of pure relayout
        on this path.  ``self._bin_perm`` records the layout for the
        boundary conversions (readback, render, checkpoints)."""
        cfg, rfft_fn = self.cfg, self._rfft_fn
        step_kwargs = self._spectrum_step_kwargs()
        self._bin_perm = kernel_bin_perm(cfg, rfft_fn, **step_kwargs)
        # position of each natural bin — the build-time inverse every
        # host-side boundary (readback, checkpoint relayout) reuses
        self._bin_inv = (None if self._bin_perm is None
                         else np.argsort(self._bin_perm))
        step = make_spectrum_step(
            cfg, **step_kwargs,
            bin_order="block" if self._bin_perm is not None else "natural",
            **({} if rfft_fn is None else {"rfft_fn": rfft_fn}))
        rebin = make_rebin_fn(cfg, apply_pixel_map=False,
                              bin_perm=self._bin_perm)
        normalize = self._normalize
        rms_size = cfg.input_rms_size

        def fused_tick(new, counts, ring: DeviceRing, state: SpectrumState,
                       dt, active, rms, rms_ring: DeviceRing | None = None,
                       rms_sq=None):
            ring = push(ring, new, counts)
            if normalize and rms_ring is not None:
                # rms_sq holds raw (pre-mute) per-timepoint max-channel
                # squares: the reference computes the normalization RMS
                # before the mute zero-fill (src/source.cpp:1843-1871)
                rms_ring = push(rms_ring, rms_sq, counts)
                rms = jnp.sqrt(jnp.sum(rms_ring.buf, axis=-1) / rms_size)
            state = step(ring.view3, state, dt, active, rms)
            pixels = self._constrain_pixels(rebin(display_decibels(cfg, state)))
            return pixels, ring, state, rms_ring

        C, H = self.C, self.H

        def packed_tick(flat, ring, state, dt, rms_ring=None, ucount=None):
            """fused_tick on the single packed host upload (see _in_buf).

            ``ucount`` (scalar int32) replaces the per-stream counts column
            when the host knows every stream advanced in lockstep — the
            steady serving state — selecting the scalar lane-shift ring
            push instead of the batched gather (see dsp/devring.py)."""
            s = flat.shape[0]
            new = flat[:, :C * H].reshape(s, C, H)
            rms_sq = (flat[:, C * H:C * H + H] if normalize else None)
            counts = (flat[:, -3].astype(jnp.int32) if ucount is None
                      else ucount)
            active = flat[:, -2] > 0.5
            rms = flat[:, -1]
            return fused_tick(new, counts, ring, state, dt, active, rms,
                              rms_ring, rms_sq)

        self._tick_packed = self._jit_tick_packed(packed_tick)
        self._tick_packed_u = self._jit_tick_packed_u(packed_tick)
        self._packed_tick_fn = packed_tick   # for cohort binding (multi.py)

        def scan_ticks(new_T, counts_T, ring, state, dt, active_T, rms,
                       rms_ring=None):
            """T ticks in one dispatch (bulk/offline processing; the pushed
            samples are raw — no mute path — so the RMS squares derive from
            them directly)."""
            def body(carry, xs):
                ring, state, rms_ring = carry
                new, counts, active = xs
                ring = push(ring, new, counts)
                r = rms
                if normalize and rms_ring is not None:
                    sq = jnp.max(jnp.abs(new), axis=1) ** 2
                    rms_ring = push(rms_ring, sq, counts)
                    r = jnp.sqrt(jnp.sum(rms_ring.buf, axis=-1) / rms_size)
                state = step(ring.view3, state, dt, active, r)
                return ((ring, state, rms_ring),
                        self._constrain_pixels(
                            rebin(display_decibels(cfg, state))))
            (ring, state, rms_ring), pxs = jax.lax.scan(
                body, (ring, state, rms_ring), (new_T, counts_T, active_T))
            return pxs, ring, state, rms_ring

        self._scan_ticks = self._jit_scan(scan_ticks)

    def _build_scan_packed(self):
        """Compile the microbatch flush programs: k packed ticks chained
        through one lax.scan (state carried on device), so a flush costs
        ONE dispatch for k frames.  Two variants, like the single-tick
        path: per-stream counts read from the rows, or a [k] vector of
        uniform per-tick counts selecting the scalar lane-shift push."""
        pt = self._packed_tick_fn

        # the k slots arrive as SEPARATE jit arguments (a tuple), stacked
        # inside the program: argument transfers ride jit's cheap C++
        # dispatch path and the whole flush is ONE round trip — eager
        # per-slot device_puts measured 4 extra RTTs per flush on the
        # relay (77.7 vs 19.9 ms/frame amortized at k=4, S=256)
        def scan_packed(slots, ring, state, dts, rms_ring=None):
            def body(carry, xs):
                ring, state, rms_ring = carry
                flat, dt = xs
                px, ring, state, rms_ring = pt(flat, ring, state, dt,
                                               rms_ring)
                return (ring, state, rms_ring), px
            (ring, state, rms_ring), pxs = jax.lax.scan(
                body, (ring, state, rms_ring), (jnp.stack(slots), dts))
            return pxs, ring, state, rms_ring

        def scan_packed_u(slots, ring, state, dts, rms_ring, ucounts):
            def body(carry, xs):
                ring, state, rms_ring = carry
                flat, dt, uc = xs
                px, ring, state, rms_ring = pt(flat, ring, state, dt,
                                               rms_ring, uc)
                return (ring, state, rms_ring), px
            (ring, state, rms_ring), pxs = jax.lax.scan(
                body, (ring, state, rms_ring), (jnp.stack(slots), dts,
                                                ucounts))
            return pxs, ring, state, rms_ring

        self._scan_packed = self._jit_scan_packed(scan_packed)
        self._scan_packed_u = self._jit_scan_packed_u(scan_packed_u)

    def _bind_buf(self, i: int) -> None:
        """Point the assembly views at packed buffer ``i``, first waiting on
        the output fence of the tick that last uploaded from it."""
        if self._bufs is None:   # released by bind_cohort
            self._bufs = [np.zeros((self.S, self.packed_width), np.float32)
                          for _ in range(2)]
        fence = self._fences[i]
        if fence is not None:
            jax.block_until_ready(fence)
            self._fences[i] = None
        self._bind_external(self._bufs[i])

    # -- hooks the sharded engine overrides (parallel/sharded_serving.py) --

    def _jit_tick_packed(self, packed_tick):
        return jax.jit(packed_tick, donate_argnums=(1, 2, 4))

    def _jit_tick_packed_u(self, packed_tick):
        """The uniform-advance program: same tick with a scalar count as the
        trailing argument (see ``packed_tick``'s ``ucount``)."""
        return jax.jit(packed_tick, donate_argnums=(1, 2, 4))

    def _uniform_counts_T(self, T: int, hop: int):
        """Default bulk-mode counts: [T] scalars (uniform advance per tick,
        the scalar ring-push path); the sharded engine widens to [T, S] so
        its per-argument shardings stay rank-consistent."""
        return jnp.full((T,), hop, jnp.int32)

    def _jit_scan(self, scan_ticks):
        return jax.jit(scan_ticks, donate_argnums=(2, 3, 7))

    def _jit_scan_packed(self, fn):
        return jax.jit(fn, donate_argnums=(1, 2, 4))

    def _jit_scan_packed_u(self, fn):
        return jax.jit(fn, donate_argnums=(1, 2, 4))

    def _prep_mb_slot(self, x):
        """Microbatch slot → flush-dispatch argument.  Host arrays pass
        through (jit-argument transfer, the cheap path) unless a slot
        alone would cross the 8 MB single-transfer cliff (sharded engine:
        mesh/process-local placement instead)."""
        return x if x.nbytes <= H2D_CHUNK_BYTES else chunked_put(x)


    def _place_buffers(self) -> None:
        """Final placement of ring/state after construction (no-op single
        device; the sharded engine device_puts them across the mesh)."""

    def _prep(self, x):
        """Host input → jit argument (sharded engine: mesh placement).

        Returns the numpy array as-is: jit's C++ dispatch path transfers
        arguments ~5× cheaper than an eager ``device_put`` (measured 28 µs
        vs 131 µs per call).  Host-buffer reuse safety is the double-buffer
        fence's job (:meth:`_bind_buf`), not this transfer's."""
        return x

    def _prep_scan(self, x):
        """Like :meth:`_prep` for [T, S, ...] bulk inputs (stream axis 1);
        splits big uploads into <=8 MB chunks (see :func:`chunked_put`)."""
        return chunked_put(np.asarray(x))

    def _constrain_pixels(self, pixels):
        """Traced-side output-sharding hook (sharded engine: stream × pixel
        constraint so XLA keeps the rebin stage tensor-parallel)."""
        return pixels

    # ------------------------------------------------------------------

    def feed(self, stream: int, data: np.ndarray | None, timestamp_ns: int,
             now_ns: int | None = None, muted: bool = False) -> None:
        """Queue one packet ([channels, frames] float32 planar)."""
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        cfg = self.cfg
        frames = 0 if data is None else data.shape[-1]
        if frames == 0 or cfg.capture_channels == 0:
            return  # dead source (reference capture_audio early-returns)
        if self._native is not None:
            if data is not None:
                data = np.asarray(
                    data[cfg.channel_base:cfg.channel_base + self.C],
                    np.float32)
            self._native.feed(stream, data,
                              timestamp_ns, now_ns, muted
                              and not cfg.settings.ignore_mute)
            return
        p = self._pending[stream]
        p.capture_ts = now_ns
        audio_len = audio_frames_to_ns(cfg.audio.samples_per_sec, frames)
        if abs(timestamp_ns - now_ns) > MAX_TS_DELTA_NS:
            p.audio_ts = now_ns
        else:
            p.audio_ts = timestamp_ns + audio_len

        raw = None
        if data is not None:
            raw = np.asarray(
                data[cfg.channel_base:cfg.channel_base + self.C], np.float32)
            if raw.shape[0] < self.C:  # zero-fill missing channels
                raw = np.vstack([raw, np.zeros(
                    (self.C - raw.shape[0], frames), np.float32)])
        if self._normalize:
            # raw (pre-mute) per-timepoint max-channel squares
            sq = (np.zeros(frames, np.float32) if raw is None
                  else np.max(np.abs(raw), axis=0).astype(np.float32) ** 2)
            p.rms_chunks.append(sq)
        if (muted and not cfg.settings.ignore_mute) or raw is None:
            chunk = np.zeros((self.C, frames), np.float32)
        else:
            chunk = raw
        p.chunks.append(chunk)
        p.queued += frames
        # bound the queue: never hold more than sync reserve + one window +
        # one hop (the analog of the capture-side trim, src/source.cpp:1883-86)
        dtaudio = self._audio_sync(p, now_ns)
        dtsamples = (ns_to_audio_frames(cfg.audio.samples_per_sec, dtaudio)
                     if dtaudio > 0 else 0)
        max_q = dtsamples + cfg.fft_size + self.H
        while p.queued > max_q and p.chunks:
            drop = p.queued - max_q
            head = p.chunks[0]
            if head.shape[-1] <= drop:
                p.queued -= head.shape[-1]
                p.chunks.popleft()
                if p.rms_chunks:
                    p.rms_chunks.popleft()
            else:
                p.chunks[0] = head[:, drop:]
                if p.rms_chunks:
                    p.rms_chunks[0] = p.rms_chunks[0][drop:]
                p.queued -= drop
                break

    def _audio_sync(self, p: _PendingStream, ts: int) -> int:
        audio_ts = p.audio_ts + self.cfg.ts_offset_ns
        delta = min(abs(audio_ts - ts), MAX_TS_DELTA_NS)
        return -delta if audio_ts < ts else delta

    def feed_batch(self, data: np.ndarray, timestamp_ns: int,
                   now_ns: int | None = None) -> None:
        """Synchronized ingestion for all S streams at once.

        ``data`` is [S, channels, frames] float32 planar with one shared
        timestamp — the fan-out case (one mixing bus, S consumers) and the
        fast path for serving: O(1) Python work per tick instead of O(S).
        Streams fed this way share sync state; don't mix with per-stream
        ``feed`` on the same engine.
        """
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        cfg = self.cfg
        frames = data.shape[-1]
        if frames == 0 or cfg.capture_channels == 0:
            return
        if self._native is not None:
            self._native.feed_batch(
                np.asarray(data[:, cfg.channel_base:cfg.channel_base + self.C],
                           np.float32), timestamp_ns, now_ns)
            return
        p = self._pending[0]  # shared sync bookkeeping
        p.capture_ts = now_ns
        audio_len = audio_frames_to_ns(cfg.audio.samples_per_sec, frames)
        p.audio_ts = (now_ns if abs(timestamp_ns - now_ns) > MAX_TS_DELTA_NS
                      else timestamp_ns + audio_len)
        self._batch_mode = True
        self._batch_chunks.append(
            np.asarray(data[:, cfg.channel_base:cfg.channel_base + self.C],
                       np.float32))
        self._batch_queued += frames
        dtaudio = self._audio_sync(p, now_ns)
        dtsamples = (ns_to_audio_frames(cfg.audio.samples_per_sec, dtaudio)
                     if dtaudio > 0 else 0)
        max_q = dtsamples + cfg.fft_size + self.H
        while self._batch_queued > max_q and self._batch_chunks:
            drop = self._batch_queued - max_q
            head = self._batch_chunks[0]
            if head.shape[-1] <= drop:
                self._batch_queued -= head.shape[-1]
                self._batch_chunks.popleft()
            else:
                self._batch_chunks[0] = head[..., drop:]
                self._batch_queued -= drop
                break

    def _assemble_batch(self, now_ns: int):
        """Vectorized push-buffer assembly for the feed_batch path."""
        cfg = self.cfg
        p = self._pending[0]
        sr = cfg.audio.samples_per_sec
        dtaudio = self._audio_sync(p, now_ns)
        reserve = ns_to_audio_frames(sr, dtaudio) if dtaudio > 0 else 0
        take = min(max(self._batch_queued - reserve, 0), self.H)
        got = 0
        self._push_buf[:] = 0.0
        while got < take and self._batch_chunks:
            head = self._batch_chunks[0]
            n = head.shape[-1]
            use = min(n, take - got)
            self._push_buf[:, :, got:got + use] = head[..., :use]
            if use == n:
                self._batch_chunks.popleft()
            else:
                self._batch_chunks[0] = head[..., use:]
            self._batch_queued -= use
            got += use
        active = p.show and (now_ns - p.capture_ts) <= CAPTURE_TIMEOUT_NS
        counts = np.full(self.S, take, np.int32)
        return counts, np.full(self.S, active, bool)

    # ------------------------------------------------------------------

    def tick(self, now_ns: int | None = None, dt: float | None = None):
        """One batched frame. Returns the on-device pixels [S, D, P].

        All host-side inputs travel as ONE packed [S, C*H+H+3] upload
        (``_in_buf``); state stays donated on device, so the per-tick
        host↔device traffic is exactly one transfer plus the dispatch.

        With ``microbatch=k`` the engine instead accumulates k assembled
        frames and dispatches them as ONE scan every k-th tick: per-frame
        semantics are identical, dispatch overhead amortizes k×, and the
        return value is the latest *flushed* frame (up to k−1 frames
        behind; ``last_batch_pixels`` carries all k).  This is the live-
        path analog of ``tick_many`` for links where every dispatch pays
        a round trip (the relay tunnel; production per-launch overhead)."""
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        dt_f = (1.0 / self.cfg.fps) if dt is None else float(dt)
        if self._mb_auto:   # probe (k=1) or validation (candidate k) phase
            return self._tick_probe(now_ns, dt_f)
        if self._mb > 1:
            return self._tick_microbatch(now_ns, dt_f)
        dtv = self._dt_scalar(dt_f)
        self._flip ^= 1
        self._bind_buf(self._flip)
        self._assemble(now_ns)

        uniform, c0 = self._uniform_count()
        if uniform:
            # lockstep advance (the steady state): scalar ring push
            pixels, self.ring, self.state, self.rms_ring = \
                self._tick_packed_u(
                    self._prep(self._in_buf), self.ring, self.state, dtv,
                    self.rms_ring, self._count_scalar(c0))
        else:
            pixels, self.ring, self.state, self.rms_ring = self._tick_packed(
                self._prep(self._in_buf), self.ring, self.state, dtv,
                self.rms_ring)
        self._last_pixels = pixels
        # fence: this buffer may be rewritten only once these pixels exist
        if self._fence_on:
            self._fences[self._flip] = pixels
        return pixels

    def _tick_microbatch(self, now_ns: int, dt_f: float):
        """Accumulate one assembled frame; flush k frames as one scan.
        Each accumulated tick keeps its own dt (the scan consumes a [k]
        vector), so gravity/EMA trails match k microbatch=1 ticks fed the
        same per-frame dts exactly."""
        k = self._mb
        if self._mb_bufs is None:
            self._mb_bufs = [
                np.zeros((k, self.S, self.packed_width), np.float32)
                for _ in range(2)]
        if self._mb_fill == 0:
            self._mb_flip ^= 1
            fence = self._mb_fences[self._mb_flip]
            if fence is not None:
                jax.block_until_ready(fence)
                self._mb_fences[self._mb_flip] = None
            self._mb_slots = []
            self._mb_uniform = []
            self._mb_dts = []
        slot = self._mb_bufs[self._mb_flip][self._mb_fill]
        self._bind_external(slot)
        self._assemble(now_ns)
        self._mb_uniform.append(self._uniform_count())
        self._mb_slots.append(slot)
        self._mb_dts.append(dt_f)
        self._mb_fill += 1
        if self._mb_fill < k:
            return self._last_pixels
        self._mb_fill = 0
        if self._scan_packed is None:
            self._build_scan_packed()
        slots = tuple(self._prep_mb_slot(s) for s in self._mb_slots)
        self._mb_slots = []
        dts = jnp.asarray(np.asarray(self._mb_dts, np.float32))
        if all(u for u, _ in self._mb_uniform):
            ucounts = jnp.asarray(
                np.array([c for _, c in self._mb_uniform], np.int32))
            pxs, self.ring, self.state, self.rms_ring = self._scan_packed_u(
                slots, self.ring, self.state, dts, self.rms_ring, ucounts)
        else:
            pxs, self.ring, self.state, self.rms_ring = self._scan_packed(
                slots, self.ring, self.state, dts, self.rms_ring)
        self._last_batch = pxs
        self._last_pixels = pxs[-1]
        if self._fence_on:
            self._mb_fences[self._mb_flip] = pxs
        return self._last_pixels

    @property
    def last_batch_pixels(self):
        """Device pixels of the last microbatch flush: [k, S, D, P]."""
        return self._last_batch

    # -- auto microbatch policy: shared machinery (AutoMicrobatchMixin) --

    def _mb_plain_tick(self, now_ns: int, dt_f):
        return self.tick(now_ns=now_ns, dt=dt_f)

    def _mb_flush_tick(self, now_ns: int, dt_f):
        return self._tick_microbatch(now_ns, dt_f)

    def _reset_mb_extra(self) -> None:
        self._mb_uniform = []
        self._mb_dts = []
        self._scan_packed_u = None

    def _uniform_count(self) -> tuple[bool, int]:
        """Host-side program choice for this tick: True selects the scalar
        lane-shift push.  Decided from host-local data, so it is forced
        off on multi-host meshes — processes would otherwise pick
        DIFFERENT compiled collectives from their different local counts
        (SPMD divergence: every process must launch the same program)."""
        if jax.process_count() > 1:
            return False, 0
        counts_col = self._meta_buf[:, 0]
        c0 = counts_col[0]
        return bool((counts_col == c0).all()), int(c0)

    def _assemble(self, now_ns: int) -> None:
        """Fill the bound packed buffer: samples, RMS squares, counts,
        active flags (the host half of the tick)."""
        cfg = self.cfg
        sr = cfg.audio.samples_per_sec

        if self._native is not None:
            # C++ writes samples, RMS squares, counts and active directly
            # into the packed rows — zero Python-side repacking
            self._native.assemble_hop_packed(
                now_ns, self.H, self._in_buf, self._normalize,
                split_active=self._split_meta)
        elif self._batch_mode:
            counts, active = self._assemble_batch(now_ns)
            if self._normalize:
                np.square(np.max(np.abs(self._push_buf), axis=1),
                          out=self._rms_buf)
            self._meta_buf[:, 0] = counts
            if self._split_meta:
                p0 = self._pending[0]
                self._meta_buf[:, 1] = (
                    (now_ns - p0.capture_ts) <= CAPTURE_TIMEOUT_NS)
                self._meta_buf[:, 2] = p0.show
            else:
                self._meta_buf[:, 1] = active
        else:
            self._push_buf[:] = 0.0
            self._rms_buf[:] = 0.0
            for i, p in enumerate(self._pending):
                fresh = (now_ns - p.capture_ts) <= CAPTURE_TIMEOUT_NS
                if self._split_meta:
                    self._meta_buf[i, 1] = fresh
                    self._meta_buf[i, 2] = p.show
                else:
                    self._meta_buf[i, 1] = p.show and fresh
                # consume everything except the sync reserve, capped at the
                # hop budget (the device window absorbs them; excess stays
                # queued)
                dtaudio = self._audio_sync(p, now_ns)
                reserve = (ns_to_audio_frames(sr, dtaudio)
                           if dtaudio > 0 else 0)
                take = min(max(p.queued - reserve, 0), self.H)
                self._meta_buf[i, 0] = take
                got = 0
                while got < take and p.chunks:
                    head = p.chunks[0]
                    n = head.shape[-1]
                    use = min(n, take - got)
                    self._push_buf[i, :, got:got + use] = head[:, :use]
                    if self._normalize and p.rms_chunks:
                        self._rms_buf[i, got:got + use] = p.rms_chunks[0][:use]
                        if use == p.rms_chunks[0].shape[-1]:
                            p.rms_chunks.popleft()
                        else:
                            p.rms_chunks[0] = p.rms_chunks[0][use:]
                    if use == n:
                        p.chunks.popleft()
                    else:
                        p.chunks[0] = head[:, use:]
                    p.queued -= use
                    got += use

    # -- cohort mode (runtime/multi.py): many engines, one upload --------

    @property
    def packed_width(self) -> int:
        """Row width of the packed per-tick upload: C*H samples, the H
        RMS squares only under volume normalization, 3 meta columns."""
        return (self.C * self.H
                + (self.H if self._normalize else 0) + 3)

    def bind_cohort(self, row0: int) -> None:
        """Compile the cohort tick: this engine's rows live at
        [row0, row0+S) of a shared uploaded block (one transfer serves
        every engine in the cohort; see MultiEngine)."""
        pt = self._packed_tick_fn
        S = self.S
        self._row0 = row0

        def cohort_tick(cohort, ring, state, dt, rms_ring=None, ucount=None):
            flat = jax.lax.slice_in_dim(cohort, row0, row0 + S, axis=0)
            return pt(flat, ring, state, dt, rms_ring, ucount)

        # cohort is NOT donated: sibling engines read other row blocks
        self._tick_cohort = jax.jit(cohort_tick, donate_argnums=(1, 2, 4))
        # the private double buffers are dead weight in cohort mode
        # (~2 x S x (C*H+H+3) floats per group); _bind_buf reallocates
        # lazily if the engine is ever ticked standalone again
        self._bufs = None
        self._fences = [None, None]

    def _bind_external(self, view: np.ndarray) -> None:
        """Point the assembly views at an externally owned packed block
        (a row slice of a cohort buffer; the caller owns double-buffering
        and fences)."""
        CH, H = self.C * self.H, self.H
        R = H if self._normalize else 0
        self._in_buf = view
        self._push_buf = view[:, :CH].reshape(-1, self.C, H)
        self._rms_buf = view[:, CH:CH + R]
        self._meta_buf = view[:, CH + R:]

    def tick_from_cohort(self, cohort_dev, now_ns: int,
                         dt: float | None = None):
        """Dispatch this engine's tick against an already-uploaded cohort
        block.  ``_bind_external`` + ``_assemble`` must have run for this
        tick before the cohort was uploaded."""
        dtv = self._dt_scalar((1.0 / self.cfg.fps) if dt is None else dt)
        uniform, c0 = self._uniform_count()
        if uniform:
            out = self._tick_cohort(cohort_dev, self.ring, self.state, dtv,
                                    self.rms_ring, self._count_scalar(c0))
        else:
            out = self._tick_cohort(cohort_dev, self.ring, self.state, dtv,
                                    self.rms_ring)
        pixels, self.ring, self.state, self.rms_ring = out
        self._last_pixels = pixels
        return pixels

    def tick_many(self, new_samples, counts=None, active=None,
                  dt: float | None = None):
        """Bulk mode: process T video frames in one device dispatch.

        ``new_samples`` is [T, S, C, hop] (device or host array) — each tick
        advances every stream's window by ``counts[t, s]`` (default: full
        hop) and runs the complete pipeline.  Returns pixels [T, S, D, P]
        (on device) and updates ring/state.  This is the offline/recorded-
        audio path: one dispatch amortizes launch latency over T×S frames.
        """
        T, S = new_samples.shape[0], self.S
        hop = new_samples.shape[-1]
        if counts is None:
            counts = self._uniform_counts_T(T, hop)
        if active is None:
            active = jnp.ones((T, S), bool)
        dt = (1.0 / self.cfg.fps) if dt is None else dt
        rms = self._prep(np.zeros(S, np.float32))
        pxs, self.ring, self.state, self.rms_ring = self._scan_ticks(
            self._prep_scan(np.asarray(new_samples, np.float32)),
            self._prep_scan(np.asarray(counts)),
            self.ring, self.state, jnp.float32(dt),
            self._prep_scan(np.asarray(active)), rms, self.rms_ring)
        self._last_pixels = pxs[-1]
        return pxs

    def read_pixels(self) -> np.ndarray:
        """Host readback of the latest rebinned frame (synchronizes)."""
        return np.asarray(self._last_pixels)

    def read_decibels(self) -> np.ndarray:
        """Host readback of the display dB buffer, in NATURAL bin order
        (a block-order engine unpermutes on the host — readback is a
        boundary, not the hot path)."""
        db = np.asarray(self._display_values(self.state))
        if self._bin_perm is not None:
            db = db[..., self._bin_inv]
        return db

    def render_frames(self) -> jnp.ndarray:
        """RGBA frames for ALL streams in ONE jitted dispatch.

        Returns [S, outH, outW, 4] f32 on device — the batched analog of
        the reference's per-source render() draw call
        (src/source.cpp:1346-1358), vmapped over the stream axis so a
        whole scene rasterizes without per-stream Python dispatch.  With
        ``hide_on_silent``, latched streams render fully transparent (the
        reference's render() early return, src/source.cpp:1349-1350).
        """
        if self._render_batch is None:
            from ..render.raster import make_renderer
            render = make_renderer(self.cfg, bin_perm=self._bin_perm)

            def batch(state):
                imgs = jax.vmap(render)(self._display_values(state))
                if self.cfg.settings.hide_on_silent:
                    keep = ~state.last_silent
                    imgs = imgs * keep[:, None, None, None].astype(
                        imgs.dtype)
                return imgs

            self._render_batch = jax.jit(batch)
        return self._render_batch(self.state)

    @property
    def last_silent(self) -> np.ndarray:
        """Per-stream silence latch — with hide_on_silent, renderers skip
        latched streams (the reference's render() early return,
        src/source.cpp:1349-1350)."""
        return np.asarray(self.state.last_silent)

    def set_show(self, stream: int, show: bool) -> None:
        """The reference's show()/hide() callbacks (source.hpp:314-346):
        a hidden source's graph decays exactly like a capture timeout —
        the tick gates on shown-AND-recently-captured
        (source_avx2.cpp:36-48)."""
        self._pending[stream].show = bool(show)
        if self._native is not None:
            self._native.set_show(stream, bool(show))

    def resized(self, num_streams: int,
                keep: list[int] | None = None) -> "ServingEngine":
        """A new engine with ``num_streams`` rows; row ``i`` carries over
        old row ``keep[i]``'s analysis state (device window, EMA trail, dB
        buffer, silence latch, RMS window) and host sync bookkeeping; rows
        beyond ``len(keep)`` start fresh.  ``keep`` defaults to the first
        ``min(S, num_streams)`` rows.

        This is the live-scene resize (OBS adds/removes sources at any
        time).  The reference rebuilds EVERYTHING on any topology or
        settings change — update() frees and re-allocates every buffer and
        re-registers capture (src/source.cpp:1077-1322, 1243-1248) — so
        carrying the device state across is strictly more continuity than
        the program being matched.  Queued-but-unticked audio does not
        migrate (the native assembler re-syncs from the next packet; the
        reference's rebuild likewise restarts capture with a silence
        prefill)."""
        if keep is None:
            keep = list(range(min(self.S, num_streams)))
        if len(keep) > num_streams:
            raise ValueError(f"keep ({len(keep)} rows) exceeds "
                             f"num_streams={num_streams}")
        if any(not 0 <= j < self.S for j in keep):
            # an out-of-range index would silently clamp in the device
            # gather and migrate the WRONG stream's state
            raise ValueError(f"keep indices out of range for S={self.S}: "
                             f"{keep}")
        eng = type(self)(self.cfg, num_streams, hop_budget=self.H,
                         rfft_fn=self._rfft_fn,
                         use_native=self._use_native_req,
                         microbatch=(self._mb_req if self._mb_auto
                                     else self._mb))
        k = len(keep)
        if k:
            idx = jnp.asarray(np.asarray(keep, np.int32))

            def mig(new, old):
                return new.at[:k].set(old[idx])

            def mig_ring(new_r: DeviceRing, old_r: DeviceRing) -> DeviceRing:
                # migrate at STREAM granularity through the 3-D view (flat
                # rings store [S*C, L]; row i there is a (stream, channel)
                # pair, not a stream)
                v = mig(new_r.view3, old_r.view3)
                return DeviceRing(
                    buf=v.reshape(new_r.buf.shape), channels=new_r.channels)

            eng.ring = mig_ring(eng.ring, self.ring)
            eng.state = jax.tree.map(mig, eng.state, self.state)
            if self.rms_ring is not None and eng.rms_ring is not None:
                eng.rms_ring = mig_ring(eng.rms_ring, self.rms_ring)
            for i, j in enumerate(keep):
                eng._pending[i] = self._pending[j]
            if self._native is not None and eng._native is not None:
                # carry sync timestamps + visibility so surviving streams
                # stay ACTIVE across the swap (without this every group
                # member reads capture_ts=0 and decays as timed-out for a
                # tick); the ring backlog stays behind by design
                for i, j in enumerate(keep):
                    eng._native.set_sync(i, *self._native.get_sync(j))
        return eng

    # ------------------------------------------------------------------

    def _state_bin_relayout(self, state, to_natural: bool):
        """Convert a SpectrumState's bin axis between this engine's
        storage layout and the checkpoint's CANONICAL natural order.
        Checkpoints always store natural bins so they stay portable
        across backends/engines whose kernel routing differs (a CPU
        engine resumes a TPU block-order checkpoint and vice versa)."""
        if self._bin_perm is None or not hasattr(state, "tsmooth"):
            return state
        from ..utils.checkpoint import to_host
        idx = (self._bin_inv if to_natural
               else np.asarray(self._bin_perm))
        return state.replace(
            tsmooth=to_host(state.tsmooth)[..., idx],
            decibels=to_host(state.decibels)[..., idx])

    def save_state(self, path: str) -> None:
        """Checkpoint device state (EMA trails, dB buffers, latches, ring).
        Bin axes are canonicalized to natural order (see
        :meth:`_state_bin_relayout`)."""
        from ..utils.checkpoint import save_pytree
        save_pytree(path, (self._state_bin_relayout(self.state, True),
                           self.ring, self.rms_ring))

    def load_state(self, path: str, keep: list[int] | None = None) -> None:
        """Resume a checkpoint into this engine (same config).

        ``keep`` additionally migrates stream rows: checkpoint row
        ``keep[i]`` lands in this engine's row ``i`` and rows beyond
        ``len(keep)`` keep their current state — the checkpoint-based
        re-provision flow for topology changes that live ``resized()``
        cannot perform (multi-host pods; see
        parallel/sharded_serving.py)."""
        from ..utils.checkpoint import load_pytree
        # the template must be in the checkpoint's CANONICAL natural
        # order: with ``keep``, rows beyond len(keep) are filled FROM the
        # template, and handing load_pytree this engine's block-order
        # rows would double-permute them through the final relayout below
        state, self.ring, self.rms_ring = load_pytree(
            path, (self._state_bin_relayout(self.state, True),
                   self.ring, self.rms_ring), keep=keep)
        self.state = self._state_bin_relayout(state, False)
