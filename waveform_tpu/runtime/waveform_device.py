"""Device-resident batched waveform (oscilloscope) engine.

The reference's waveform tick is per-source, host-sequential
(/root/reference/src/source_generic.cpp:271-390): pop-to-sync, per-pixel
timestamp resample, ``std::rotate`` scroll, fresh-tail dBFS.  The host-NumPy
ports (``WaveformScroller`` per stream, ``BatchedWaveformScroller`` for
shared-sync fans) keep that structure; this engine is the TPU-native
redesign for S streams with **independent sync states**:

* samples live in a device ring ``[S, C, L]`` (dsp/devring.py); the host
  pushes only new arrivals per tick,
* the per-pixel resample becomes one batched gather keyed on host-computed
  per-stream index rows (timestamp math stays host-side int64 — TPU ints
  are 32-bit and ns timestamps don't fit),
* the scroll is the same concat + vmapped dynamic-slice pattern as the
  ring advance, shifted per stream by its own fresh-pixel count,
* fresh-tail |x|→dBFS conversion, mono fold, silence latch and volume
  normalization (device-resident synced RMS ring, like ServingEngine) are
  masked elementwise ops — one jitted step for the whole fleet.
"""

from __future__ import annotations

import time
from collections import deque

import jax
import jax.numpy as jnp
import numpy as np

from .serving import AutoMicrobatchMixin

from ..core.config import (
    CAPTURE_TIMEOUT_NS,
    DB_MIN,
    MAX_TS_DELTA_NS,
    ResolvedConfig,
)
from ..core.ring import audio_frames_to_ns
from ..dsp.devring import DeviceRing, init_ring, push
from ..dsp.spectrum import dbfs


class _WfStream:
    __slots__ = ("chunks", "rms_chunks", "queued", "capture_ts", "audio_ts",
                 "waveform_ts", "total", "show")

    def __init__(self):
        self.chunks: deque[np.ndarray] = deque()
        self.rms_chunks: deque[np.ndarray] = deque()
        self.queued = 0
        self.capture_ts = 0
        self.audio_ts = 0
        self.waveform_ts = 0
        self.total = 0      # the reference ring's post-trim size
        self.show = True


class DeviceWaveformEngine(AutoMicrobatchMixin):
    """Batched oscilloscope serving for S independently-synced streams."""

    def __init__(self, cfg: ResolvedConfig, num_streams: int,
                 hop_budget: int | None = None, max_lead_s: float = 0.25,
                 microbatch: int | str = 1,
                 use_native: bool | None = None):
        if cfg.display_mode.value != "waveform":
            raise ValueError("DeviceWaveformEngine needs waveform mode")
        self.cfg = cfg
        self.S = num_streams
        self._max_lead_s = max_lead_s   # kept for resized()
        self._use_native_req = use_native
        C = max(cfg.capture_channels, 1)
        self.C = C
        self.W = cfg.fft_size  # display width in pixels (src/source.cpp:1140)
        sr = cfg.audio.samples_per_sec
        self.H = hop_budget or (2 * int(sr / cfg.fps) + 16)
        # Ring sizing: waveform window + the worst sync reserve the ring can
        # track + one hop of slack.  The reserve has two parts: the user ts
        # offset, and timestamps running ahead of the clock (a pre-buffering
        # player) — the host scroller's growable ring absorbs leads up to
        # MAX_TS_DELTA_NS (16 s); a static device ring budgets ``max_lead_s``
        # of it (HBM: S·C·L·4 B) and CLAMPS larger leads at tick time, so an
        # extreme lead renders early instead of freezing the scope.
        reserve_cap = max(cfg.ts_offset_ns, 0) * sr // 1_000_000_000
        lead_cap = int(max_lead_s * sr)
        self._reserve_limit = int(reserve_cap + lead_cap)
        self.L = int(cfg.waveform_samples + self._reserve_limit + self.H)
        self.step_ns = (cfg.meter_ms * 1_000_000) // self.W

        self._streams = [_WfStream() for _ in range(num_streams)]
        # vectorized-assembly scratch (see _assemble): per-stream int64
        # state snapshots + the per-pixel timestamp offsets
        self._pix = np.arange(self.W, dtype=np.int64) * self.step_ns
        self._v_hidden = np.zeros(num_streams, bool)
        self._v_take = np.zeros(num_streams, np.int64)
        self._v_left = np.zeros(num_streams, np.int64)
        self._v_audio = np.zeros(num_streams, np.int64)
        self._v_total0 = np.zeros(num_streams, np.int64)
        self._v_wts = np.zeros(num_streams, np.int64)
        # startup prefill: fft_size (= width) silent samples, exactly like
        # StreamSource (src/source.cpp:1243-1248; runtime/source.py:76-80)
        for p in self._streams:
            p.chunks.append(np.zeros((C, cfg.fft_size), np.float32))
            p.queued = cfg.fft_size
            if cfg.normalize_volume:
                p.rms_chunks.append(np.zeros(cfg.fft_size, np.float32))

        self.ring = init_ring(num_streams, C, self.L)
        O = max(cfg.output_channels, C)
        self.O = O
        self.buf = jnp.full((num_streams, O, self.W), DB_MIN, jnp.float32)
        self.latch = jnp.zeros((num_streams,), bool)
        self._normalize = cfg.normalize_volume
        if self._normalize:
            # slack beyond the 1 s window: sync-reserve squares park at the
            # tail and the windowed sum skips them (drained only once the
            # matching samples pass the reserve, like update_input_rms,
            # runtime/source.py)
            self.rms_ring = init_ring(
                num_streams, 1, cfg.input_rms_size + self._reserve_limit)
        else:
            self.rms_ring = None

        # native C++ assembler (waveform_tpu/native): per-stream rings +
        # sync + the whole waveform host assembly (drain, int64 timestamp
        # math, gather-index rows) without per-stream Python work — the
        # r4 bench measured the NumPy assembly at 1.8 ms/tick (S=256,
        # W=4096) against a 0.20 ms/frame device step; the C++ path is
        # what closes that host-side wall (same move as ServingEngine's)
        self._native = None
        if use_native or use_native is None:
            try:
                from ..native import NativeAssembler
                self._native = NativeAssembler(
                    num_streams, C, cfg.fft_size,
                    cfg.audio.samples_per_sec, cfg.ts_offset_ns,
                    prefill=True, rms=self._normalize)
                # waveform mode trims the feed queue to the device ring's
                # flat capacity (feed() NOTE below), not the spectrum rule
                self._native.set_trim_cap(self.L)
            except (RuntimeError, OSError):
                if use_native:
                    raise
                self._native = None
        self._place_buffers()

        # All host-side per-tick inputs ride ONE packed [S, packed_width]
        # upload — samples, RMS squares, the per-pixel gather rows and the
        # 5 meta columns (counts, n, run, timeout, reserve) — exactly the
        # ServingEngine discipline (serving.py:156-173): over links where
        # every transfer pays a round trip this turns the waveform tick's
        # former 8 transfers into 1, and it is what lets waveform groups
        # join MultiEngine upload cohorts.  Double-buffered with completion
        # fences: jit-argument transfers may be consumed after dispatch
        # returns, so a tick must not overwrite host memory an in-flight
        # tick still reads (same scheme as ServingEngine._bind_buf).
        self._bufs = [
            np.zeros((num_streams, self.packed_width), np.float32)
            for _ in range(2)]
        self._fences: list = [None, None]
        self._flip = 0
        # fence arms only on XLA:CPU (see ServingEngine: accelerator clients
        # stage transfers during the call; CPU may defer the host read)
        self._fence_on = jax.default_backend() == "cpu"
        self._bind_external(self._bufs[0])
        self._build_device_programs()
        self._tick_cohort = None
        self._row0 = 0
        # microbatch (k-frame scan flush), the ServingEngine live-path
        # latency amortizer: k assembled packed slots flush as ONE scan
        # dispatch with frame-identical semantics; "auto" probes the link
        # RTT and picks k via the shared policy (serving.choose_microbatch)
        self._mb_auto = microbatch == "auto"
        self._mb_req = microbatch
        self._mb = 1 if self._mb_auto else max(int(microbatch), 1)
        self._mb_fill = 0
        self._mb_slots: list = []
        self._mb_bufs = None
        self._mb_fences: list = [None, None]
        self._mb_flip = 0
        self._scan_packed = None
        self._probe_ticks: list[float] = []

    # ------------------------------------------------------------------

    def _make_step(self):
        cfg = self.cfg
        C, O, W, L = self.C, self.O, self.W, self.L
        D = 2 if cfg.stereo else 1
        stereo = cfg.stereo
        normalize = self._normalize
        rms_size = cfg.input_rms_size if self._normalize else 1

        def step(ring: DeviceRing, buf, latch, new, counts, idx, n, run,
                 timeout, rms_ring: DeviceRing | None = None, rms_sq=None,
                 reserve=None):
            ring = push(ring, new, counts)
            input_rms = jnp.zeros((new.shape[0],), jnp.float32)
            if normalize and rms_ring is not None:
                rms_ring = push(rms_ring, rms_sq[:, None, :], counts)
                # window the 1 s sum to end at the sync reserve: squares for
                # frames the display hasn't consumed yet sit in the tail and
                # must not lead the gain (host spec: update_input_rms drains
                # only past the reserve, runtime/source.py:180-200)
                Lr = rms_ring.buf.shape[-1]

                def rms_window(row, res):
                    start = jnp.clip(Lr - res - rms_size, 0, Lr - rms_size)
                    return jax.lax.dynamic_slice_in_dim(row, start, rms_size)

                win = jax.vmap(rms_window)(rms_ring.buf[:, 0], reserve)
                input_rms = jnp.sqrt(jnp.sum(win, axis=-1) / rms_size)

            # batched resample gather: sample ``idx`` frames from the end
            gpos = jnp.clip(L - idx, 0, L - 1)                 # [S, W]
            gathered = jnp.take_along_axis(
                ring.buf, jnp.broadcast_to(gpos[:, None, :],
                                           ring.buf.shape[:2] + (W,)),
                axis=-1)                                        # [S, C, W]

            # scroll by n fresh pixels: (buf ++ new_pixels)[n : n+W]
            ext = jnp.concatenate([buf[:, :C], gathered], axis=-1)

            def shift(row, k):
                return jax.lax.dynamic_slice_in_dim(row, k, W, axis=-1)

            scrolled = jax.vmap(shift)(ext, n)
            run_b = run[:, None, None]
            bufC = jnp.where(run_b, scrolled, buf[:, :C])

            # silence latch on the post-scroll mixed raw/dB buffer — the
            # exact WaveformScroller semantics (waveform_host.py:104-115)
            nonzero = jnp.any(bufC != 0.0, axis=-1)             # [S, C]
            silent = ~jnp.any(nonzero, axis=-1)                 # [S]
            new_latch = jnp.where(run, silent, latch)

            out = buf.at[:, :C].set(bufC)
            if O > C:
                out = out.at[:, 1].set(
                    jnp.where(run_b[:, 0], bufC[:, 0], out[:, 1]))

            # fresh-tail dB conversion with fold (src_generic.cpp:366-381).
            # Only REAL capture channels convert: the reference's per-
            # channel loop covers counts[ch] pixels and counts[ch] == 0
            # for ch >= capture_channels, so a stereo display of mono
            # capture keeps channel 1's fresh tail RAW (the pre-conversion
            # channel-0 copy, source_generic.cpp:363-371)
            pos = jnp.arange(W)[None, :]
            fresh = (pos >= (W - n)[:, None]) & run[:, None] \
                & ~new_latch[:, None]                           # [S, W]
            DC = min(D, C) if stereo else 1
            if stereo:
                conv = dbfs(jnp.abs(out[:, :DC]))
            elif C > 1:
                conv = dbfs((jnp.abs(out[:, 0])
                             + jnp.abs(out[:, 1])) * 0.5)[:, None]
            else:
                conv = dbfs(jnp.abs(out[:, 0]))[:, None]
            if normalize:
                comp = jnp.minimum(cfg.volume_target - dbfs(input_rms),
                                   cfg.max_gain)
                conv = conv + comp[:, None, None]
            out = out.at[:, :DC].set(
                jnp.where(fresh[:, None, :], conv, out[:, :DC]))

            # silence fill + timeout fill (DB_MIN once unless latched)
            fill = (run & new_latch) | (timeout & ~latch)
            out = out.at[:, :D].set(
                jnp.where(fill[:, None, None], DB_MIN, out[:, :D]))
            new_latch = jnp.where(timeout, True, new_latch)

            # tiny non-donated completion token: the ring/out/latch outputs
            # are donated into the NEXT step, so the host fences on this
            # scalar instead (it exists ⇔ this step consumed its uploads)
            token = out[0, 0, 0]
            return ring, out, new_latch, rms_ring, token

        return step

    # -- packed upload + cohort interface (the ServingEngine contract) ---

    @property
    def packed_width(self) -> int:
        """Row width of the packed per-tick upload: C*H samples, the H RMS
        squares only under volume normalization, the W per-pixel gather
        indices (exact in float32: they are < L < 2**24), and 5 meta
        columns (counts, n, run, timeout, reserve)."""
        R = self.H if self._normalize else 0
        return self.C * self.H + R + self.W + 5

    def _bind_external(self, view: np.ndarray) -> None:
        """Point the assembly views at an externally owned packed block (a
        row slice of a cohort buffer; the caller owns double-buffering and
        fences) — same contract as ServingEngine._bind_external."""
        CH, H, W = self.C * self.H, self.H, self.W
        R = H if self._normalize else 0
        self._in_buf = view
        self._push_buf = view[:, :CH].reshape(-1, self.C, H)
        self._rms_buf = view[:, CH:CH + R]
        self._idx_buf = view[:, CH + R:CH + R + W]
        self._meta_buf = view[:, CH + R + W:]

    def _bind_buf(self, i: int) -> None:
        if self._bufs is None:   # released by bind_cohort
            self._bufs = [
                np.zeros((self.S, self.packed_width), np.float32)
                for _ in range(2)]
        fence = self._fences[i]
        if fence is not None:
            jax.block_until_ready(fence)
            self._fences[i] = None
        self._bind_external(self._bufs[i])

    def _build_device_programs(self) -> None:
        step = self._make_step()
        C, H, W = self.C, self.H, self.W
        normalize = self._normalize
        R = H if normalize else 0

        def packed_tick(flat, ring, buf, latch, rms_ring=None):
            s = flat.shape[0]
            new = flat[:, :C * H].reshape(s, C, H)
            off = C * H
            rms_sq = flat[:, off:off + R] if normalize else None
            off += R
            idx = flat[:, off:off + W].astype(jnp.int32)
            off += W
            counts = flat[:, off].astype(jnp.int32)
            n = flat[:, off + 1].astype(jnp.int32)
            run = flat[:, off + 2] > 0.5
            timeout = flat[:, off + 3] > 0.5
            reserve = flat[:, off + 4].astype(jnp.int32)
            return step(ring, buf, latch, new, counts, idx, n, run,
                        timeout, rms_ring, rms_sq, reserve)

        self._packed_tick_fn = packed_tick
        self._tick_packed = self._jit_tick_packed(packed_tick)

    # -- placement hooks (overridden by parallel.ShardedWaveformEngine) --

    def _place_buffers(self) -> None:
        """Initial placement of ring/buf/latch/rms_ring (default: wherever
        jnp created them; the mesh-sharded subclass re-places them with a
        stream-axis sharding)."""

    def _prep(self, x):
        """Host packed buffer → jit argument (identity here; multi-host
        sharded engines contribute only their local stream rows)."""
        return x

    def _prep_mb_slot(self, x):
        from .serving import H2D_CHUNK_BYTES, chunked_put
        return x if x.nbytes <= H2D_CHUNK_BYTES else chunked_put(x)

    def _jit_tick_packed(self, fn):
        return jax.jit(fn, donate_argnums=(1, 2, 3, 4))

    def _jit_scan_packed(self, fn):
        return jax.jit(fn, donate_argnums=(1, 2, 3, 4))

    def bind_cohort(self, row0: int) -> None:
        """Compile the cohort tick: this engine's rows live at
        [row0, row0+S) of a shared uploaded block (one transfer serves
        every engine in the cohort; see MultiEngine)."""
        pt = self._packed_tick_fn
        S = self.S
        self._row0 = row0

        def cohort_tick(cohort, ring, buf, latch, rms_ring=None):
            flat = jax.lax.slice_in_dim(cohort, row0, row0 + S, axis=0)
            return pt(flat, ring, buf, latch, rms_ring)

        # cohort is NOT donated: sibling engines read other row blocks
        self._tick_cohort = jax.jit(cohort_tick, donate_argnums=(1, 2, 3, 4))
        self._bufs = None   # dead weight in cohort mode (see ServingEngine)
        self._fences = [None, None]

    def tick_from_cohort(self, cohort_dev, now_ns: int,
                         dt: float | None = None):
        """Dispatch this engine's tick against an already-uploaded cohort
        block (``_bind_external`` + ``_assemble`` must have run for this
        tick before the cohort was uploaded).  Returns the non-donated
        completion token (the display buffer is donated into the next
        step; read it via :attr:`display`/:meth:`render_values`)."""
        self.ring, self.buf, self.latch, self.rms_ring, token = \
            self._tick_cohort(cohort_dev, self.ring, self.buf, self.latch,
                              self.rms_ring)
        return token

    # ------------------------------------------------------------------

    def feed(self, stream: int, data: np.ndarray | None, timestamp_ns: int,
             now_ns: int | None = None, muted: bool = False) -> None:
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        cfg = self.cfg
        frames = 0 if data is None else data.shape[-1]
        if frames == 0 or cfg.capture_channels == 0:
            return
        if self._native is not None:
            if data is not None:
                data = np.asarray(
                    data[cfg.channel_base:cfg.channel_base + self.C],
                    np.float32)
            self._native.feed(stream, data, timestamp_ns, now_ns,
                              muted and not cfg.settings.ignore_mute)
            return
        p = self._streams[stream]
        p.capture_ts = now_ns
        audio_len = audio_frames_to_ns(cfg.audio.samples_per_sec, frames)
        if abs(timestamp_ns - now_ns) > MAX_TS_DELTA_NS:
            p.audio_ts = now_ns
        else:
            p.audio_ts = timestamp_ns + audio_len

        # data is non-None here (frames == 0 early-returns above)
        raw = np.asarray(
            data[cfg.channel_base:cfg.channel_base + self.C], np.float32)
        if raw.shape[0] < self.C:
            raw = np.vstack([raw, np.zeros(
                (self.C - raw.shape[0], frames), np.float32)])
        if self._normalize:
            # raw (pre-mute) squares, like the reference (src/source.cpp:1843)
            p.rms_chunks.append(
                np.max(np.abs(raw), axis=0).astype(np.float32) ** 2)
        chunk = (np.zeros((self.C, frames), np.float32)
                 if muted and not cfg.settings.ignore_mute else raw)
        p.chunks.append(chunk)
        p.queued += frames
        # NOTE: the reference's capture-side drop-oldest trim
        # (src/source.cpp:1883-1886) is implicit here — the device ring
        # keeps the newest L samples and the tick caps the gather depth
        # (``total``) at the reference's max ring size, so over-old samples
        # simply fall out of reach.  Dropping queued-but-unpushed samples
        # would instead punch a discontinuity into the device ring.  A
        # sanity bound protects against a runaway feeder:
        max_q = self.L
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

    def feed_batch(self, data: np.ndarray, timestamp_ns: int,
                   now_ns: int | None = None, muted: bool = False) -> None:
        """Synchronized ingestion for all S streams at once.

        ``data`` is [S, channels, frames] float32 planar with one shared
        timestamp — the fan-out case and the serving fast path: one native
        call (or one Python loop in the fallback) instead of S ctypes
        round trips.  Same contract as :meth:`ServingEngine.feed_batch`."""
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        cfg = self.cfg
        frames = data.shape[-1]
        if frames == 0 or cfg.capture_channels == 0:
            return
        if self._native is not None:
            self._native.feed_batch(
                np.asarray(
                    data[:, cfg.channel_base:cfg.channel_base + self.C],
                    np.float32),
                timestamp_ns, now_ns, muted and not cfg.settings.ignore_mute)
            return
        for s in range(self.S):
            self.feed(s, data[s], timestamp_ns, now_ns=now_ns, muted=muted)

    def set_show(self, stream: int, show: bool) -> None:
        self._streams[stream].show = show
        if self._native is not None:
            self._native.set_show(stream, bool(show))

    # ------------------------------------------------------------------

    def _assemble(self, now_ns: int) -> None:
        """Fill the bound packed buffer: samples, RMS squares, per-pixel
        gather rows and the 5 meta columns (the host half of the tick —
        all int64 timestamp math stays here; TPU ints are 32-bit).

        VECTORIZED over streams: the original per-stream Python loop ran
        ~20 numpy calls per stream and measured 6.6 ms/tick at S=256
        (W=4096) — 2.5× the whole device step and the real waveform-mode
        capacity wall.  Only the chunk drain (a data-dependent deque
        walk) stays per stream; every timestamp/reserve computation runs
        as [S]-shaped int64 array math with semantics identical to the
        scalar loop (the host parity suites in
        tests/test_waveform_device.py pin this), and the per-pixel index
        math is bounded to the FRESH columns via the closed-form ni (see
        below).  Measured at S=256/W=4096 on the dev box: 6.56 → ~1 ms
        per tick (phase-1 python loop + memsets dominate what remains)."""
        cfg = self.cfg
        W = self.W
        S = self.S
        sr = cfg.audio.samples_per_sec
        NSC = 1_000_000_000

        if self._native is not None:
            # C++ writes the whole row — drained samples, RMS squares,
            # gather indices and the 5 meta columns — with bit-identical
            # int64 semantics (tests pin display equality vs this path)
            self._native.assemble_waveform(
                now_ns, self.H, W, self.step_ns,
                int(cfg.waveform_samples), self.L, self._reserve_limit,
                self._in_buf, self._normalize)
            return

        meta = self._meta_buf
        self._push_buf[:] = 0.0
        if self._normalize:
            self._rms_buf[:] = 0.0
        self._idx_buf[:] = 1.0
        meta[:] = 0.0

        # --- phase 1: per-stream drain + state pickup (deque walk) ------
        # The drain runs UNCONDITIONALLY, hidden or not: the device ring
        # is the reference's capture ring, which fills on the audio thread
        # regardless of show — otherwise feed()'s queue trim punches a gap
        # and a resume gathers garbled stale samples across it.
        hidden = self._v_hidden
        take_a = self._v_take
        left_a = self._v_left
        audio_a = self._v_audio
        total0 = self._v_total0
        wts0 = self._v_wts
        for i, p in enumerate(self._streams):
            hidden[i] = ((not p.show)
                         or (now_ns - p.capture_ts) > CAPTURE_TIMEOUT_NS)
            # consume up to the hop budget; any backlog stays queued and
            # the effective "newest sample" timestamp excludes it, so the
            # gather only references samples really in the device ring
            take = min(p.queued, self.H)
            take_a[i] = take
            left_a[i] = p.queued - take
            audio_a[i] = p.audio_ts
            total0[i] = p.total
            wts0[i] = p.waveform_ts
            got = 0
            while got < take and p.chunks:
                head = p.chunks[0]
                m = head.shape[-1]
                use = min(m, take - got)
                self._push_buf[i, :, got:got + use] = head[:, :use]
                if self._normalize and p.rms_chunks:
                    self._rms_buf[i, got:got + use] = p.rms_chunks[0][:use]
                    if use == p.rms_chunks[0].shape[-1]:
                        p.rms_chunks.popleft()
                    else:
                        p.rms_chunks[0] = p.rms_chunks[0][use:]
                if use == m:
                    p.chunks.popleft()
                else:
                    p.chunks[0] = head[:, use:]
                p.queued -= use
                got += use

        # --- phase 2: vectorized timestamp / reserve / index math -------
        # Exact int64 floor-division equivalents of audio_frames_to_ns /
        # ns_to_audio_frames / ts_to_frames; every multiply operates on a
        # bounded DELTA (≤16 s or ≤L frames), so int64 never overflows
        # even for epoch-scale wall timestamps.
        audio_eff = audio_a - (left_a * NSC) // sr
        delta = audio_eff + cfg.ts_offset_ns - now_ns
        lag = np.minimum(np.abs(delta), MAX_TS_DELTA_NS)
        reserve = np.where(delta > 0, (lag * sr) // NSC, 0)
        # the static device ring budgets _reserve_limit of lead; an
        # extreme timestamp lead clamps (renders early) instead of
        # starving the gather forever (the host ring would grow)
        np.minimum(reserve, self._reserve_limit, out=reserve)
        # reference ring size this tick: last tick's reserve + arrivals,
        # trimmed (feed-side) to reserve + waveform window
        total = np.minimum(total0 + take_a,
                           np.minimum(cfg.waveform_samples + reserve,
                                      self.L))
        meta[:, 0] = take_a      # counts
        meta[:, 3] = hidden      # timeout (display blanks; drain ran)
        meta[:, 4] = reserve

        run = ~hidden & (total > reserve)
        start_ts = audio_eff - (total * NSC) // sr
        stop_ts = audio_eff - (reserve * NSC) // sr
        # timestamp rollover: give up on this tick's render
        run &= (start_ts < audio_eff) & (stop_ts <= audio_eff)
        wts = np.where(wts0 < start_ts, start_ts, wts0)
        wts = np.where((wts > stop_ts) & (wts - stop_ts > self.step_ns),
                       start_ts, wts)
        # fresh-pixel count in closed form: the scalar loop's ok-mask is
        # ok(p) = (wts + p·step < stop_ts)  — ts ≥ wts always holds in
        # int64 (wts + W·step can't wrap) — which is monotone in p, so
        # #leading-Trues = ceil((stop−wts)/step), capped at W.  This
        # replaces an [S, W] mask + argmin AND bounds the index math
        # below to the FRESH columns only: at steady 60 fps ni ≈
        # W·hop/window ≪ W (e.g. ~140 of 4096), a ~30× cut in the only
        # remaining [S, ·] array work.
        span = stop_ts - wts
        ni = np.clip((span + self.step_ns - 1) // self.step_ns, 0, W)
        ni = np.where(run, ni, 0)
        meta[:, 1] = ni          # fresh pixels
        meta[:, 2] = run
        nmax = int(ni.max()) if S else 0
        if nmax:
            # gather indices < L < 2**24: exact as float32 row entries
            tsn = wts[:, None] + self._pix[None, :nmax]     # [S, nmax]
            frames = ((audio_eff[:, None] - tsn) * sr) // NSC
            idx = np.clip(frames, (reserve + 1)[:, None], total[:, None])
            colmask = (np.arange(nmax)[None, :] < ni[:, None]) \
                & run[:, None]
            np.copyto(self._idx_buf[:, :nmax], idx.astype(np.float32),
                      where=colmask)
        new_wts = np.where(run, wts + ni * self.step_ns, wts0)
        new_total = np.where(run, reserve, total)  # consumed to the reserve
        for i, p in enumerate(self._streams):
            p.waveform_ts = int(new_wts[i])
            p.total = int(new_total[i])

    def tick(self, now_ns: int | None = None):
        """One batched frame; returns on-device display [S, D, W].

        All host-side inputs travel as ONE packed upload (``_in_buf``);
        without volume normalization the row simply has no RMS block, so
        the program never reads (or pays for) it.

        With ``microbatch=k`` the engine accumulates k assembled frames
        and dispatches them as ONE scan every k-th tick (frame-identical
        semantics; the display is up to k−1 frames behind between
        flushes — the ServingEngine contract)."""
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        if self._mb_auto:   # probe (k=1) or validation (candidate k) phase
            return self._tick_probe(now_ns)
        if self._mb > 1:
            return self._tick_microbatch(now_ns)
        self._flip ^= 1
        self._bind_buf(self._flip)
        self._assemble(now_ns)
        self.ring, self.buf, self.latch, self.rms_ring, token = \
            self._tick_packed(self._prep(self._in_buf), self.ring, self.buf,
                              self.latch, self.rms_ring)
        # fence: the staging buffer is safe to rewrite once this step ran
        if self._fence_on:
            self._fences[self._flip] = token
        return self.display

    def _build_scan_packed(self) -> None:
        """Compile the microbatch flush: k packed ticks chained through
        one lax.scan (state carried on device).  The k slots arrive as
        SEPARATE jit arguments, stacked inside the program — the same
        one-round-trip shape ServingEngine measured out (serving.py)."""
        pt = self._packed_tick_fn

        def scan_packed(slots, ring, buf, latch, rms_ring=None):
            def body(carry, flat):
                ring, buf, latch, rms_ring = carry
                ring, buf, latch, rms_ring, token = pt(flat, ring, buf,
                                                       latch, rms_ring)
                return (ring, buf, latch, rms_ring), token
            (ring, buf, latch, rms_ring), tokens = jax.lax.scan(
                body, (ring, buf, latch, rms_ring), jnp.stack(slots))
            return ring, buf, latch, rms_ring, tokens[-1]

        self._scan_packed = self._jit_scan_packed(scan_packed)

    def _tick_microbatch(self, now_ns: int):
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
        slot = self._mb_bufs[self._mb_flip][self._mb_fill]
        self._bind_external(slot)
        self._assemble(now_ns)
        self._mb_slots.append(slot)
        self._mb_fill += 1
        if self._mb_fill < k:
            return self.display
        self._mb_fill = 0
        if self._scan_packed is None:
            self._build_scan_packed()
        slots = tuple(self._prep_mb_slot(s) for s in self._mb_slots)
        self._mb_slots = []
        self.ring, self.buf, self.latch, self.rms_ring, token = \
            self._scan_packed(slots, self.ring, self.buf, self.latch,
                              self.rms_ring)
        if self._fence_on:
            self._mb_fences[self._mb_flip] = token
        return self.display

    # -- auto microbatch: shared machinery (serving.AutoMicrobatchMixin;
    #    probe/validate/reset previously lived here as a drifting copy) --

    def _mb_plain_tick(self, now_ns: int, dt_f):
        return self.tick(now_ns=now_ns)

    def _mb_flush_tick(self, now_ns: int, dt_f):
        return self._tick_microbatch(now_ns)

    @property
    def display(self):
        return self.buf[:, :self.cfg.display_channels]

    @property
    def last_silent(self) -> np.ndarray:
        return np.asarray(self.latch)

    def render_values(self) -> np.ndarray:
        """Host copy of the display values [S, D, W] dBFS (the engine-
        family read MultiEngine/renderers use)."""
        return np.asarray(self.display)

    def resized(self, num_streams: int,
                keep: list[int] | None = None) -> "DeviceWaveformEngine":
        """Live-scene resize: row ``i`` of the new engine carries old row
        ``keep[i]``'s device state (sample ring, scroll buffer, silence
        latch, RMS window) and host sync object; rows beyond ``len(keep)``
        start fresh.  Same contract as :meth:`ServingEngine.resized`."""
        if keep is None:
            keep = list(range(min(self.S, num_streams)))
        if len(keep) > num_streams:
            raise ValueError(f"keep ({len(keep)} rows) exceeds "
                             f"num_streams={num_streams}")
        if any(not 0 <= j < self.S for j in keep):
            raise ValueError(f"keep indices out of range for S={self.S}: "
                             f"{keep}")
        eng = DeviceWaveformEngine(self.cfg, num_streams,
                                   hop_budget=self.H,
                                   max_lead_s=self._max_lead_s,
                                   microbatch=(self._mb_req if self._mb_auto
                                               else self._mb),
                                   use_native=self._use_native_req)
        k = len(keep)
        if not k:
            return eng
        idx = jnp.asarray(np.asarray(keep, np.int32))
        eng.ring = DeviceRing(buf=eng.ring.buf.at[:k].set(self.ring.buf[idx]))
        eng.buf = eng.buf.at[:k].set(self.buf[idx])
        eng.latch = eng.latch.at[:k].set(self.latch[idx])
        if self.rms_ring is not None and eng.rms_ring is not None:
            eng.rms_ring = DeviceRing(
                buf=eng.rms_ring.buf.at[:k].set(self.rms_ring.buf[idx]))
        for i, j in enumerate(keep):
            eng._streams[i] = self._streams[j]
        self._migrate_native(eng, keep)
        return eng

    def _migrate_native(self, eng: "DeviceWaveformEngine",
                        keep: list[int]) -> None:
        """Carry native sync timestamps + visibility + waveform scroll
        state so surviving streams stay active (and keep their resample
        cursor) across a live resize; ring backlog stays behind by design
        (sub-hop gap), exactly like ServingEngine.resized."""
        if self._native is None or eng._native is None:
            return
        for i, j in enumerate(keep):
            eng._native.set_sync(i, *self._native.get_sync(j))
            eng._native.set_wf_state(i, *self._native.get_wf_state(j))
