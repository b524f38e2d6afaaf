"""Output-bus fan-out: one mixed audio stream, many heterogeneous consumers.

The reference's ``output_bus`` capture mode taps OBS's mixed output and
feeds it to every waveform source configured against the bus — *any* source
type: spectrum, level meter, or oscilloscope, each keeping its own ring,
analysis state and smoothing even though they all see identical audio
(/root/reference/src/source.cpp:676-720: one ``audio_output_connect``
callback per source instance).

TPU-native redesign: consumers of one bus share ONE device ring sized to
the largest requested window, fed by ONE packed upload per tick; each
*distinct config* compiles one step that slices its own window off the
shared ring's tail, so memory and host→device traffic are
O(max window + #distinct configs), not O(#consumers).  Subscribing 500
overlays with 12 distinct looks costs 12 analysis states and a single ring.

* **Spectrum** consumers run the full jitted spectrum step + rebin.
* **Meter** consumers reduce the ring tail to RMS/peak levels
  (dsp/meter.py); the reference's timeout ring-memset
  (src/source_generic.cpp:184-199) is emulated with a validity mask —
  the shared ring cannot be zeroed for one consumer, so samples that
  predate the last timeout are masked out of that consumer's window.
* **Waveform** consumers keep a device-resident scroll buffer; the host
  computes the per-tick fresh-pixel count and sample back-offsets
  (int64 timestamp math, src/source_generic.cpp:299-333) and the device
  scrolls, gathers, and dB-converts the fresh tail in one jitted step.

Per-consumer state (EMA trails, scroll position, silence latches) stays
private; the ring and the upload do not.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import (
    CAPTURE_TIMEOUT_NS,
    DB_MIN,
    MAX_TS_DELTA_NS,
    ResolvedConfig,
)
from ..core.ring import audio_frames_to_ns, ns_to_audio_frames
from ..dsp.devring import DeviceRing, init_ring, push
from ..dsp.meter import init_meter_state, make_meter_step
from ..dsp.spectrum import (
    dbfs,
    display_decibels,
    init_state,
    make_spectrum_step,
)
from ..rebin.apply import make_rebin_fn
from .serving import DeviceScalarCache
from .waveform_host import ts_to_frames


class OutputBus:
    """One captured bus fanned out to consumers with heterogeneous configs."""

    def __init__(self, audio, channels: int = 2,
                 hop_budget: int | None = None, fps: float = 60.0):
        self.audio = audio
        self.C = channels
        self.fps = fps
        self.H = hop_budget or (2 * int(audio.samples_per_sec / fps) + 16)
        self._groups: dict[ResolvedConfig, dict] = {}
        self._handles: dict[int, ResolvedConfig] = {}
        self._next = 0
        self._built = False
        # shared host sync bookkeeping (the bus has ONE timestamp stream)
        self._chunks: list[np.ndarray] = []
        self._queued = 0
        self.capture_ts = 0
        self.audio_ts = 0
        self.ring = None
        self.L = 0
        self._push_buf = None
        self._synced = 0        # samples pushed to the device ring so far
        self._was_active = True

    # -- subscription --------------------------------------------------

    def subscribe(self, cfg: ResolvedConfig) -> int:
        """Register a consumer; returns its handle.  Consumers sharing a
        config share one compiled step and one state (identical input ⇒
        identical output).  Spectrum, meter and waveform configs all ride
        the same ring (the reference attaches any source type to the bus,
        src/source.cpp:685-704) — and like the reference, a consumer may
        attach to a LIVE bus at any time (:meth:`_attach_group`)."""
        if cfg.capture_channels > self.C:
            raise ValueError("config wants more channels than the bus has")
        h = self._next
        self._next += 1
        self._handles[h] = cfg
        is_new = cfg not in self._groups
        self._groups.setdefault(cfg, {})
        if self._built and is_new:
            self._attach_group(cfg)
        return h

    def unsubscribe(self, handle: int) -> None:
        """Detach a consumer.  The group's compiled step and state drop
        with its last handle (the ring keeps its size — a later larger
        subscriber grows it; the reference likewise leaves the bus
        connection up while any consumer remains,
        src/source.cpp:676-720)."""
        cfg = self._handles.pop(handle)
        if not any(c == cfg for c in self._handles.values()):
            self._groups.pop(cfg, None)

    def _window_need(self, cfg: ResolvedConfig) -> int:
        if cfg.spectrum_mode or cfg.meter_mode:
            return cfg.fft_size        # meter mode repurposes fft_size as
        return cfg.waveform_samples    # the sample window (config.py)

    def _build_group(self, cfg, g):
        if cfg.spectrum_mode:
            self._build_spectrum_group(cfg, g, self.L)
        elif cfg.meter_mode:
            self._build_meter_group(cfg, g, self.L)
        else:
            self._build_waveform_group(cfg, g, self.L)

    def _attach_group(self, cfg) -> None:
        """Attach a new consumer config to a LIVE bus (the reference lets
        any source connect to the output bus at any time,
        src/source.cpp:685-704).  If the new window outgrows the shared
        ring, the ring grows with its history carried into the tail and
        every existing group's step re-jits against the new length — their
        analysis state (EMA trails, meter levels, scroll buffers, latches)
        carries across untouched."""
        need = self._window_need(cfg) + self.H
        if need > self.L:
            old = self.ring.buf
            grown = jnp.zeros((1, self.C, need), jnp.float32)
            self.ring = DeviceRing(
                buf=grown.at[..., need - self.L:].set(old))
            self.L = need
            for c2, g2 in self._groups.items():
                if g2:            # existing groups re-jit at the new L
                    self._build_group(c2, g2)
        if cfg.normalize_volume:
            R = cfg.input_rms_size
            if not self._need_rms or R > self._rms_R:
                # enable, or grow-and-rewarm: the reference's update()
                # resets its RMS sync buffer too (src/source.cpp:810-835)
                self._need_rms = True
                self._rms_win = np.zeros(R, np.float32)
                self._rms_pos = 0
                self._rms_sum = 0.0
                self._rms_R = R
        self._build_group(cfg, self._groups[cfg])

    def _build(self):
        self.L = max(self._window_need(c) for c in self._groups) + self.H
        self.ring = init_ring(1, self.C, self.L)
        # packed staging row: H samples per channel + three trailing metadata
        # columns (counts, active, input_rms) — ONE host→device transfer per
        # tick (the serving-engine pattern; dt is a cached device scalar)
        self._push_buf = np.zeros((1, self.C, self.H + 3), np.float32)
        self._dt_scalar = DeviceScalarCache(jnp.float32, 64)
        self._count_scalar = DeviceScalarCache(jnp.int32, 4096)
        # shared volume-normalization RMS (1 s window of per-timepoint
        # max-channel squares over the synced pushes, src/source.cpp:810-835)
        self._need_rms = any(c.normalize_volume for c in self._groups)
        if self._need_rms:
            R = max(c.input_rms_size for c in self._groups
                    if c.normalize_volume)
            self._rms_win = np.zeros(R, np.float32)
            self._rms_pos = 0
            self._rms_sum = 0.0
            self._rms_R = R
        for cfg, g in self._groups.items():
            self._build_group(cfg, g)
        H = self.H

        def ingest(ring, flat):
            """Packed push: flat [1, C, H+3] carries samples plus trailing
            (counts, active, input_rms) metadata columns."""
            new = flat[..., :H]
            # one shared bus ring: the count is a scalar by construction,
            # which selects the scalar lane-shift push (dsp/devring.py)
            counts = flat[0, 0, H].astype(jnp.int32)
            active = flat[:, 0, H + 1] > 0.5
            rms = flat[:, 0, H + 2]
            return push(ring, new, counts), active, rms

        # NOT donated: last tick's group steps may still be reading the old
        # ring buffer when the next push dispatches
        self._ingest = jax.jit(ingest)
        self._built = True

    def _build_spectrum_group(self, cfg, g, L):
        step = make_spectrum_step(cfg)
        rebin = make_rebin_fn(cfg, apply_pixel_map=False)
        n = cfg.fft_size
        cb = cfg.channel_base
        cc = max(cfg.capture_channels, 1)

        def group_step(ring, state, dt, active, rms):
            window = jax.lax.slice_in_dim(
                ring.buf, L - n, L, axis=-1)[:, cb:cb + cc]
            state = step(window, state, dt, active, rms)
            return rebin(display_decibels(cfg, state)), state

        g["mode"] = "spectrum"
        g["step"] = jax.jit(group_step, donate_argnums=(1,))
        # re-jits on a live ring grow preserve the carried state
        if "state" not in g:
            g["state"] = init_state(cfg, 1)
            g["pixels"] = None

    def _build_meter_group(self, cfg, g, L):
        mstep = make_meter_step(cfg)
        M = cfg.fft_size    # sample window (sr·meter_ms/1000, config.py)
        cb = cfg.channel_base
        cc = max(cfg.capture_channels, 1)

        def group_step(ring, state, dt, active, valid):
            window = jax.lax.slice_in_dim(
                ring.buf, L - M, L, axis=-1)[:, cb:cb + cc]
            # timeout-memset emulation (src/source_generic.cpp:184-199):
            # the shared ring can't be zeroed for one consumer, so samples
            # older than the consumer's last timeout mask to silence
            mask = jnp.arange(M) >= (M - valid)
            window = window * mask
            return mstep(window, state, dt, active, jnp.ones_like(active))

        g["mode"] = "meter"
        g["step"] = jax.jit(group_step, donate_argnums=(1,))
        if "state" not in g:
            g["state"] = init_meter_state(cfg, 1)
            g["invalid_before"] = None   # synced count at last timeout edge
            g["pixels"] = None

    def _build_waveform_group(self, cfg, g, L):
        W = cfg.fft_size    # display width in pixels (src/source.cpp:1140)
        cb = cfg.channel_base
        C = max(cfg.capture_channels, 1)
        O = max(cfg.output_channels, C)
        D = 2 if cfg.stereo else 1
        normalize = cfg.normalize_volume
        vt, mg = cfg.volume_target, cfg.max_gain

        def group_step(ring, buf, latch, back, n, active, rms):
            """Scroll + gather + fresh-tail dB conversion, all on device
            (the jitted form of src/source_generic.cpp:299-390; the host
            supplies ``back`` [W] sample back-offsets and ``n`` fresh
            pixels from its int64 timestamp math)."""
            src = ring.buf[0, cb:cb + C]                       # [C, L]
            gathered = jnp.take(src, L - 1 - back, axis=-1)    # [C, W]
            px = jnp.arange(W)
            fresh = px >= (W - n)
            # align gathered col j -> pixel W-n+j (wrap lands in ~fresh)
            rolled_g = jnp.roll(gathered, W - n, axis=-1)
            old = buf[0]                                       # [O, W]
            work = jnp.where(fresh, rolled_g,
                             jnp.roll(old[:C], -n, axis=-1))   # [C, W]
            # silence scan over the scrolled buffer — mixed-domain exactly
            # like the reference (old entries are dB values, fresh entries
            # raw samples; src/source_generic.cpp:336-344)
            silent = ~jnp.any(work != 0.0)

            out = old.at[:C].set(work)
            if O > C:   # duplicate mono capture before conversion
                out = out.at[1].set(work[0])
            # fresh-tail dBFS (+ normalization gain) on display channels
            a = jnp.abs(work)
            comp = (jnp.minimum(vt - dbfs(rms[0]), mg) if normalize
                    else jnp.float32(0.0))
            if cfg.stereo:
                # only real capture channels convert (the reference's
                # counts[ch] == 0 for ch >= C leaves a mono-capture
                # stereo display's channel 1 tail RAW,
                # source_generic.cpp:363-371)
                DC = min(2, C)
                conv = dbfs(a[:DC]) + comp
                live = out.at[:DC].set(jnp.where(fresh, conv, out[:DC]))
            elif C > 1:
                conv = dbfs((a[0] + a[1]) * 0.5) + comp
                live = out.at[0].set(jnp.where(fresh, conv, out[0]))
            else:
                conv = dbfs(a[0]) + comp
                live = out.at[0].set(jnp.where(fresh, conv, out[0]))
            # silent ticks blank the display channels every tick
            # (src/source_generic.cpp:345-349 via last_silent)
            silent_out = out.at[:D].set(DB_MIN)
            live_out = jnp.where(silent, silent_out, live)
            # capture timeout: blank once on the edge, then freeze
            timeout_out = jnp.where(latch, old, old.at[:D].set(DB_MIN))
            new_buf = jnp.where(active, live_out, timeout_out)[None]
            new_latch = jnp.where(active, silent, True)
            return new_buf, new_latch

        g["mode"] = "waveform"
        g["step"] = jax.jit(group_step, donate_argnums=(1,))
        g["D"] = D
        if "buf" not in g:
            g["buf"] = jnp.full((1, O, W), DB_MIN, jnp.float32)
            g["latch"] = jnp.asarray(False)
            g["waveform_ts"] = 0
            g["pixels"] = None

    # -- feeding (one mixed stream) -------------------------------------

    def feed(self, data: np.ndarray, timestamp_ns: int,
             now_ns: int | None = None) -> None:
        """Queue one bus packet ([channels, frames] float32 planar)."""
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        frames = 0 if data is None else data.shape[-1]
        if frames == 0:
            return
        self.capture_ts = now_ns
        audio_len = audio_frames_to_ns(self.audio.samples_per_sec, frames)
        self.audio_ts = (now_ns
                         if abs(timestamp_ns - now_ns) > MAX_TS_DELTA_NS
                         else timestamp_ns + audio_len)
        chunk = np.asarray(data[:self.C], np.float32)
        if chunk.shape[0] < self.C:
            chunk = np.vstack([chunk, np.zeros(
                (self.C - chunk.shape[0], frames), np.float32)])
        self._chunks.append(chunk)
        self._queued += frames
        max_q = (self.L or 65536) + self.H
        while self._queued > max_q and self._chunks:
            drop = self._queued - max_q
            head = self._chunks[0]
            if head.shape[-1] <= drop:
                self._queued -= head.shape[-1]
                self._chunks.pop(0)
            else:
                self._chunks[0] = head[:, drop:]
                self._queued -= drop
                break

    def _sync(self, ts: int) -> int:
        delta = min(abs(self.audio_ts - ts), MAX_TS_DELTA_NS)
        return -delta if self.audio_ts < ts else delta

    def _update_rms(self, take: int) -> float:
        """Advance the shared 1 s RMS window with this tick's pushed
        samples (per-timepoint max-channel squares)."""
        if take > 0:
            sq = np.max(np.abs(self._push_buf[0, :, :take]),
                        axis=0).astype(np.float32) ** 2
            R = self._rms_R
            k = sq.shape[0]
            if k >= R:
                # a single push covering the whole window (hop_budget
                # longer than the RMS window, e.g. low fps): the window
                # IS the last R samples — positional updates would hit
                # duplicate slots and desync the running sum
                tail = sq[k - R:]
                self._rms_win[:] = tail
                self._rms_sum = float(tail.sum(dtype=np.float64))
                self._rms_pos = 0
            else:
                pos = (self._rms_pos + np.arange(k)) % R
                self._rms_sum += (float(sq.sum(dtype=np.float64))
                                  - float(self._rms_win[pos]
                                          .sum(dtype=np.float64)))
                self._rms_win[pos] = sq
                self._rms_pos = (self._rms_pos + k) % R
        return float(np.sqrt(max(self._rms_sum, 0.0) / self._rms_R))

    # -- ticking ---------------------------------------------------------

    def tick(self, now_ns: int | None = None, dt: float | None = None):
        """One video frame: push new bus samples once, run every distinct
        config's step off the shared ring."""
        if not self._groups:
            return          # every consumer unsubscribed: nothing to run
        if not self._built:
            self._build()
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        dt = (1.0 / self.fps) if dt is None else dt
        sr = self.audio.samples_per_sec

        dtaudio = self._sync(now_ns)
        reserve = ns_to_audio_frames(sr, dtaudio) if dtaudio > 0 else 0
        take = min(max(self._queued - reserve, 0), self.H)
        self._push_buf[:] = 0.0
        got = 0
        while got < take and self._chunks:
            head = self._chunks[0]
            m = head.shape[-1]
            use = min(m, take - got)
            self._push_buf[0, :, got:got + use] = head[:, :use]
            if use == m:
                self._chunks.pop(0)
            else:
                self._chunks[0] = head[:, use:]
            self._queued -= use
            got += use
        active = (now_ns - self.capture_ts) <= CAPTURE_TIMEOUT_NS
        self._push_buf[0, 0, self.H] = take
        self._push_buf[0, 0, self.H + 1] = active
        if self._need_rms:
            self._push_buf[0, 0, self.H + 2] = self._update_rms(take)
        self._synced += take

        # per-consumer timeout bookkeeping (the fresh→timeout edge)
        if self._was_active and not active:
            for g in self._groups.values():
                if g.get("mode") == "meter":
                    g["invalid_before"] = self._synced
        self._was_active = active

        dtv = self._dt_scalar(dt)
        # fresh copy: the staging buffer is rewritten next tick and argument
        # transfers may be consumed after dispatch returns (a ~13 KB buffer
        # — copying beats fencing here); ONE upload carries samples + meta
        self.ring, active_dev, rms_dev = self._ingest(
            self.ring, self._push_buf.copy())
        for cfg, g in self._groups.items():
            if g["mode"] == "spectrum":
                g["pixels"], g["state"] = g["step"](
                    self.ring, g["state"], dtv, active_dev, rms_dev)
            elif g["mode"] == "meter":
                M = cfg.fft_size
                inv = g["invalid_before"]
                valid = M if inv is None else min(self._synced - inv, M)
                g["state"] = g["step"](self.ring, g["state"], dtv,
                                       active_dev,
                                       self._count_scalar(valid))
                g["pixels"] = g["state"].meter_val
            else:
                back, n = self._waveform_host(cfg, g, reserve)
                g["buf"], g["latch"] = g["step"](
                    self.ring, g["buf"], g["latch"], back,
                    self._count_scalar(n), active_dev[0], rms_dev)
                g["pixels"] = g["buf"][:, :g["D"]]

    def _waveform_host(self, cfg, g, reserve: int):
        """Host half of a waveform tick: fresh pixel count + per-pixel
        sample back-offsets (int64 ns math, src/source_generic.cpp:299-333;
        ns timestamps don't fit TPU's 32-bit ints)."""
        sr = self.audio.samples_per_sec
        W = cfg.fft_size
        step_ns = (cfg.meter_ms * 1_000_000) // W
        hist = min(self.L, self._synced)
        back = np.zeros(W, np.int32)
        stop_ts = self.audio_ts - audio_frames_to_ns(sr, reserve)
        start_ts = self.audio_ts - audio_frames_to_ns(sr, reserve + hist)
        if start_ts >= self.audio_ts or stop_ts > self.audio_ts:
            return back, 0     # timestamp rollover, give up (ref :311-313)
        wts = g["waveform_ts"]
        if wts < start_ts:
            wts = start_ts     # catch up if falling behind
        if wts > stop_ts and (wts - stop_ts) > step_ns:
            wts = start_ts     # fix desync (ref :314-321)
        ts = wts + np.arange(W, dtype=np.int64) * step_ns
        ok = (ts < stop_ts) & (ts >= wts)
        n = int(np.argmin(ok)) if not ok.all() else W
        if n > 0 and hist > 0:
            idx = (ts_to_frames(sr, self.audio_ts - ts[:n])
                   .clip(reserve + 1, reserve + hist))
            back[:n] = (idx - reserve - 1).astype(np.int32)
        else:
            n = 0
        g["waveform_ts"] = wts + n * step_ns
        return back, n

    # -- reads -----------------------------------------------------------

    def _group(self, handle: int) -> dict:
        g = self._groups[self._handles[handle]]
        if not self._built or g.get("pixels") is None:
            raise RuntimeError("tick() the bus before reading a consumer "
                               "(no frame has been produced yet)")
        return g

    def read_pixels(self, handle: int) -> np.ndarray:
        """Display output for any consumer mode: rebinned dB pixels
        [D, P] (spectrum), levels [C] (meter), or the scroll buffer
        [D, W] (waveform)."""
        out = np.asarray(self._group(handle)["pixels"][0])
        return out

    def read_decibels(self, handle: int) -> np.ndarray:
        cfg = self._handles[handle]
        g = self._group(handle)
        if g["mode"] == "spectrum":
            return np.asarray(display_decibels(cfg, g["state"]))[0]
        return np.asarray(g["pixels"])[0]

    def render_frame(self, handle: int) -> np.ndarray:
        """RGBA frame [H, W, 4] for one consumer's current tick.

        The renderer jits once per distinct config and is shared by every
        consumer subscribed with that config — like the bus analysis
        groups themselves.  All three consumer modes render: spectrum
        from device dB state, meters from their level values, waveforms
        from the device scroll buffer (the reference's render() per
        source, src/source.cpp:1346-1358).
        """
        cfg = self._handles[handle]
        g = self._group(handle)
        from ..render.raster import jitted_renderer
        rend = jitted_renderer(cfg)
        hidden = None
        if g["mode"] == "spectrum":
            vals = display_decibels(cfg, g["state"])[0]
            if cfg.settings.hide_on_silent:
                hidden = g["state"].last_silent[0]
        elif g["mode"] == "meter":
            # levels live on device already — no host round trip
            vals = g["pixels"][0][None, :]
            if cfg.settings.hide_on_silent:
                # the reference latches meter silence when every channel
                # sits under floor−10 dB (source_generic.cpp:263-268)
                hidden = jnp.all(vals < jnp.float32(cfg.floor - 10))
        else:
            # reference parity: tick_waveform never updates m_last_silent
            # (source_generic.cpp:271-390), so hide_on_silent cannot
            # blank a waveform consumer
            vals = g["pixels"][0]
        img = rend(vals)
        if hidden is not None:
            # hide_on_silent: the reference's render() early return
            # (src/source.cpp:1349-1350) — blank to transparent on device,
            # matching ServingEngine.render_frames
            img = img * (~hidden).astype(img.dtype)
        return np.asarray(img)

    @property
    def num_groups(self) -> int:
        return len(self._groups)
