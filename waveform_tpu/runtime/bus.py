"""Output-bus fan-out: one mixed audio stream, many heterogeneous consumers.

The reference's ``output_bus`` capture mode taps OBS's mixed output and
feeds it to every waveform source configured against the bus — each source
keeps its own ring, window, FFT and smoothing state even though they all
see identical audio (/root/reference/src/source.cpp:676-720: one
``audio_output_connect`` callback per source instance).

TPU-native redesign: consumers of one bus share ONE device ring sized to
the largest requested window; each *distinct config* compiles one step that
slices its own window length off the shared ring's tail, so memory and
host→device traffic are O(max window + #distinct configs), not
O(#consumers).  Subscribing 500 overlays with 12 distinct looks costs 12
spectrum states and a single ring.

Spectrum configs only (meter/waveform consumers keep their own engines —
their state is per-consumer by definition: scroll position, peak hold).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CAPTURE_TIMEOUT_NS, MAX_TS_DELTA_NS, ResolvedConfig
from ..core.ring import audio_frames_to_ns, ns_to_audio_frames
from ..dsp.devring import init_ring, push
from ..dsp.spectrum import (
    display_decibels,
    init_state,
    make_spectrum_step,
)
from ..rebin.apply import make_rebin_fn


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

    # -- subscription --------------------------------------------------

    def subscribe(self, cfg: ResolvedConfig) -> int:
        """Register a consumer; returns its handle.  Consumers sharing a
        config share one compiled step and one state (identical input ⇒
        identical output)."""
        if self._built:
            raise RuntimeError("subscribe after tick(): the shared ring is "
                               "sized at first tick; create a new OutputBus")
        if not cfg.spectrum_mode:
            raise ValueError("OutputBus serves spectrum configs; meter/"
                             "waveform consumers keep per-consumer engines")
        if cfg.capture_channels > self.C:
            raise ValueError("config wants more channels than the bus has")
        h = self._next
        self._next += 1
        self._handles[h] = cfg
        self._groups.setdefault(cfg, {})
        return h

    def _build(self):
        self.L = max(c.fft_size for c in self._groups) + self.H
        self.ring = init_ring(1, self.C, self.L)
        # packed staging row: H samples per channel + two trailing metadata
        # columns (counts, active) — ONE host→device transfer per tick (the
        # serving-engine pattern; dt and the unused input_rms are cached
        # device scalars that upload nothing in steady state)
        self._push_buf = np.zeros((1, self.C, self.H + 2), np.float32)
        self._rms0 = jnp.zeros(1, jnp.float32)
        self._dt_cache: dict[float, jnp.ndarray] = {}
        L = self.L
        for cfg, g in self._groups.items():
            step = make_spectrum_step(cfg)
            rebin = make_rebin_fn(cfg, apply_pixel_map=False)
            n = cfg.fft_size
            cb = cfg.channel_base
            cc = max(cfg.capture_channels, 1)

            def group_step(ring, state, dt, active, rms,
                           _step=step, _rebin=rebin, _n=n, _cb=cb, _cc=cc,
                           _cfg=cfg):
                window = jax.lax.slice_in_dim(
                    ring.buf, L - _n, L, axis=-1)[:, _cb:_cb + _cc]
                state = _step(window, state, dt, active, rms)
                return _rebin(display_decibels(_cfg, state)), state

            g["step"] = jax.jit(group_step, donate_argnums=(1,))
            g["state"] = init_state(cfg, 1)
            g["pixels"] = None
        H = self.H

        def ingest(ring, flat):
            """Packed push: flat [1, C, H+2] carries samples plus trailing
            (counts, active) metadata columns."""
            new = flat[..., :H]
            # one shared bus ring: the count is a scalar by construction,
            # which selects the scalar lane-shift push (dsp/devring.py)
            counts = flat[0, 0, H].astype(jnp.int32)
            active = flat[:, 0, H + 1] > 0.5
            return push(ring, new, counts), active

        # NOT donated: last tick's group steps may still be reading the old
        # ring buffer when the next push dispatches
        self._ingest = jax.jit(ingest)
        self._built = True

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

    # -- ticking ---------------------------------------------------------

    def tick(self, now_ns: int | None = None, dt: float | None = None):
        """One video frame: push new bus samples once, run every distinct
        config's step off the shared ring."""
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
        self._push_buf[0, 0, self.H] = take
        self._push_buf[0, 0, self.H + 1] = (
            (now_ns - self.capture_ts) <= CAPTURE_TIMEOUT_NS)

        dtv = self._dt_cache.get(dt)
        if dtv is None:
            if len(self._dt_cache) > 64:
                self._dt_cache.clear()
            dtv = self._dt_cache[dt] = jnp.float32(dt)
        # fresh copy: the staging buffer is rewritten next tick and argument
        # transfers may be consumed after dispatch returns (a ~13 KB buffer
        # — copying beats fencing here); ONE upload carries samples + meta
        self.ring, active = self._ingest(self.ring, self._push_buf.copy())
        for g in self._groups.values():
            g["pixels"], g["state"] = g["step"](self.ring, g["state"], dtv,
                                                active, self._rms0)

    # -- reads -----------------------------------------------------------

    def _group(self, handle: int) -> dict:
        g = self._groups[self._handles[handle]]
        if not self._built or g.get("pixels") is None:
            raise RuntimeError("tick() the bus before reading a consumer "
                               "(no frame has been produced yet)")
        return g

    def read_pixels(self, handle: int) -> np.ndarray:
        return np.asarray(self._group(handle)["pixels"][0])

    def read_decibels(self, handle: int) -> np.ndarray:
        cfg = self._handles[handle]
        g = self._group(handle)
        return np.asarray(display_decibels(cfg, g["state"]))[0]

    @property
    def num_groups(self) -> int:
        return len(self._groups)
