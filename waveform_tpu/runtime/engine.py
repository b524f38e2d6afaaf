"""Batched multi-stream engine: S host stream-sources feeding one device step.

Where the reference runs one ``WAVSource::tick`` per OBS source per video
frame (/root/reference/src/source.cpp:1324-1344), this engine assembles all
streams' frames into one ``[S, C, N]`` batch and executes a single jitted
device step (spectrum or meter) plus the rebin stage — the scale axis of the
TPU design (SURVEY.md §2c: batch over streams replaces thread fan-out).

The host/device split is a producer/consumer pipeline: audio callbacks push
into per-stream rings (any thread), ``tick()`` drains/peeks them into a
pinned batch buffer and launches the device step.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ResolvedConfig
from ..core.enums import DisplayMode
from ..dsp.meter import MeterState, init_meter_state, make_meter_step
from ..dsp.spectrum import (
    SpectrumState,
    display_decibels,
    init_state,
    make_spectrum_step,
)
from ..rebin.apply import make_rebin_fn
from .source import StreamSource
from .waveform_host import WaveformScroller


class WaveformEngine:
    """S concurrent streams under one resolved config."""

    def __init__(self, cfg: ResolvedConfig, num_streams: int,
                 rfft_fn=None, jit: bool = True):
        self.cfg = cfg
        self.S = num_streams
        # kept for resized(): rebuild with identical construction choices
        self._rfft_fn = rfft_fn
        self._jit = jit
        C = max(cfg.capture_channels, 1)
        self.C = C
        self.sources = [StreamSource(cfg) for _ in range(num_streams)]
        self._batch = np.zeros((num_streams, C, cfg.fft_size), np.float32)

        if cfg.meter_mode:
            self._meter_windows = np.zeros((num_streams, C, cfg.fft_size),
                                           np.float32)
            self.meter_state: MeterState = init_meter_state(cfg, num_streams)
            self._was_fresh = np.zeros(num_streams, bool)
            step = make_meter_step(cfg)
            self._meter_step = jax.jit(step) if jit else step
        elif cfg.display_mode == DisplayMode.WAVEFORM:
            self._scrollers = [WaveformScroller(cfg) for _ in range(num_streams)]
        else:
            self.state: SpectrumState = init_state(cfg, num_streams)
            kwargs = {} if rfft_fn is None else {"rfft_fn": rfft_fn}
            step = make_spectrum_step(cfg, **kwargs)
            self._step = jax.jit(step) if jit else step

        if not cfg.meter_mode:
            self._rebin = make_rebin_fn(cfg, apply_pixel_map=False)
            if jit:
                self._rebin = jax.jit(self._rebin)

        self._last_tick_ns: int | None = None

    # ------------------------------------------------------------------

    def feed(self, stream: int, data: np.ndarray | None, timestamp_ns: int,
             now_ns: int | None = None, muted: bool = False) -> bool:
        """Audio-callback entry for one stream ([channels, frames] planar)."""
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        return self.sources[stream].capture_audio(data, timestamp_ns, now_ns,
                                                  muted)

    def set_show(self, stream: int, show: bool) -> None:
        """The reference's show()/hide() callbacks (source.hpp:314-346):
        a hidden source's graph decays like a capture timeout."""
        self.sources[stream].show = bool(show)

    # ------------------------------------------------------------------

    def tick(self, now_ns: int | None = None) -> np.ndarray:
        """One video frame for all streams.

        Returns the display values: dBFS ``[S, D, nbins]`` for spectrum mode
        before rebin; use :meth:`render_values` for the rebinned axis.
        """
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        if self._last_tick_ns is None:
            dt = 1.0 / self.cfg.fps
        else:
            dt = max((now_ns - self._last_tick_ns) / 1e9, 1e-9)
        self._last_tick_ns = now_ns

        if self.cfg.meter_mode:
            return self._tick_meter(now_ns, dt)
        if self.cfg.display_mode == DisplayMode.WAVEFORM:
            return self._tick_waveform(now_ns, dt)
        return self._tick_spectrum(now_ns, dt)

    def _tick_spectrum(self, now_ns: int, dt: float) -> np.ndarray:
        S, C = self.S, self.C
        valid = np.zeros((S, C), bool)
        active = np.zeros(S, bool)
        run = np.zeros(S, bool)
        rms = np.zeros(S, np.float32)
        for i, src in enumerate(self.sources):
            t = src.prepare_spectrum_tick(now_ns, dt)
            self._batch[i] = t.frame
            valid[i] = t.valid
            active[i] = t.active
            run[i] = t.run
            rms[i] = t.input_rms
        self.state = self._step(jnp.asarray(self._batch), self.state,
                                jnp.float32(dt), jnp.asarray(active),
                                jnp.asarray(rms), jnp.asarray(valid),
                                jnp.asarray(run))
        # device array: callers convert when they actually read (keeping
        # the per-tick path free of device→host syncs)
        return display_decibels(self.cfg, self.state)

    def _tick_meter(self, now_ns: int, dt: float):
        S = self.S
        fresh = np.zeros(S, bool)
        show = np.zeros(S, bool)
        run = np.zeros(S, bool)
        for i, src in enumerate(self.sources):
            r, f = src.drain_meter_samples(now_ns, dt, self._meter_windows[i])
            run[i], fresh[i], show[i] = r, f, src.show
            # timeout memset (src/source_generic.cpp:184-199): host zeroes
            # the ring on the fresh→timeout edge.  The reference keys the
            # skip on the silence LATCH, not the edge; the two differ only
            # for a latched stream whose window still held sub-floor
            # NONZERO samples (latching needs sub-floor output, not zero
            # input) — there the reference preserves those samples and this
            # zeroes them, so a resume with a partial ring refill reads a
            # slightly different RMS.  Accepted divergence: the delta is
            # bounded by the floor−10 dB gate that latched the stream, and
            # tracking the edge host-side is what removes the per-tick
            # device latch readback (31 ms/tick over a relay link).
            if r and not f and self._was_fresh[i]:
                self._meter_windows[i] = 0.0
            if r:
                self._was_fresh[i] = f
        # run-freeze folds into the jitted step; the tick stays one
        # dispatch with no device→host sync
        self.meter_state = self._meter_step(
            jnp.asarray(self._meter_windows), self.meter_state,
            jnp.float32(dt), jnp.asarray(fresh), jnp.asarray(show),
            jnp.asarray(run))
        return self.meter_state.meter_val[:, None, :]

    def _tick_waveform(self, now_ns: int, dt: float) -> np.ndarray:
        outs = []
        for i, src in enumerate(self.sources):
            outs.append(self._scrollers[i].tick(src, now_ns, dt))
        return np.stack(outs)

    # ------------------------------------------------------------------

    def render_values(self) -> np.ndarray:
        """Rebinned dBFS on the output axis: [S, D, width|num_bars]."""
        if self.cfg.meter_mode:
            return np.asarray(self.meter_state.meter_val)[:, None, :]
        if self.cfg.display_mode == DisplayMode.WAVEFORM:
            return self._tick_waveform_values()
        db = display_decibels(self.cfg, self.state)
        return np.asarray(self._rebin(db))

    def _tick_waveform_values(self) -> np.ndarray:
        vals = np.stack([s.display for s in self._scrollers])
        return vals

    @property
    def last_silent(self) -> np.ndarray:
        if self.cfg.meter_mode:
            return np.asarray(self.meter_state.last_silent)
        if self.cfg.display_mode == DisplayMode.WAVEFORM:
            return np.array([s.last_silent for s in self._scrollers])
        return np.asarray(self.state.last_silent)

    def resized(self, num_streams: int,
                keep: list[int] | None = None) -> "WaveformEngine":
        """A new engine with ``num_streams`` rows; row ``i`` adopts old row
        ``keep[i]``'s host source (its ring, sync and retry state move as
        objects — capture continues uninterrupted) plus its analysis state
        (EMA/meter/scroll buffers); extra rows start fresh.  The live-scene
        resize — see :meth:`ServingEngine.resized` for the reference
        comparison (update() rebuilds everything, src/source.cpp:1077-1322).
        """
        if keep is None:
            keep = list(range(min(self.S, num_streams)))
        if len(keep) > num_streams:
            raise ValueError(f"keep ({len(keep)} rows) exceeds "
                             f"num_streams={num_streams}")
        if any(not 0 <= j < self.S for j in keep):
            raise ValueError(f"keep indices out of range for S={self.S}: "
                             f"{keep}")
        eng = WaveformEngine(self.cfg, num_streams, rfft_fn=self._rfft_fn,
                             jit=self._jit)
        eng._last_tick_ns = self._last_tick_ns
        k = len(keep)
        if not k:
            return eng
        for i, j in enumerate(keep):
            eng.sources[i] = self.sources[j]
        nk = np.asarray(keep, np.int64)

        def mig(new, old):
            return new.at[:k].set(old[jnp.asarray(nk.astype(np.int32))])

        if self.cfg.meter_mode:
            eng.meter_state = jax.tree.map(mig, eng.meter_state,
                                           self.meter_state)
            eng._was_fresh[:k] = self._was_fresh[nk]
            eng._meter_windows[:k] = self._meter_windows[nk]
        elif self.cfg.display_mode == DisplayMode.WAVEFORM:
            for i, j in enumerate(keep):
                eng._scrollers[i] = self._scrollers[j]
        else:
            eng.state = jax.tree.map(mig, eng.state, self.state)
        return eng
