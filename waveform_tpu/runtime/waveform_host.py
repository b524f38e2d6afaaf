"""Waveform (time-domain oscilloscope) mode.

Re-implements the reference's timestamp-driven resampler
(/root/reference/src/source_generic.cpp:271-390): each tick consumes the
ring up to the A/V-sync reserve, maps output pixels to sample timestamps at
``step_ns = meter_ms·1e6/width`` spacing, scrolls the display buffer left,
and dB-converts only the freshly appended region — the display accumulates
already-converted pixels as it scrolls.

This stage is inherently host-sequential (data-dependent consume/rotate), so
it runs in NumPy per stream; the per-pixel resample itself is vectorized.
"""

from __future__ import annotations

import numpy as np

from ..core.config import CAPTURE_TIMEOUT_NS, DB_MIN, ResolvedConfig
from ..core.ring import audio_frames_to_ns, ns_to_audio_frames
from .source import StreamSource


def _dbfs(x: np.ndarray) -> np.ndarray:
    out = np.full_like(x, DB_MIN, dtype=np.float32)
    pos = x > 0.0
    out[pos] = 20.0 * np.log10(x[pos])
    return out


class WaveformScroller:
    def __init__(self, cfg: ResolvedConfig):
        self.cfg = cfg
        O = max(cfg.output_channels, max(cfg.capture_channels, 1))
        self.buf = np.full((O, cfg.fft_size), DB_MIN, np.float32)
        self.last_silent = False

    @property
    def display(self) -> np.ndarray:
        return self.buf[:self.cfg.display_channels]

    def tick(self, src: StreamSource, now_ns: int, dt: float) -> np.ndarray:
        cfg = self.cfg
        src.tick_ts = now_ns
        src.update_input_rms()
        if not (src.check_audio_capture(dt) and cfg.capture_channels > 0):
            return self.display

        outsz = cfg.fft_size  # = width (src/source.cpp:1140)
        C = cfg.capture_channels
        sr = cfg.audio.samples_per_sec

        if (not src.show) or (now_ns - src.capture_ts) > CAPTURE_TIMEOUT_NS:
            if not self.last_silent:
                self.buf[:max(2 if cfg.stereo else 1, 1)] = DB_MIN
                self.last_silent = True
            return self.display

        dtaudio = src.get_audio_sync(now_ns)
        reserve = ns_to_audio_frames(sr, dtaudio) if dtaudio > 0 else 0
        max_size = cfg.waveform_samples + reserve
        for c in range(C):
            if src.rings[c].size <= reserve:
                return self.display  # not enough look-ahead yet

        step_ns = (cfg.meter_ms * 1_000_000) // outsz
        counts = np.zeros(2, np.int64)
        silent_channels = 0
        for c in range(C):
            ring = src.rings[c]
            if ring.size > max_size:
                ring.pop_front(ring.size - max_size)
            total = ring.size
            consume = total - reserve
            if total <= reserve:
                return self.display

            start_ts = src.audio_ts - audio_frames_to_ns(sr, total)
            stop_ts = src.audio_ts - audio_frames_to_ns(sr, reserve)
            if start_ts >= src.audio_ts or stop_ts > src.audio_ts:
                return self.display  # timestamp rollover, give up
            if src.waveform_ts < start_ts:
                src.waveform_ts = start_ts  # catch up if falling behind
            if (src.waveform_ts > stop_ts
                    and (src.waveform_ts - stop_ts) > step_ns):
                src.waveform_ts = start_ts  # fix desync

            temp = np.empty(total, np.float32)
            ring.peek_front(total, out=temp)
            ring.pop_front(consume)

            # vectorized pixel→sample resample (src loop :323-333)
            ts = src.waveform_ts + np.arange(outsz, dtype=np.int64) * step_ns
            ok = (ts < stop_ts) & (ts >= src.waveform_ts)
            n = int(np.argmin(ok)) if not ok.all() else outsz
            ts = ts[:n]
            idx = (ts_to_frames(sr, src.audio_ts - ts)
                   .clip(reserve + 1, total))
            new = temp[total - idx]
            counts[c] = n
            if n > 0:
                self.buf[c] = np.roll(self.buf[c], -n)
                self.buf[c, outsz - n:] = new

            if np.any(self.buf[c] != 0.0):
                self.last_silent = False
            else:
                silent_channels += 1

        src.waveform_ts += int(counts[0]) * step_ns
        if silent_channels >= C:
            self.last_silent = True

        if self.last_silent:
            self.buf[:2 if cfg.stereo else 1] = DB_MIN
            return self.display

        if cfg.output_channels > C:
            self.buf[1] = self.buf[0]

        # dB-convert only the fresh tail (src/source_generic.cpp:366-381)
        if cfg.stereo:
            for c in range(2):
                k = outsz - int(counts[c])
                self.buf[c, k:] = _dbfs(np.abs(self.buf[c, k:]))
        elif C > 1:
            k = outsz - int(counts[0])
            self.buf[0, k:] = _dbfs(
                (np.abs(self.buf[0, k:]) + np.abs(self.buf[1, k:])) * 0.5)
        else:
            k = outsz - int(counts[0])
            self.buf[0, k:] = _dbfs(np.abs(self.buf[0, k:]))

        if cfg.normalize_volume:
            comp = min(cfg.volume_target - float(_dbfs(
                np.array([src.input_rms], np.float32))[0]), cfg.max_gain)
            for c in range(2 if cfg.stereo else 1):
                k = outsz - int(counts[c if cfg.stereo else 0])
                self.buf[c, k:] += comp
        return self.display


def ts_to_frames(sr: int, ns: np.ndarray) -> np.ndarray:
    """Vectorized ns→frames (floor), matching ns_to_audio_frames."""
    return (ns.astype(np.int64) * sr) // 1_000_000_000
