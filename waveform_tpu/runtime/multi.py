"""Multi-config serving: heterogeneous stream groups on one chip.

In OBS every waveform source carries its own settings — one scene mixes a
4096-pt gradient curve, a stepped stereo bar graph, and a level meter.  The
batched engines assume one :class:`ResolvedConfig` per batch (that's what
makes the single fused program possible), so heterogeneous deployments
group streams by config: one engine per distinct config, each with its own
compiled program, all sharing the chip.

:class:`MultiEngine` is that grouping: add streams with any config, feed
and tick them through one object.  Spectrum configs ride
:class:`ServingEngine`; meter/waveform configs ride :class:`WaveformEngine`.
"""

from __future__ import annotations

import time

import numpy as np

from ..core.config import ResolvedConfig
from .engine import WaveformEngine
from .serving import ServingEngine


class MultiEngine:
    """Streams with heterogeneous configs, grouped into batched engines."""

    def __init__(self):
        self._groups: dict[ResolvedConfig, list] = {}   # cfg -> stream ids
        self._engines: dict[ResolvedConfig, object] = {}
        self._streams: dict[int, tuple[ResolvedConfig, int]] = {}
        self._next_id = 0

    def add_stream(self, cfg: ResolvedConfig) -> int:
        """Register a stream; returns its handle.  Streams must be added
        before the first tick (engines compile per group size)."""
        if self._engines:
            raise RuntimeError("add_stream after tick(): engines are sized "
                               "at first tick; create a new MultiEngine")
        sid = self._next_id
        self._next_id += 1
        members = self._groups.setdefault(cfg, [])
        self._streams[sid] = (cfg, len(members))
        members.append(sid)
        return sid

    def _build(self):
        for cfg, members in self._groups.items():
            if cfg.spectrum_mode:
                self._engines[cfg] = ServingEngine(cfg, len(members))
            else:
                self._engines[cfg] = WaveformEngine(cfg, len(members))

    def feed(self, stream_id: int, data, timestamp_ns: int,
             now_ns: int | None = None, muted: bool = False) -> None:
        if not self._engines:
            self._build()
        cfg, idx = self._streams[stream_id]
        self._engines[cfg].feed(idx, data, timestamp_ns, now_ns=now_ns,
                                muted=muted)

    def tick(self, now_ns: int | None = None) -> None:
        """One video frame: every group's batched step dispatches; the
        per-group device programs overlap (async dispatch)."""
        if not self._engines:
            self._build()
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        for eng in self._engines.values():
            eng.tick(now_ns=now_ns)

    def read_decibels(self, stream_id: int) -> np.ndarray:
        cfg, idx = self._streams[stream_id]
        eng = self._engines[cfg]
        if isinstance(eng, ServingEngine):
            return eng.read_decibels()[idx]
        return eng.render_values()[idx]

    def config_of(self, stream_id: int) -> ResolvedConfig:
        return self._streams[stream_id][0]

    @property
    def num_groups(self) -> int:
        return len(self._groups)
