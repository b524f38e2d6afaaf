"""Multi-config serving: heterogeneous stream groups on one chip.

In OBS every waveform source carries its own settings — one scene mixes a
4096-pt gradient curve, a stepped stereo bar graph, and a level meter.  The
batched engines assume one :class:`ResolvedConfig` per batch (that's what
makes the single fused program possible), so heterogeneous deployments
group streams by config: one engine per distinct config, each with its own
compiled program, all sharing the chip.

:class:`MultiEngine` is that grouping: add streams with any config, feed
and tick them through one object.  Spectrum configs ride
:class:`ServingEngine`, meter configs :class:`MeterServingEngine`,
waveform configs :class:`DeviceWaveformEngine` — all device-resident,
packed-upload, and cohort-fusable (groups sharing a packed row width
split one uploaded block).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ResolvedConfig
from .engine import WaveformEngine
from .meter_serving import MeterServingEngine
from .serving import ServingEngine, chunked_put


class MultiEngine:
    """Streams with heterogeneous configs, grouped into batched engines.

    Spectrum groups whose packed upload rows share a width (same capture
    channel count and hop budget — the common case: one scene, one sample
    rate) are fused into an upload **cohort**: their per-tick host inputs
    assemble into one shared block, cross the link as ONE transfer, and
    each group's compiled program slices its rows on device at a static
    offset.  N heterogeneous looks then cost one upload + N collapsed
    dispatches instead of N uploads — the transfer analog of the OBS scene
    compositing all sources in one graphics pass
    (/root/reference/src/source.cpp:87-102, one instance per source)."""

    def __init__(self):
        self._groups: dict[ResolvedConfig, list] = {}   # cfg -> stream ids
        self._engines: dict[ResolvedConfig, object] = {}
        self._streams: dict[int, tuple[ResolvedConfig, int]] = {}
        self._next_id = 0
        self._cohorts: list[dict] = []
        self._solo: list = []    # engines ticking the classic way

    def _make_engine(self, cfg: ResolvedConfig, n: int):
        if cfg.spectrum_mode:
            return ServingEngine(cfg, n)
        if cfg.meter_mode:
            return MeterServingEngine(cfg, n)
        # waveform: device-resident scroll engine (one dispatch for the
        # group; WaveformEngine remains the host-ring fallback for direct
        # construction)
        from .waveform_device import DeviceWaveformEngine
        return DeviceWaveformEngine(cfg, n)

    def _attach_stream(self, sid: int, cfg: ResolvedConfig) -> None:
        members = self._groups.setdefault(cfg, [])
        self._streams[sid] = (cfg, len(members))
        members.append(sid)
        if self._engines:        # live scene: resize this group's engine
            eng = self._engines.get(cfg)
            self._engines[cfg] = (self._make_engine(cfg, 1) if eng is None
                                  else eng.resized(len(members)))

    def _detach_stream(self, stream_id: int) -> None:
        cfg, idx = self._streams.pop(stream_id)
        members = self._groups[cfg]
        members.pop(idx)
        for later in members[idx:]:
            c2, i2 = self._streams[later]
            self._streams[later] = (c2, i2 - 1)
        if not members:
            del self._groups[cfg]
            self._engines.pop(cfg, None)
            return
        if self._engines:
            keep = [i for i in range(len(members) + 1) if i != idx]
            self._engines[cfg] = self._engines[cfg].resized(
                len(members), keep=keep)

    def add_stream(self, cfg: ResolvedConfig) -> int:
        """Register a stream; returns its handle.  Works at any time — on a
        live scene the group's engine resizes in place (state-migrating
        rebuild, :meth:`ServingEngine.resized`), exactly the operation OBS
        performs when a user drops a new waveform source into a running
        scene (each add constructs and update()s a fresh WAVSource,
        /root/reference/src/source.cpp:87-102, 1077-1322; other sources are
        untouched — here other *groups* are untouched)."""
        sid = self._next_id
        self._next_id += 1
        self._attach_stream(sid, cfg)
        if self._engines:
            self._rebuild_cohorts()
        return sid

    def update_stream(self, stream_id: int, cfg: ResolvedConfig) -> None:
        """Re-configure one LIVE stream — the OBS ``update()`` analog.

        The reference tears down and rebuilds the source's entire state on
        ANY settings change (free_bufs + re-alloc + recapture,
        /root/reference/src/source.cpp:1077-1322), so moving the stream to
        its new config's group with fresh analysis state is exactly the
        reference's semantics.  The handle stays valid; other streams in
        both the old and new groups carry their state across the resizes.
        """
        old_cfg, _ = self._streams[stream_id]
        if old_cfg == cfg:
            return
        self._detach_stream(stream_id)
        self._attach_stream(stream_id, cfg)   # same handle, new group
        if self._engines:
            self._rebuild_cohorts()           # ONE rebuild for the edit

    def remove_stream(self, stream_id: int) -> None:
        """Drop a stream from a live scene; its group's engine shrinks with
        every other row's state carried over (the OBS remove-source
        analog: the removed WAVSource is destroyed, the rest never
        notice)."""
        self._detach_stream(stream_id)
        if self._engines:
            self._rebuild_cohorts()

    def _build(self):
        for cfg, members in self._groups.items():
            self._engines[cfg] = self._make_engine(cfg, len(members))
        self._rebuild_cohorts()

    def _rebuild_cohorts(self):
        # upload cohorts: groups sharing a packed row width.  All three
        # engine families speak the packed-row contract (packed_width /
        # _bind_external / _assemble / bind_cohort / tick_from_cohort) —
        # spectrum and meter rows are (C*H samples, [rms], 3 meta) and
        # waveform rows add the W gather indices + 5 meta, so waveform
        # groups typically cohort with each other while spectrum+meter
        # groups can share one block
        by_width: dict[int, list] = {}
        self._solo = []
        for eng in self._engines.values():
            if hasattr(eng, "bind_cohort"):
                by_width.setdefault(eng.packed_width, []).append(eng)
            else:
                self._solo.append(eng)
        self._cohorts = []
        fence_on = jax.default_backend() == "cpu"
        for width, engs in sorted(by_width.items()):
            if len(engs) < 2:     # a lone group gains nothing from fusion
                # an engine leaving a cohort self-heals: _bind_buf
                # reallocates its private double buffers on the next tick
                self._solo.extend(engs)
                continue
            offs, r0 = [], 0
            for e in engs:
                # rebind only engines whose placement actually changed:
                # bind_cohort re-jits the cohort tick (a fresh compile —
                # 100-250 s over a relay link), so a scene edit must not
                # recompile the untouched groups
                if (getattr(e, "_row0", None) != r0
                        or getattr(e, "_tick_cohort", None) is None):
                    e.bind_cohort(r0)
                offs.append(r0)
                r0 += e.S
            self._cohorts.append({
                "engines": engs, "offs": offs,
                # double-buffered like ServingEngine._bufs, with the same
                # deferred-host-read fence discipline (armed on XLA:CPU)
                "bufs": [np.zeros((r0, width), np.float32)
                         for _ in range(2)],
                "fences": [None, None], "flip": 0, "fence_on": fence_on,
            })

    def feed(self, stream_id: int, data, timestamp_ns: int,
             now_ns: int | None = None, muted: bool = False) -> None:
        if not self._engines:
            self._build()
        cfg, idx = self._streams[stream_id]
        self._engines[cfg].feed(idx, data, timestamp_ns, now_ns=now_ns,
                                muted=muted)

    def tick(self, now_ns: int | None = None) -> None:
        """One video frame: every group's batched step dispatches; the
        per-group device programs overlap (async dispatch).  Cohorts
        assemble every member's packed rows into one block and upload it
        once; members dispatch from device-resident row slices."""
        if not self._engines:
            self._build()
        now_ns = time.monotonic_ns() if now_ns is None else now_ns
        for c in self._cohorts:
            c["flip"] ^= 1
            flip = c["flip"]
            fence = c["fences"][flip]
            if fence is not None:
                jax.block_until_ready(fence)
                c["fences"][flip] = None
            buf = c["bufs"][flip]
            for eng, r0 in zip(c["engines"], c["offs"]):
                eng._bind_external(buf[r0:r0 + eng.S])
                eng._assemble(now_ns)
            # the one upload — chunked: a large cohort (32 groups × 16
            # streams ≈ 13 MB) would otherwise cross the >10 MB single-
            # transfer cliff the engine already measured (serving.py:38-42)
            cohort_dev = chunked_put(buf)
            outs = [eng.tick_from_cohort(cohort_dev, now_ns)
                    for eng in c["engines"]]
            if c["fence_on"]:
                c["fences"][flip] = outs
        for eng in self._solo:
            eng.tick(now_ns=now_ns)

    def set_show(self, stream_id: int, show: bool) -> None:
        """Show/hide one stream of the scene (the reference's show()/hide()
        source callbacks; hidden graphs decay like a capture timeout)."""
        if not self._engines:
            self._build()
        cfg, idx = self._streams[stream_id]
        self._engines[cfg].set_show(idx, show)

    def read_decibels(self, stream_id: int) -> np.ndarray:
        if not self._engines:
            self._build()   # read-before-tick: the initial (floor) state
        cfg, idx = self._streams[stream_id]
        eng = self._engines[cfg]
        if isinstance(eng, ServingEngine):
            return eng.read_decibels()[idx]
        return eng.render_values()[idx]

    def render_frames(self) -> dict[int, np.ndarray]:
        """RGBA frames for EVERY stream in the scene: one jitted vmapped
        render dispatch per distinct config (frame shapes differ across
        groups, so the result maps stream handle -> [H, W, 4] f32).

        The whole-scene analog of OBS compositing all sources per video
        frame (one render() callback per source,
        /root/reference/src/source.cpp:1346-1358): spectrum groups render
        from device state (ServingEngine.render_frames), meter/waveform
        groups from their host display values; hide_on_silent blanks
        latched streams in both.
        """
        if not self._engines:
            self._build()
        from ..render.raster import jitted_renderer
        # dispatch every group's render first, read back after — device
        # work for group B overlaps group A's D2H instead of serializing
        # behind it (the async-dispatch discipline tick() follows)
        pending: list[tuple[list[int], jnp.ndarray]] = []
        for cfg, eng in self._engines.items():
            ids = self._groups[cfg]
            if isinstance(eng, ServingEngine):
                imgs = eng.render_frames()
            else:
                imgs = jitted_renderer(cfg, batched=True)(
                    eng.render_values())
                if cfg.settings.hide_on_silent:
                    imgs = imgs * jnp.asarray(
                        ~eng.last_silent, imgs.dtype)[:, None, None, None]
            pending.append((ids, imgs))
        out: dict[int, np.ndarray] = {}
        for ids, dimgs in pending:
            imgs = np.asarray(dimgs)
            for i, sid in enumerate(ids):
                out[sid] = imgs[i]
        return out

    def config_of(self, stream_id: int) -> ResolvedConfig:
        return self._streams[stream_id][0]

    @property
    def num_groups(self) -> int:
        return len(self._groups)
