"""Device-resident batched waveform engine: equivalence vs the host scroller.

The per-stream host ``WaveformScroller`` is the behavioral spec (itself
golden-tested against /root/reference/src/source_generic.cpp:271-390); the
``DeviceWaveformEngine`` must reproduce it for independently-synced streams,
including volume normalization — the two VERDICT round-1 gaps (the batched
path only covered shared-sync fans and raised on normalize_volume).
"""

import numpy as np

from waveform_tpu import (
    AudioInfo,
    DB_MIN,
    DisplayMode,
    Settings,
    TSmoothingMode,
    resolve,
)
from waveform_tpu.runtime.source import StreamSource
from waveform_tpu.runtime.waveform_device import DeviceWaveformEngine
from waveform_tpu.runtime.waveform_host import (
    BatchedWaveformScroller,
    WaveformScroller,
)

NS = 1_000_000_000
SR = 48000


def cfg_for(**kw):
    return resolve(Settings(display_mode=DisplayMode.WAVEFORM,
                            temporal_smoothing=TSmoothingMode.NONE, **kw),
                   AudioInfo(SR, 2))


def _drive_pair(cfg, S, feeds, ticks, dev=None):
    """Feed the same per-stream packet schedule into the device engine and
    S host scrollers; return (device_display, host_display) at the end.

    ``feeds[k]`` is a list of (stream, data, timestamp_ns) for tick k.
    """
    dev = DeviceWaveformEngine(cfg, S) if dev is None else dev
    singles = [WaveformScroller(cfg) for _ in range(S)]
    srcs = [StreamSource(cfg) for _ in range(S)]
    now = NS
    host_out = [None] * S
    for k in range(ticks):
        for (s, data, ts) in feeds(k, now):
            dev.feed(s, data, ts, now_ns=now)
            srcs[s].capture_audio(data, ts, now_ns=now)
        now += 480 * NS // SR
        dev.tick(now_ns=now)
        for s in range(S):
            host_out[s] = singles[s].tick(srcs[s], now, 1 / 60).copy()
    return np.asarray(dev.display), np.stack(host_out), dev


def test_shared_schedule_matches_host():
    cfg = cfg_for(width=320, meter_buf=150)
    S = 3

    def feeds(k, now):
        t = (np.arange(480) + k * 480) / SR
        out = []
        for s in range(S):
            x = (0.1 * (s + 1) * np.sin(2 * np.pi * 440 * t)).astype(
                np.float32)
            out.append((s, np.stack([x, x]), now))
        return out

    got, want, dev = _drive_pair(cfg, S, feeds, ticks=40)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert not dev.last_silent.any()


def test_independent_sync_states():
    """Streams with different packet cadences and sync offsets: stream 0
    feeds every tick, stream 1 in double packets every other tick, stream 2
    with timestamps lagging 50 ms — each must match its own host scroller."""
    cfg = cfg_for(width=256, meter_buf=120)
    S = 3

    def feeds(k, now):
        out = []
        t = (np.arange(480) + k * 480) / SR
        x0 = (0.3 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
        out.append((0, np.stack([x0, x0]), now))
        if k % 2 == 1:
            t2 = (np.arange(960) + (k - 1) * 480) / SR
            x1 = (0.2 * np.sin(2 * np.pi * 700 * t2)).astype(np.float32)
            out.append((1, np.stack([x1, x1]), now - 960 * NS // SR))
        x2 = (0.15 * np.sin(2 * np.pi * 1100 * t)).astype(np.float32)
        out.append((2, np.stack([x2, x2]), now - 50_000_000))
        return out

    got, want, dev = _drive_pair(cfg, S, feeds, ticks=50)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_timeout_and_silence_latch():
    """A stream that stops feeding decays to DB_MIN once and latches; a
    stream that feeds zeros latches silent."""
    cfg = cfg_for(width=160, meter_buf=100)
    S = 2
    dev = DeviceWaveformEngine(cfg, S)
    now = NS
    for k in range(30):
        t = (np.arange(480) + k * 480) / SR
        x = (0.5 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
        dev.feed(0, np.stack([x, x]), now, now_ns=now)
        dev.feed(1, np.zeros((2, 480), np.float32), now, now_ns=now)
        now += 480 * NS // SR
        dev.tick(now_ns=now)
    disp = np.asarray(dev.display)
    assert (disp[0] > DB_MIN).any()
    assert (disp[1] == DB_MIN).all()          # zero stream displays silence
    # (the latch itself stays False once the display holds DB_MIN values —
    # DB_MIN != 0.0 defeats the scroller's any(buf != 0) scan, the same
    # quirk as the host WaveformScroller / the reference)
    assert not dev.last_silent[0]
    # stop feeding -> capture timeout -> DB_MIN + latch for every stream
    disp = np.asarray(dev.tick(now_ns=now + 600_000_000))
    assert (disp[0] == DB_MIN).all()
    assert dev.last_silent.all()


def test_device_normalize_volume_matches_host():
    """normalize_volume on the device path == per-stream host scrollers
    (which run the reference's synced 1 s RMS window)."""
    cfg = cfg_for(width=200, meter_buf=100, normalize_volume=True,
                  volume_target=-8, max_gain=30)
    S = 2

    def feeds(k, now):
        t = (np.arange(480) + k * 480) / SR
        out = []
        for s in range(S):
            amp = 0.1 * (s + 1)
            x = (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
            out.append((s, np.stack([x, x]), now))
        return out

    got, want, dev = _drive_pair(cfg, S, feeds, ticks=130)  # > 1 s
    np.testing.assert_allclose(got, want, atol=2e-2)
    # the quieter stream gets more gain: displays should be within ~2 dB
    m0, m1 = got[0].max(), got[1].max()
    assert abs(m0 - m1) < 2.5


def test_batched_scroller_normalize_volume():
    """BatchedWaveformScroller (shared sync) now supports normalize_volume
    and matches per-stream scrollers."""
    cfg = cfg_for(width=200, meter_buf=100, normalize_volume=True,
                  volume_target=-8, max_gain=30)
    S = 3
    batched = BatchedWaveformScroller(cfg, S)
    singles = [WaveformScroller(cfg) for _ in range(S)]
    srcs = [StreamSource(cfg) for _ in range(S)]
    now = NS
    for k in range(130):
        t = (np.arange(480) + k * 480) / SR
        pkt = np.stack([(0.1 * (s + 1) * np.sin(2 * np.pi * 440 * t))
                        .astype(np.float32) for s in range(S)])
        data = np.stack([pkt, pkt], axis=1)
        batched.feed_batch(data, now, now_ns=now)
        for s in range(S):
            srcs[s].capture_audio(data[s], now, now_ns=now)
        now += 480 * NS // SR
        out_b = batched.tick(now)
        outs = [singles[s].tick(srcs[s], now, 1 / 60) for s in range(S)]
    for s in range(S):
        np.testing.assert_allclose(out_b[s], outs[s], atol=2e-2)


def test_timestamp_lead_does_not_freeze():
    """Audio stamped ahead of the clock (a pre-buffering player; the host
    ring grows for leads up to 16 s): within the device ring's lead budget
    the engines match; beyond it the device clamps and keeps rendering
    instead of freezing at DB_MIN."""
    cfg = cfg_for(width=256, meter_buf=120)

    # within budget (100 ms < default 250 ms): exact host equivalence
    def feeds_small(k, now):
        t = (np.arange(480) + k * 480) / SR
        x = (0.3 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
        return [(0, np.stack([x, x]), now + 100_000_000)]

    got, want, dev = _drive_pair(cfg, 1, feeds_small, ticks=60)
    np.testing.assert_allclose(got, want, atol=1e-4)

    # beyond budget (1 s): host would hold it as reserve; the device clamps
    # (renders early) — the regression froze the display at DB_MIN forever
    dev2 = DeviceWaveformEngine(cfg, 1)
    now = NS
    for k in range(120):
        t = (np.arange(480) + k * 480) / SR
        x = (0.3 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
        dev2.feed(0, np.stack([x, x]), now + NS, now_ns=now)
        now += 480 * NS // SR
        out = dev2.tick(now_ns=now)
    assert np.asarray(out).max() > DB_MIN + 100


def test_normalize_volume_with_sync_offset_matches_host():
    """The device RMS window must not ingest sync-reserve squares early
    (regression: 2.4 dB divergence around a loudness step with an 80 ms
    audio_sync_offset)."""
    cfg = cfg_for(width=200, meter_buf=100, normalize_volume=True,
                  volume_target=-8, max_gain=30, audio_sync_offset=80)

    def feeds(k, now):
        t = (np.arange(480) + k * 480) / SR
        amp = 0.02 if k < 30 else 0.5       # loudness step at tick 30
        x = (amp * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        return [(0, np.stack([x, x]), now)]

    got, want, dev = _drive_pair(cfg, 1, feeds, ticks=140)
    np.testing.assert_allclose(got, want, atol=3e-2)


def test_multi_engine_routes_waveform_to_device_engine():
    """MultiEngine scenes put waveform groups on the device-resident
    scroll engine (r4) — one dispatch per group instead of per-stream
    host scrollers — and live resizes migrate scroll state."""
    from waveform_tpu.runtime.multi import MultiEngine
    from waveform_tpu.runtime.waveform_device import DeviceWaveformEngine

    wcfg = resolve(Settings(display_mode=DisplayMode.WAVEFORM, width=128,
                            meter_buf=100), AudioInfo(SR, 2))
    scene = MultiEngine()
    w0 = scene.add_stream(wcfg)
    now = NS
    for k in range(12):
        t = (np.arange(960) + k * 960) / SR
        x = (0.5 * np.sin(2 * np.pi * 880 * t)).astype(np.float32)
        scene.feed(w0, np.stack([x, x]), now, now_ns=now)
        now += 960 * NS // SR
        scene.tick(now_ns=now)
    assert isinstance(scene._engines[wcfg], DeviceWaveformEngine)
    vals = scene.read_decibels(w0)
    assert vals.shape[-1] == 128 and np.isfinite(vals).all()
    assert vals.max() > -10            # the tone's |x| tail is visible

    # live resize through the scene API migrates device scroll state
    w1 = scene.add_stream(wcfg)
    scene.tick(now_ns=now)
    after = scene.read_decibels(w0)
    assert np.isfinite(after).all()
    assert scene.read_decibels(w1).shape == after.shape


def test_waveform_cohort_matches_solo_engines():
    """Two waveform groups sharing a packed row width fuse into ONE upload
    cohort (r4 closes the last cohort gap — all three engine families now
    speak the packed-row contract), and the fusion is a transfer-layer
    change only: the scene must produce bit-identical displays to
    standalone DeviceWaveformEngines fed the same audio."""
    from waveform_tpu.runtime.multi import MultiEngine
    from waveform_tpu.runtime.waveform_device import DeviceWaveformEngine

    cfg_a = cfg_for(width=128, meter_buf=100)
    cfg_b = cfg_for(width=128, meter_buf=100, fast_peaks=True)
    assert cfg_a != cfg_b                      # two groups…
    scene = MultiEngine()
    a0, a1 = scene.add_stream(cfg_a), scene.add_stream(cfg_a)
    b0 = scene.add_stream(cfg_b)

    ref_a = DeviceWaveformEngine(cfg_a, 2)
    ref_b = DeviceWaveformEngine(cfg_b, 1)
    assert ref_a.packed_width == ref_b.packed_width   # …one cohort

    rng = np.random.default_rng(11)
    now = NS
    for k in range(20):
        pkts = [0.4 * rng.standard_normal((2, 480)).astype(np.float32)
                for _ in range(3)]
        if k % 7 == 3:
            pkts[1] = np.zeros((2, 480), np.float32)  # silent stretch
        for sid, j in [(a0, 0), (a1, 1), (b0, 2)]:
            scene.feed(sid, pkts[j], now, now_ns=now)
        ref_a.feed(0, pkts[0], now, now_ns=now)
        ref_a.feed(1, pkts[1], now, now_ns=now)
        ref_b.feed(0, pkts[2], now, now_ns=now)
        now += 480 * NS // SR
        scene.tick(now_ns=now)
        ref_a.tick(now_ns=now)
        ref_b.tick(now_ns=now)

    assert len(scene._cohorts) == 1
    assert len(scene._cohorts[0]["engines"]) == 2
    np.testing.assert_array_equal(scene.read_decibels(a0),
                                  ref_a.render_values()[0])
    np.testing.assert_array_equal(scene.read_decibels(a1),
                                  ref_a.render_values()[1])
    np.testing.assert_array_equal(scene.read_decibels(b0),
                                  ref_b.render_values()[0])


def test_waveform_microbatch_matches_k1():
    """microbatch=k flushes k assembled frames as ONE scan dispatch with
    frame-identical semantics: after a multiple-of-k tick count the
    display must be bit-identical to a k=1 engine fed the same audio
    (the ServingEngine microbatch contract, extended to waveform in r4)."""
    cfg = cfg_for(width=96, meter_buf=80)
    e1 = DeviceWaveformEngine(cfg, 3)
    e3 = DeviceWaveformEngine(cfg, 3, microbatch=3)

    rng = np.random.default_rng(7)
    now = NS
    for k in range(12):          # 12 % 3 == 0: both engines fully flushed
        for s in range(3):
            pkt = 0.3 * rng.standard_normal((2, 480)).astype(np.float32)
            if s == 1 and k % 5 == 2:
                pkt = np.zeros((2, 480), np.float32)
            e1.feed(s, pkt, now, now_ns=now)
            e3.feed(s, pkt, now, now_ns=now)
        now += 480 * NS // SR
        e1.tick(now_ns=now)
        e3.tick(now_ns=now)

    np.testing.assert_array_equal(e3.render_values(), e1.render_values())
    np.testing.assert_array_equal(e3.last_silent, e1.last_silent)


def test_waveform_auto_microbatch_resolves():
    """microbatch="auto" probes the link and locks in some k; frames keep
    flowing throughout (probe ticks are plain k=1 ticks)."""
    cfg = cfg_for(width=64, meter_buf=60)
    eng = DeviceWaveformEngine(cfg, 2, microbatch="auto")
    now = NS
    for k in range(10):
        t = (np.arange(480) + k * 480) / SR
        x = (0.4 * np.sin(2 * np.pi * 660 * t)).astype(np.float32)
        for s in range(2):
            eng.feed(s, np.stack([x, x]), now, now_ns=now)
        now += 480 * NS // SR
        eng.tick(now_ns=now)
    assert eng.microbatch >= 1 and not eng._mb_auto
    vals = eng.render_values()
    assert np.isfinite(vals).all() and vals.max() > -12


def _native_available():
    from waveform_tpu.native import load_library
    return load_library() is not None


def test_native_waveform_assembly_bit_identical():
    """The C++ waveform assembly (native/assembler.cpp::wf_assemble_waveform)
    must be BIT-identical to the NumPy ``_assemble`` under a torture
    schedule: uneven cadence, mutes, a bogus timestamp, sync lag and lead,
    show toggles, a capture dropout, volume normalization — the packed rows
    feed the same jitted step, so any host-math divergence shows up in the
    display."""
    import pytest
    if not _native_available():
        pytest.skip("native assembler unavailable")
    cfg = cfg_for(width=192, meter_buf=110, normalize_volume=True,
                  volume_target=-8, max_gain=30, audio_sync_offset=40)
    S = 4
    nat = DeviceWaveformEngine(cfg, S, use_native=True)
    pyt = DeviceWaveformEngine(cfg, S, use_native=False)
    rng = np.random.default_rng(11)
    now = NS
    for k in range(90):
        for s in range(S):
            if s == 1 and k % 3 != 0:
                continue                      # uneven cadence
            frames = [480, 960, 444][k % 3]
            pkt = (0.25 * (s + 1) / S
                   * rng.standard_normal((2, frames))).astype(np.float32)
            ts = now
            if s == 2:
                ts = now - 60_000_000         # steady 60 ms lag
            if s == 3:
                ts = now + 90_000_000         # 90 ms lead (within budget)
            if k == 40 and s == 0:
                ts = now + 30 * NS            # bogus timestamp (> 16 s)
            muted = (s == 0 and 50 <= k < 55)
            if not (s == 3 and 60 <= k < 70):  # s3: capture dropout window
                nat.feed(s, pkt, ts, now_ns=now, muted=muted)
                pyt.feed(s, pkt, ts, now_ns=now, muted=muted)
        if k == 20:
            nat.set_show(1, False)
            pyt.set_show(1, False)
        if k == 30:
            nat.set_show(1, True)
            pyt.set_show(1, True)
        now += 480 * NS // SR
        nat.tick(now_ns=now)
        pyt.tick(now_ns=now)
        np.testing.assert_array_equal(nat.render_values(),
                                      pyt.render_values(), err_msg=f"tick {k}")
    np.testing.assert_array_equal(nat.last_silent, pyt.last_silent)


def test_native_waveform_resize_migrates_scroll_state():
    """resized() on the native path must carry sync timestamps AND the
    waveform scroll cursor: post-resize ticks stay bit-identical to the
    Python-assembly engine resized the same way."""
    import pytest
    if not _native_available():
        pytest.skip("native assembler unavailable")
    cfg = cfg_for(width=128, meter_buf=100)
    nat = DeviceWaveformEngine(cfg, 3, use_native=True)
    pyt = DeviceWaveformEngine(cfg, 3, use_native=False)
    rng = np.random.default_rng(5)
    now = NS

    def drive(engines, k0, k1, S):
        nonlocal now
        for k in range(k0, k1):
            pkts = [(0.4 * rng.standard_normal((2, 480))).astype(np.float32)
                    for _ in range(S)]
            for eng, use in engines:
                for s in range(S):
                    eng.feed(s, pkts[s], now, now_ns=now)
            now += 480 * NS // SR
            for eng, use in engines:
                eng.tick(now_ns=now)

    drive([(nat, True), (pyt, False)], 0, 25, 3)
    nat2 = nat.resized(2, keep=[2, 0])
    pyt2 = pyt.resized(2, keep=[2, 0])
    assert nat2._native is not None           # native carried through
    drive([(nat2, True), (pyt2, False)], 25, 40, 2)
    np.testing.assert_array_equal(nat2.render_values(), pyt2.render_values())


def test_waveform_feed_batch_matches_per_stream():
    """feed_batch (one native call / shared timestamp) == S per-stream
    feeds with the same timestamp, on both host paths."""
    cfg = cfg_for(width=96, meter_buf=80)
    rng = np.random.default_rng(3)
    for use_native in (False, True):
        if use_native and not _native_available():
            continue
        a = DeviceWaveformEngine(cfg, 3, use_native=use_native)
        b = DeviceWaveformEngine(cfg, 3, use_native=use_native)
        now = NS
        for k in range(15):
            pkt = (0.3 * rng.standard_normal((3, 2, 480))).astype(np.float32)
            a.feed_batch(pkt, now, now_ns=now)
            for s in range(3):
                b.feed(s, pkt[s], now, now_ns=now)
            now += 480 * NS // SR
            a.tick(now_ns=now)
            b.tick(now_ns=now)
        np.testing.assert_array_equal(a.render_values(), b.render_values())
