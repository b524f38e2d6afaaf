"""Behavior tests for the host runtime: capture, sync, retry, timeout, modes.

These cover the plugin-level behaviors the reference validates only by eye
(SURVEY.md §4): A/V-sync ring trimming, 500 ms capture-timeout decay, the 2 s
retry loop, mute zero-fill, startup prefill, meter levels, waveform scroll.
"""

import numpy as np
import pytest

from waveform_tpu import (
    AudioInfo,
    ChannelMode,
    DB_MIN,
    DisplayMode,
    FFTWindow,
    Settings,
    TSmoothingMode,
    resolve,
)
from waveform_tpu.runtime.engine import WaveformEngine
from waveform_tpu.runtime.source import StreamSource

NS = 1_000_000_000
SR = 48000


def cfg_for(**kw):
    audio = kw.pop("audio", AudioInfo(SR, 2))
    return resolve(Settings(**kw), audio)


def feed_sine(engine, stream, t0_ns, n_packets=20, packet=480, freq=1000.0,
              amp=0.5):
    """Feed packets of a sine as the OBS audio thread would (10 ms packets)."""
    for k in range(n_packets):
        ts = t0_ns + k * packet * NS // SR
        t = (np.arange(packet) + k * packet) / SR
        x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        engine.feed(stream, np.stack([x, x]), ts, now_ns=ts)
    return t0_ns + n_packets * packet * NS // SR


def test_end_to_end_spectrum_tone():
    cfg = cfg_for(fft_size=2048, window=FFTWindow.HANN,
                  temporal_smoothing=TSmoothingMode.NONE)
    eng = WaveformEngine(cfg, num_streams=2, jit=False)
    t0 = 1_000 * NS
    end = feed_sine(eng, 0, t0, freq=3000.0, amp=1.0)
    end = feed_sine(eng, 1, t0, freq=6000.0, amp=1.0)
    db = eng.tick(now_ns=end)
    assert db.shape == (2, 1, 1024)
    peak0 = np.argmax(db[0, 0]) * SR / cfg.fft_size
    peak1 = np.argmax(db[1, 0]) * SR / cfg.fft_size
    assert abs(peak0 - 3000) < SR / cfg.fft_size * 2
    assert abs(peak1 - 6000) < SR / cfg.fft_size * 2
    assert db[0, 0].max() > -1.5


def test_av_sync_trimming():
    """Ring keeps only dtsamples + fft_size after each packet
    (src/source.cpp:1883-1886)."""
    cfg = cfg_for(fft_size=1024)
    src = StreamSource(cfg)
    t0 = 100 * NS
    # feed 2 seconds of audio "instantly" (timestamps ahead of wall clock)
    for k in range(200):
        ts = t0 + k * 480 * NS // SR
        src.capture_audio(np.ones((2, 480), np.float32), ts, now_ns=t0)
    # audio_ts is ~2 s ahead of now; ring must hold dtsamples + fft_size
    dt = src.get_audio_sync(t0)
    assert dt > 0
    expect = (dt * SR) // NS + 1024
    assert abs(src.rings[0].size - expect) <= 480


def test_sync_offset_shifts_window():
    """audio_sync_offset delays which samples the tick sees
    (src/settings: P_AUDIO_SYNC_OFFSET; src/source.hpp:279-285)."""
    base = dict(fft_size=1024, temporal_smoothing=TSmoothingMode.NONE,
                window=FFTWindow.NONE)
    t0 = 50 * NS
    results = {}
    for off in (0, 100):
        cfg = cfg_for(audio_sync_offset=off, **base)
        src = StreamSource(cfg)
        # 1 s ramp so each sample is identifiable
        for k in range(100):
            ts = t0 + k * 480 * NS // SR
            x = (np.arange(480) + k * 480).astype(np.float32) / 48000.0
            src.capture_audio(np.stack([x, x]), ts, now_ns=ts)
        now = t0 + 1 * NS
        tick = src.prepare_spectrum_tick(now, 1 / 60)
        assert tick.valid.all()
        results[off] = tick.frame[0].copy()
    # +100 ms offset keeps 100 ms look-ahead in the ring, so the displayed
    # window ends 100 ms earlier in the ramp → smaller values
    assert results[100].max() < results[0].max() - 0.05


def test_capture_timeout_decays_to_db_min():
    cfg = cfg_for(fft_size=1024)
    eng = WaveformEngine(cfg, 1, jit=False)
    t0 = 10 * NS
    end = feed_sine(eng, 0, t0, amp=1.0)
    db = eng.tick(now_ns=end)
    assert db.max() > -10
    # 600 ms later with no audio: capture timed out → DB_MIN
    db = eng.tick(now_ns=end + 600_000_000)
    assert (db == DB_MIN).all()
    assert eng.last_silent.all()


def test_retry_loop():
    """Capture lost → frame frozen; retry succeeds after RETRY_DELAY
    (src/source.cpp:751-780)."""
    cfg = cfg_for(fft_size=1024)
    eng = WaveformEngine(cfg, 1, jit=False)
    t0 = 10 * NS
    end = feed_sine(eng, 0, t0, amp=1.0)
    before = eng.tick(now_ns=end).copy()
    src = eng.sources[0]
    src.detach()
    attempts = []
    src.on_retry = lambda: attempts.append(1) or len(attempts) >= 2

    # while detached, ticks freeze the frame (early return, no timeout decay)
    db = eng.tick(now_ns=end + NS // 60)
    np.testing.assert_array_equal(db, before)
    assert len(attempts) == 1  # first retry fired immediately

    # < 2 s later: no new retry yet
    eng.tick(now_ns=end + NS)
    assert len(attempts) == 1

    # after RETRY_DELAY elapses the second retry succeeds and capture resumes
    eng.tick(now_ns=end + int(3.1 * NS))
    assert len(attempts) == 2 and src.capture_attached
    # capture_ts was reset at detach → dtcapture huge → decay to DB_MIN
    db = eng.tick(now_ns=end + int(3.2 * NS))
    assert (db == DB_MIN).all()


def test_mute_zero_fills():
    cfg = cfg_for(fft_size=1024)
    src = StreamSource(cfg)
    t0 = NS
    x = np.ones((2, 480), np.float32)
    src.capture_audio(x, t0, now_ns=t0, muted=True)
    got = src.rings[0].peek_front(src.rings[0].size)
    assert (got[-480:] == 0).all()
    # ignore_mute keeps the samples
    cfg2 = cfg_for(fft_size=1024, ignore_mute=True)
    src2 = StreamSource(cfg2)
    src2.capture_audio(x, t0, now_ns=t0, muted=True)
    got2 = src2.rings[0].peek_front(src2.rings[0].size)
    assert (got2[-480:] == 1).all()


def test_bogus_timestamp_clamp():
    """Timestamps >16 s away fall back to wall clock
    (src/source.cpp:1833-1837)."""
    cfg = cfg_for(fft_size=1024)
    src = StreamSource(cfg)
    now = 100 * NS
    src.capture_audio(np.ones((2, 480), np.float32), 10_000 * NS, now_ns=now)
    assert src.audio_ts == now  # clamped to capture_ts


def test_startup_prefill():
    """Rings are prefilled with fft_size zeros so the first tick is valid
    (src/source.cpp:1243-1248)."""
    cfg = cfg_for(fft_size=1024)
    src = StreamSource(cfg)
    assert src.rings[0].size == 1024
    tick = src.prepare_spectrum_tick(now_ns=NS, dt=1 / 60)
    assert tick.valid.all()
    assert (tick.frame == 0).all()


def test_meter_mode_levels():
    cfg = cfg_for(display_mode=DisplayMode.METER, meter_buf=100,
                  rms_mode=True, temporal_smoothing=TSmoothingMode.NONE)
    eng = WaveformEngine(cfg, 1, jit=False)
    t0 = NS
    # 0.5 amplitude square wave -> RMS 0.5 -> -6.02 dBFS
    for k in range(30):
        ts = t0 + k * 480 * NS // SR
        x = np.full((2, 480), 0.5, np.float32)
        eng.feed(0, x, ts, now_ns=ts)
    end = t0 + 30 * 480 * NS // SR
    val = eng.tick(now_ns=end)
    assert val.shape == (1, 1, 2)
    np.testing.assert_allclose(val[0, 0], 20 * np.log10(0.5), atol=0.1)

    # peak mode
    cfg2 = cfg_for(display_mode=DisplayMode.METER, meter_buf=100,
                   rms_mode=False, temporal_smoothing=TSmoothingMode.NONE)
    eng2 = WaveformEngine(cfg2, 1, jit=False)
    for k in range(30):
        ts = t0 + k * 480 * NS // SR
        t = (np.arange(480) + k * 480) / SR
        x = (0.25 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
        eng2.feed(0, np.stack([x, x]), ts, now_ns=ts)
    val2 = eng2.tick(now_ns=end)
    np.testing.assert_allclose(val2[0, 0], 20 * np.log10(0.25), atol=0.1)


def test_meter_timeout():
    cfg = cfg_for(display_mode=DisplayMode.METER, meter_buf=100,
                  temporal_smoothing=TSmoothingMode.NONE)
    eng = WaveformEngine(cfg, 1, jit=False)
    t0 = NS
    for k in range(30):
        ts = t0 + k * 480 * NS // SR
        eng.feed(0, np.full((2, 480), 0.5, np.float32), ts, now_ns=ts)
    end = t0 + 30 * 480 * NS // SR
    eng.tick(now_ns=end)
    val = eng.tick(now_ns=end + 600_000_000)
    assert (val == DB_MIN).all()
    assert eng.last_silent.all()
    # ring was zeroed by the host (timeout memset)
    assert (eng._meter_windows == 0).all()


def test_waveform_mode_scrolls():
    cfg = cfg_for(display_mode=DisplayMode.WAVEFORM, width=320, meter_buf=150,
                  temporal_smoothing=TSmoothingMode.NONE)
    assert cfg.fft_size == 320
    eng = WaveformEngine(cfg, 1, jit=False)
    t0 = NS
    end = t0
    # feed 300 ms of DC 0.5 audio
    for k in range(30):
        ts = t0 + k * 480 * NS // SR
        eng.feed(0, np.full((2, 480), 0.5, np.float32), ts, now_ns=ts)
        end = ts
    out = eng.tick(now_ns=end)
    assert out.shape == (1, 1, 320)
    # fresh tail must be dbfs(0.5) ≈ -6.02
    tail = out[0, 0][out[0, 0] > DB_MIN]
    assert len(tail) > 0
    np.testing.assert_allclose(tail, 20 * np.log10(0.5), atol=0.2)


def test_volume_normalization_rms_window():
    cfg = cfg_for(fft_size=1024, normalize_volume=True, volume_target=-8,
                  max_gain=30, temporal_smoothing=TSmoothingMode.NONE)
    src = StreamSource(cfg)
    t0 = NS
    for k in range(120):  # > 1 s of audio at amplitude 0.5
        ts = t0 + k * 480 * NS // SR
        src.capture_audio(np.full((2, 480), 0.5, np.float32), ts, now_ns=ts)
    end = t0 + 120 * 480 * NS // SR
    src.prepare_spectrum_tick(end, 1 / 60)
    # RMS window of squared max-channel samples: all 0.25 → rms 0.5
    np.testing.assert_allclose(src.input_rms, 0.5, atol=0.01)


def test_contention_drops_packet():
    """The audio callback drops its packet when the tick holds the lock
    longer than 10 ms (src/source.cpp:1822-1823 backpressure)."""
    import threading
    import time as _time
    cfg = cfg_for(fft_size=1024)
    src = StreamSource(cfg)
    src._lock.acquire()
    try:
        t0 = _time.monotonic()
        ok = src.capture_audio(np.ones((2, 480), np.float32), NS, now_ns=NS)
        waited = _time.monotonic() - t0
    finally:
        src._lock.release()
    assert not ok            # dropped
    assert 0.009 < waited < 0.5  # gave up after ~10ms
    # non-blocking variant returns immediately
    src._lock.acquire()
    try:
        ok = src.capture_audio(np.ones((2, 480), np.float32), NS, now_ns=NS,
                               blocking=False)
    finally:
        src._lock.release()
    assert not ok


def test_fault_injection_stale_timestamps():
    """Audio stamped far in the past is treated as stale: the sync reserve
    is 0, the ring trims to one window, display shows the latest samples."""
    cfg = cfg_for(fft_size=1024, temporal_smoothing=TSmoothingMode.NONE)
    src = StreamSource(cfg)
    now = 100 * NS
    ramp = np.arange(4800, dtype=np.float32) / 4800
    # stamped 10 s in the past (but < 16 s clamp)
    src.capture_audio(np.stack([ramp, ramp]), now - 10 * NS, now_ns=now)
    tick = src.prepare_spectrum_tick(now, 1 / 60)
    assert tick.valid.all()
    # window is the ramp tail (latest audio), not zeros
    assert tick.frame[0, -1] == ramp[-1]


def test_batched_waveform_matches_per_stream(rng):
    """BatchedWaveformScroller (shared sync) == S independent
    WaveformScrollers fed identical audio."""
    from waveform_tpu.runtime.waveform_host import (
        BatchedWaveformScroller,
        WaveformScroller,
    )
    S = 3
    cfg = cfg_for(display_mode=DisplayMode.WAVEFORM, width=320, meter_buf=150,
                  temporal_smoothing=TSmoothingMode.NONE)
    batched = BatchedWaveformScroller(cfg, S)
    singles = [WaveformScroller(cfg) for _ in range(S)]
    srcs = [StreamSource(cfg) for _ in range(S)]
    now = NS
    for k in range(40):
        t = (np.arange(480) + k * 480) / SR
        pkt = np.stack([(0.1 * (s + 1) * np.sin(2 * np.pi * 440 * t))
                        .astype(np.float32) for s in range(S)])   # [S, n]
        data = np.stack([pkt, pkt], axis=1)                       # [S, C, n]
        batched.feed_batch(data, now, now_ns=now)
        for s in range(S):
            srcs[s].capture_audio(data[s], now, now_ns=now)
        now += 480 * NS // SR
        out_b = batched.tick(now)
        outs = [singles[s].tick(srcs[s], now, 1 / 60) for s in range(S)]
    for s in range(S):
        np.testing.assert_allclose(out_b[s], outs[s], atol=1e-5)
    assert not batched.last_silent.any()


def test_batched_waveform_timeout():
    from waveform_tpu.runtime.waveform_host import BatchedWaveformScroller
    cfg = cfg_for(display_mode=DisplayMode.WAVEFORM, width=160, meter_buf=100)
    b = BatchedWaveformScroller(cfg, 2)
    now = NS
    for k in range(20):
        b.feed_batch(np.full((2, 2, 480), 0.5, np.float32), now, now_ns=now)
        now += 480 * NS // SR
        out = b.tick(now)
    assert (out > DB_MIN).any()
    out = b.tick(now + 600_000_000)
    assert (out == DB_MIN).all()
    assert b.last_silent.all()


def test_waveform_stereo_mono_capture_channel1_stays_raw(rng):
    """Stereo display of MONO capture: the reference converts channel ch
    over counts[ch] pixels and counts[1] == 0 when capture_channels == 1,
    so channel 1 keeps the RAW pre-conversion copy of channel 0
    (source_generic.cpp:363-371).  Batched and device engines must match
    the per-stream WaveformScroller spec."""
    from waveform_tpu import AudioInfo, ChannelMode
    from waveform_tpu.runtime.source import StreamSource
    from waveform_tpu.runtime.waveform_device import DeviceWaveformEngine
    from waveform_tpu.runtime.waveform_host import (
        BatchedWaveformScroller,
        WaveformScroller,
    )
    cfg = resolve(Settings(display_mode=DisplayMode.WAVEFORM, width=256,
                           meter_buf=120, channel_mode=ChannelMode.STEREO),
                  AudioInfo(SR, 1))     # ONE capture channel
    assert cfg.stereo and cfg.capture_channels == 1
    assert cfg.output_channels == 2 and cfg.display_channels == 2
    single = WaveformScroller(cfg)
    src = StreamSource(cfg)
    batched = BatchedWaveformScroller(cfg, 1)
    dev = DeviceWaveformEngine(cfg, 1)
    now = NS
    for k in range(40):
        t = (np.arange(480) + k * 480) / SR
        x = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        pkt = x[None]                       # [C=1, n]
        src.capture_audio(pkt, now, now_ns=now)
        batched.feed_batch(pkt[None], now, now_ns=now)
        dev.feed(0, pkt, now, now_ns=now)
        now += 480 * NS // SR
        out_s = single.tick(src, now, 1 / 60)
        out_b = batched.tick(now)
        dev.tick(now_ns=now)
    out_d = np.asarray(dev.display)
    # channel 1 is the PRE-conversion copy of channel 0 (old dB values +
    # RAW fresh tail): the old bug converted channel 1's tail too, making
    # the channels identical — they must differ in the fresh tail
    assert not np.allclose(out_s[0], out_s[1]), "ch1 tail was converted"
    # and the fresh raw samples are bounded by the 0.5 amplitude while
    # ch0's converted tail carries dB values
    assert np.abs(out_s[1][-8:]).max() <= 0.5 + 1e-6
    np.testing.assert_allclose(out_b[0], out_s, atol=1e-5)
    np.testing.assert_allclose(out_d[0], out_s, atol=1e-4)


def test_batched_waveform_mute_and_narrow_packets():
    """feed_batch mute zero-fills like its siblings (src:1878-1879), and
    narrow packets zero-pad missing channels instead of crashing tick."""
    from waveform_tpu.runtime.waveform_host import BatchedWaveformScroller
    cfg = cfg_for(display_mode=DisplayMode.WAVEFORM, width=160,
                  meter_buf=100)
    b = BatchedWaveformScroller(cfg, 1)
    now = NS
    for k in range(20):   # muted from the start: display stays silent
        b.feed_batch(np.full((1, 2, 480), 0.5, np.float32), now,
                     now_ns=now, muted=True)
        now += 480 * NS // SR
        out = b.tick(now)
    # display blanks (the latch itself stays False: the mixed-domain
    # != 0 scan sees the DB_MIN fills — reference-quirk parity, same as
    # the per-stream WaveformScroller)
    assert (out == DB_MIN).all()
    for k in range(20):   # narrow [S, 1, n] packets: ch1 zero-fills
        b.feed_batch(np.full((1, 1, 480), 0.5, np.float32), now,
                     now_ns=now)
        now += 480 * NS // SR
        out = b.tick(now)
    assert np.isfinite(out).all() and (out > DB_MIN).any()


def test_device_waveform_hidden_stream_keeps_draining():
    """A hidden stream's device ring keeps tracking the newest audio (the
    reference's capture ring fills regardless of show), so a resume
    renders genuine recent audio with no stale gap."""
    from waveform_tpu.runtime.waveform_device import DeviceWaveformEngine
    cfg = cfg_for(display_mode=DisplayMode.WAVEFORM, width=160,
                  meter_buf=100, temporal_smoothing=TSmoothingMode.NONE)
    dev = DeviceWaveformEngine(cfg, 1)
    now = NS

    def drive(ticks, amp):
        nonlocal now
        for k in range(ticks):
            dev.feed(0, np.full((2, 480), amp, np.float32), now, now_ns=now)
            now += 480 * NS // SR
            dev.tick(now_ns=now)

    drive(20, 0.5)
    dev.set_show(0, False)
    drive(60, 0.25)          # hidden: feeder keeps running (~0.6 s)
    dev.set_show(0, True)
    drive(20, 0.25)
    disp = np.asarray(dev.display)[0, 0]
    # every visible pixel reflects the 0.25-amplitude era: dbfs(0.25)
    want = 20 * np.log10(0.25)
    fresh = disp[disp > DB_MIN]
    assert fresh.size and np.allclose(fresh, want, atol=0.01), (
        fresh.min(), fresh.max())
