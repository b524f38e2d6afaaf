"""OutputBus fan-out: shared-ring heterogeneous consumers.

The reference's output_bus capture feeds every subscribed source the same
mixed audio (/root/reference/src/source.cpp:676-720); here consumers share
one device ring and one step per distinct config, so a bus consumer must
match a standalone ServingEngine fed identical packets.
"""

import numpy as np
import pytest

from waveform_tpu import (
    AudioInfo,
    FFTWindow,
    Settings,
    TSmoothingMode,
    resolve,
)
from waveform_tpu.runtime.bus import OutputBus
from waveform_tpu.runtime.serving import ServingEngine

NS, SR = 1_000_000_000, 48000


def _cfg(**kw):
    return resolve(Settings(temporal_smoothing=TSmoothingMode.NONE, **kw),
                   AudioInfo(SR, 2))


def _run_bus(bus, handles, packets):
    now = NS
    for x in packets:
        bus.feed(x, now, now_ns=now)
        now += x.shape[-1] * NS // SR
        bus.tick(now_ns=now)
    return {h: bus.read_decibels(h) for h in handles}


def _packets(n_ticks=40, freq=2250.0, frames=800):
    ph = 0
    out = []
    for _ in range(n_ticks):
        t = (np.arange(frames) + ph) / SR
        x = np.sin(2 * np.pi * freq * t).astype(np.float32)
        out.append(np.stack([x, x]))
        ph += frames
    return out


def test_bus_matches_serving_engine():
    cfg = _cfg(fft_size=1024, window=FFTWindow.HANN)
    bus = OutputBus(cfg.audio)
    h = bus.subscribe(cfg)
    pkts = _packets()
    got = _run_bus(bus, [h], pkts)[h]

    eng = ServingEngine(cfg, 1)
    now = NS
    for x in pkts:
        eng.feed(0, x, now, now_ns=now)
        now += x.shape[-1] * NS // SR
        eng.tick(now_ns=now)
    want = eng.read_decibels()[0]
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_bus_heterogeneous_consumers_share_ring():
    cfgs = [_cfg(fft_size=512, window=FFTWindow.HANN),
            _cfg(fft_size=1024, window=FFTWindow.BLACKMAN),
            _cfg(fft_size=2048, window=FFTWindow.HANN, slope=0.5)]
    bus = OutputBus(cfgs[0].audio)
    # 6 consumers, 3 distinct configs → 3 groups, one ring
    handles = [bus.subscribe(cfgs[i % 3]) for i in range(6)]
    dbs = _run_bus(bus, handles, _packets(freq=SR / 512 * 24))  # bin-exact
    assert bus.num_groups == 3
    assert int(np.asarray(bus.ring.buf).shape[0]) == 1  # ONE shared ring
    for i, h in enumerate(handles):
        cfg = cfgs[i % 3]
        db = dbs[h]
        pk = int(np.argmax(db[0])) * SR / cfg.fft_size
        assert abs(pk - SR / 512 * 24) < 2 * SR / cfg.fft_size
    # same-config consumers share state: identical arrays
    np.testing.assert_array_equal(dbs[handles[0]], dbs[handles[3]])


def test_bus_timeout_gates_active():
    from waveform_tpu import DB_MIN
    cfg = _cfg(fft_size=512)
    bus = OutputBus(cfg.audio)
    h = bus.subscribe(cfg)
    _run_bus(bus, [h], _packets(n_ticks=10))
    last = NS + 10 * 800 * NS // SR
    bus.tick(now_ns=last + 600_000_000)   # > capture timeout
    assert (bus.read_decibels(h) == DB_MIN).all()


def test_bus_live_subscribe_and_unsubscribe():
    """Consumers attach to and detach from a RUNNING bus, like sources
    connecting to the OBS output bus at any time (src/source.cpp:685-704).
    A larger late subscriber grows the shared ring with its history
    carried over, so existing consumers' spectra are unaffected."""
    from waveform_tpu import DB_MIN
    cfg_a = _cfg(fft_size=512, window=FFTWindow.HANN)
    bus = OutputBus(cfg_a.audio)
    ha = bus.subscribe(cfg_a)
    freq = SR / 512 * 24        # bin-exact for both sizes
    pkts = _packets(n_ticks=30, freq=freq)
    _run_bus(bus, [ha], pkts)
    L_before = bus.L
    pre = bus.read_decibels(ha).copy()

    # live attach with a LARGER window: ring grows, history carries
    cfg_b = _cfg(fft_size=2048, window=FFTWindow.HANN)
    hb = bus.subscribe(cfg_b)
    assert bus.L > L_before
    np.testing.assert_array_equal(bus.read_decibels(ha), pre)
    # the carried ring history means the big window is ALREADY full of the
    # tone: the very next tick resolves it bin-exactly
    now = NS + len(pkts) * 800 * NS // SR
    ph = len(pkts) * 800
    t = (np.arange(800) + ph) / SR
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    bus.feed(np.stack([x, x]), now, now_ns=now)
    bus.tick(now_ns=now + 800 * NS // SR)
    db_b = bus.read_decibels(hb)
    assert int(np.argmax(db_b[0])) == 24 * 4     # same tone, 4x the bins
    assert db_b[0].max() > -2
    # existing consumer unaffected by the grow
    db_a = bus.read_decibels(ha)
    assert int(np.argmax(db_a[0])) == 24

    # a second subscriber of an existing config shares the group (no-op)
    ha2 = bus.subscribe(cfg_a)
    np.testing.assert_array_equal(bus.read_decibels(ha2),
                                  bus.read_decibels(ha))

    # unsubscribe: the group drops with its last handle
    bus.unsubscribe(hb)
    assert bus.num_groups == 1
    bus.unsubscribe(ha2)
    assert bus.num_groups == 1   # ha still holds cfg_a
    with pytest.raises(KeyError):
        bus.read_decibels(ha2)
    assert np.isfinite(bus.read_decibels(ha)).all()
    assert DB_MIN <= bus.read_decibels(ha).max() <= 0.0


def _meter_cfg(**kw):
    from waveform_tpu import DisplayMode
    return resolve(Settings(display_mode=DisplayMode.METER,
                            temporal_smoothing=TSmoothingMode.NONE, **kw),
                   AudioInfo(SR, 2))


def _wf_cfg(**kw):
    from waveform_tpu import DisplayMode
    return resolve(Settings(display_mode=DisplayMode.WAVEFORM, width=512,
                            meter_buf=100, **kw), AudioInfo(SR, 2))


def test_bus_mixed_consumers_share_ring():
    """Any source type attaches to the bus (the reference's output_bus
    capture, src/source.cpp:685-704): spectrum + meter + waveform tick
    off ONE shared ring with one upload per tick."""
    spec = _cfg(fft_size=1024, window=FFTWindow.HANN)
    met = _meter_cfg(rms_mode=True, meter_buf=150)
    wf = _wf_cfg()
    bus = OutputBus(spec.audio)
    hs, hm, hw = bus.subscribe(spec), bus.subscribe(met), bus.subscribe(wf)
    assert bus.num_groups == 3
    _run_bus(bus, [hs], _packets(n_ticks=40, freq=SR / 1024 * 24))
    assert int(np.asarray(bus.ring.buf).shape[0]) == 1   # ONE shared ring

    # spectrum: bin-exact peak
    db = bus.read_decibels(hs)
    assert int(np.argmax(db[0])) == 24
    # meter: RMS of a full-scale sine = 1/sqrt(2) = -3.01 dBFS
    lv = bus.read_pixels(hm)
    assert lv.shape == (2,)
    np.testing.assert_allclose(lv, -3.0103, atol=0.1)
    # waveform: |sin| in dBFS — peak near 0, all <= 0, finite
    disp = bus.read_pixels(hw)
    assert disp.shape == (1, 512)
    assert np.isfinite(disp).all()
    assert disp.max() <= 0.0 and disp.max() > -1.0


def test_bus_meter_peak_mode_and_timeout_mask():
    from waveform_tpu import DB_MIN
    met = _meter_cfg(rms_mode=False, meter_buf=150)
    bus = OutputBus(met.audio)
    h = bus.subscribe(met)
    pkts = [0.5 * p for p in _packets(n_ticks=30)]
    _run_bus(bus, [h], pkts)
    steady = bus.read_pixels(h).copy()
    np.testing.assert_allclose(steady, 20 * np.log10(0.5), atol=0.05)

    # timeout: levels drop to DB_MIN and latch
    last = NS + 30 * 800 * NS // SR
    t = last + 600_000_000
    bus.tick(now_ns=t)
    assert (bus.read_pixels(h) == DB_MIN).all()

    # resume with ONE packet: pre-timeout ring samples are masked out (the
    # reference memsets its meter ring, src/source_generic.cpp:184-199),
    # so the peak rebuilds from fresh samples only — here equal amplitude,
    # so the level returns; the masked window must NOT read stale history
    ph = 30 * 800
    tt = (np.arange(800) + ph) / SR
    x = (0.25 * np.sin(2 * np.pi * 2250.0 * tt)).astype(np.float32)
    bus.feed(np.stack([x, x]), t, now_ns=t)
    t2 = t + 800 * NS // SR
    bus.tick(now_ns=t2)
    lv = bus.read_pixels(h)
    # fresh peak is 0.25-scale: stale 0.5-scale samples didn't leak through
    assert (lv <= 20 * np.log10(0.25) + 0.1).all()
    assert (lv > DB_MIN).all()


def test_bus_waveform_scrolls_and_blanks():
    from waveform_tpu import DB_MIN
    wf = _wf_cfg()
    bus = OutputBus(wf.audio)
    h = bus.subscribe(wf)
    # constant DC 0.5 -> every fresh pixel resolves to dbfs(0.5)
    pkts = [np.full((2, 800), 0.5, np.float32) for _ in range(40)]
    _run_bus(bus, [h], pkts)
    disp = bus.read_pixels(h)
    np.testing.assert_allclose(disp[0], 20 * np.log10(0.5), atol=1e-4)

    # timeout blanks the display channels and latches
    last = NS + 40 * 800 * NS // SR
    bus.tick(now_ns=last + 600_000_000)
    assert (bus.read_pixels(h) == DB_MIN).all()


def test_bus_waveform_silence_blanks():
    from waveform_tpu import DB_MIN
    wf = _wf_cfg()
    bus = OutputBus(wf.audio)
    h = bus.subscribe(wf)
    pkts = [np.zeros((2, 800), np.float32) for _ in range(20)]
    _run_bus(bus, [h], pkts)
    assert (bus.read_pixels(h) == DB_MIN).all()


def test_bus_pixels_shape():
    cfg = _cfg(fft_size=1024, width=640)
    bus = OutputBus(cfg.audio)
    h = bus.subscribe(cfg)
    _run_bus(bus, [h], _packets(n_ticks=5))
    px = bus.read_pixels(h)
    assert px.shape == (1, 640)
    assert np.isfinite(px).all()


def test_bus_read_before_tick_raises_clearly():
    cfg = _cfg(fft_size=512)
    bus = OutputBus(cfg.audio)
    h = bus.subscribe(cfg)
    with pytest.raises(RuntimeError, match="tick"):
        bus.read_pixels(h)
    with pytest.raises(RuntimeError, match="tick"):
        bus.read_decibels(h)


def test_bus_rms_window_survives_push_longer_than_window():
    """A single tick can push more samples than the 1 s RMS window (big
    hop_budget / low fps); the window must then become exactly the last R
    samples — positional updates would hit duplicate ring slots and
    permanently desync the running sum."""
    cfg = _cfg(fft_size=512, normalize_volume=True)
    R = cfg.input_rms_size
    bus = OutputBus(cfg.audio, hop_budget=R + 512)
    bus.subscribe(cfg)
    rng = np.random.default_rng(11)
    big = (0.5 * rng.standard_normal((2, R + 512))).astype(np.float32)
    now = NS
    bus.feed(big, now, now_ns=now)
    now += big.shape[-1] * NS // SR
    bus.tick(now_ns=now)
    # invariant: the running sum tracks the window contents exactly
    assert np.isclose(bus._rms_sum, bus._rms_win.sum(dtype=np.float64),
                      rtol=1e-6)
    want = (np.max(np.abs(big[:, -R:]), axis=0).astype(np.float32)
            .astype(np.float64) ** 2).sum()
    assert np.isclose(bus._rms_sum, want, rtol=1e-5)
    # and a following small push keeps it consistent
    small = (0.5 * rng.standard_normal((2, 480))).astype(np.float32)
    bus.feed(small, now, now_ns=now)
    now += 480 * NS // SR
    bus.tick(now_ns=now)
    assert np.isclose(bus._rms_sum, bus._rms_win.sum(dtype=np.float64),
                      rtol=1e-6)


def test_bus_render_frame_all_modes():
    """Every consumer mode renders an RGBA frame from its bus state; two
    consumers sharing a config share one compiled renderer."""
    from waveform_tpu import DisplayMode
    cfg_s = _cfg(fft_size=1024, width=80, height=60)
    cfg_m = _cfg(display_mode=DisplayMode.METER, meter_buf=100,
                 width=40, height=90, bar_width=16, bar_gap=4)
    cfg_w = _cfg(display_mode=DisplayMode.WAVEFORM, width=100, height=50,
                 meter_buf=100)
    bus = OutputBus(AudioInfo(SR, 2))
    hs = bus.subscribe(cfg_s)
    hs2 = bus.subscribe(cfg_s)      # same config -> shared renderer
    hm = bus.subscribe(cfg_m)
    hw = bus.subscribe(cfg_w)
    _run_bus(bus, [hs, hm, hw], _packets())
    img_s = bus.render_frame(hs)
    img_s2 = bus.render_frame(hs2)
    img_m = bus.render_frame(hm)
    img_w = bus.render_frame(hw)
    assert img_s.shape == (60, 80, 4)
    assert img_m.shape == (90, 40, 4)
    assert img_w.shape == (50, 100, 4)
    for img in (img_s, img_m, img_w):
        assert np.isfinite(img).all()
        assert img[..., 3].max() > 0.5
    np.testing.assert_array_equal(img_s, img_s2)
    # the three configs land in the process-wide shared renderer cache
    from waveform_tpu.render import raster
    assert all((c, False) in raster._JITTED for c in (cfg_s, cfg_m, cfg_w))


def test_bus_render_frame_hide_on_silent():
    """hide_on_silent blanks silent spectrum and meter consumers to full
    transparency (the reference's render() early return,
    src/source.cpp:1349-1350) but never waveform consumers — the
    reference's tick_waveform never updates m_last_silent
    (source_generic.cpp:271-390)."""
    from waveform_tpu import DisplayMode
    cfg_s = _cfg(fft_size=1024, width=80, height=60, hide_on_silent=True)
    cfg_m = _cfg(display_mode=DisplayMode.METER, meter_buf=100,
                 width=40, height=90, bar_width=16, bar_gap=4,
                 hide_on_silent=True)
    cfg_w = _cfg(display_mode=DisplayMode.WAVEFORM, width=100, height=50,
                 meter_buf=100, hide_on_silent=True)
    bus = OutputBus(AudioInfo(SR, 2))
    hs, hm, hw = (bus.subscribe(c) for c in (cfg_s, cfg_m, cfg_w))
    # loud audio first: nothing blanks
    _run_bus(bus, [hs, hm, hw], _packets(n_ticks=20))
    assert bus.render_frame(hs)[..., 3].max() > 0.5
    assert bus.render_frame(hm)[..., 3].max() > 0.5
    assert bus.render_frame(hw)[..., 3].max() > 0.5
    # then sustained silence: spectrum + meter latch and blank
    zeros = [np.zeros((2, 800), np.float32) for _ in range(40)]
    now = NS + 40 * 800 * NS // SR
    for x in zeros:
        bus.feed(x, now, now_ns=now)
        now += x.shape[-1] * NS // SR
        bus.tick(now_ns=now)
    img_s, img_m, img_w = (bus.render_frame(h) for h in (hs, hm, hw))
    assert img_s.max() == 0.0, "silent spectrum consumer must blank"
    assert img_m.max() == 0.0, "silent meter consumer must blank"
    # waveform has no hide path (the reference's tick_waveform never sets
    # m_last_silent) — its silent frame is empty anyway because every
    # display value sits at DB_MIN below the floor, not because of the
    # flag (the loud-phase assert above is what pins the no-hide branch)
    assert np.isfinite(img_w).all()


def test_resolve_clamps_cutoffs_and_survives_zero_cutoff_high():
    """Scene-JSON cutoffs clamp to the 0-24000 sliders, and the
    cutoff_high=0 + roll-off corner saturates like the reference's IEEE
    float division (source.cpp:898-918) instead of raising."""
    from waveform_tpu.dsp import oracle
    cfg = resolve(Settings(cutoff_low=-5, cutoff_high=30000),
                  AudioInfo(SR, 2))
    assert cfg.cutoff_low == 0 and cfg.cutoff_high == 24000
    cfg0 = resolve(Settings(cutoff_low=0, cutoff_high=0, rolloff_q=1.0,
                            rolloff_rate=12.0, fft_size=512,
                            temporal_smoothing=TSmoothingMode.NONE),
                   AudioInfo(SR, 2))
    assert cfg0.cutoff_high == 0
    x = np.sin(2 * np.pi * 440.0 * np.arange(512) / SR)[None].repeat(2, 0)
    db, _ = oracle.spectrum_frame(x, None, cfg0, dt=1 / 60)
    from waveform_tpu import DB_MIN
    # infinite roll-off clamps every bin to the floor — except bin 0,
    # which the reference leaves unattenuated (m_rolloff_modifiers[0]=0,
    # source.cpp:907)
    assert np.all(db[:, 1:] == DB_MIN)
    assert np.isfinite(db).all()


def test_bus_all_unsubscribed_tick_is_noop():
    cfg = _cfg(fft_size=512)
    bus = OutputBus(cfg.audio)
    h = bus.subscribe(cfg)
    bus.unsubscribe(h)
    bus.feed(np.zeros((2, 800), np.float32), NS, now_ns=NS)
    bus.tick(now_ns=NS + 800 * NS // SR)   # must not crash on max([])
    assert bus.num_groups == 0
