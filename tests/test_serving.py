"""Device-ring serving path: correctness vs the host-ring engine and oracle."""

import jax.numpy as jnp
import numpy as np

from waveform_tpu import (
    AudioInfo,
    FFTWindow,
    Settings,
    TSmoothingMode,
    resolve,
)
from waveform_tpu.dsp.devring import init_ring, push
from waveform_tpu.runtime.engine import WaveformEngine
from waveform_tpu.runtime.serving import ServingEngine

NS, SR = 1_000_000_000, 48000


def test_device_ring_push():
    ring = init_ring(2, 1, 8)
    new = np.zeros((2, 1, 4), np.float32)
    new[0, 0] = [1, 2, 3, 4]
    new[1, 0] = [9, 9, 9, 9]
    ring = push(ring, jnp.asarray(new), jnp.asarray([4, 2], np.int32))
    np.testing.assert_array_equal(
        np.asarray(ring.buf[0, 0]), [0, 0, 0, 0, 1, 2, 3, 4])
    # stream 1 advanced by 2: window is zeros + first 2 of new
    np.testing.assert_array_equal(
        np.asarray(ring.buf[1, 0]), [0, 0, 0, 0, 0, 0, 9, 9])
    # zero-count push is identity
    ring2 = push(ring, jnp.zeros((2, 1, 4), jnp.float32),
                 jnp.zeros(2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(ring2.buf), np.asarray(ring.buf))


def _session(engine_cls, cfg, n_ticks=20, freq=2000.0, **kw):
    eng = engine_cls(cfg, 2, **kw)
    now = NS
    phase = 0
    out = None
    for k in range(n_ticks):
        for _ in range(2):  # 2 packets per tick
            t = (np.arange(480) + phase) / SR
            x = np.sin(2 * np.pi * freq * t).astype(np.float32)
            for s in range(2):
                eng.feed(s, np.stack([x, x]), now, now_ns=now)
            phase += 480
            now += 480 * NS // SR
        out = eng.tick(now_ns=now)
    return eng, out


def test_serving_matches_host_engine():
    """Both engines see identical audio at identical timestamps → identical
    spectra (the device ring reproduces pop-to-sync/peek assembly)."""
    cfg = resolve(Settings(fft_size=1024, window=FFTWindow.HANN,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(SR, 2))
    host_eng, host_db = _session(WaveformEngine, cfg, jit=False)
    srv_eng, _ = _session(ServingEngine, cfg)
    srv_db = srv_eng.read_decibels()
    np.testing.assert_allclose(srv_db, host_db, atol=1e-3)


def test_serving_tone_and_pixels():
    cfg = resolve(Settings(fft_size=2048), AudioInfo(SR, 2))
    eng, pixels = _session(ServingEngine, cfg, n_ticks=30, freq=5000.0)
    db = eng.read_decibels()
    pk = int(np.argmax(db[0, 0])) * SR / cfg.fft_size
    assert abs(pk - 5000) < 2 * SR / cfg.fft_size
    assert db[0, 0].max() > -2
    px = eng.read_pixels()
    assert px.shape == (2, 1, 800)
    assert np.isfinite(px).all()


def test_serving_timeout_decay():
    cfg = resolve(Settings(fft_size=1024), AudioInfo(SR, 2))
    eng, _ = _session(ServingEngine, cfg, n_ticks=10, freq=1000.0)
    from waveform_tpu import DB_MIN
    db = eng.read_decibels()
    assert db.max() > -10
    # no audio for 600 ms → timeout → DB_MIN
    last_now = NS + 10 * 2 * 480 * NS // SR
    eng.tick(now_ns=last_now + 600_000_000)
    db = eng.read_decibels()
    assert (db == DB_MIN).all()


def test_serving_hop_budget_absorbs_burst():
    """A burst larger than one hop drains over several ticks without loss of
    sync (excess stays queued, capped by the reserve trim)."""
    cfg = resolve(Settings(fft_size=1024,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(SR, 2))
    eng = ServingEngine(cfg, 1)
    now = NS
    # burst: 0.4 s of ramp all at once, timestamps in the past->now
    n = int(0.4 * SR)
    x = (np.arange(n) / n).astype(np.float32)
    eng.feed(0, np.stack([x, x]), now - 400_000_000, now_ns=now)
    for k in range(30):
        now += NS // 60
        eng.tick(now_ns=now)
    db = eng.read_decibels()
    # after draining, the window holds the ramp tail (non-silent, DC-heavy)
    assert db[0, 0, 0] > -20


def test_native_vs_python_serving_paths():
    """use_native=True and use_native=False produce identical spectra."""
    from waveform_tpu.native import load_library
    if load_library() is None:
        import pytest
        pytest.skip("native unavailable")
    cfg = resolve(Settings(fft_size=1024,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(SR, 2))
    rng = np.random.default_rng(5)
    engines = [ServingEngine(cfg, 2, use_native=u) for u in (True, False)]
    now = NS
    for k in range(15):
        x = rng.standard_normal((2, 2, 480)).astype(np.float32)
        for e in engines:
            for s in range(2):
                e.feed(s, x[s], now, now_ns=now)
        now += 480 * NS // SR
        for e in engines:
            e.tick(now_ns=now)
    a, b = engines[0].read_decibels(), engines[1].read_decibels()
    np.testing.assert_allclose(a, b, atol=1e-4)


def test_serving_volume_normalization():
    """Device-resident RMS window: gain = min(target - dbfs(rms), max_gain)
    applied to bins >= 1 (src/source_generic.cpp:161-167)."""
    base = dict(fft_size=1024, temporal_smoothing=TSmoothingMode.NONE,
                window=FFTWindow.NONE)
    quiet_amp = 0.1
    engines = {}
    for norm in (False, True):
        cfg = resolve(Settings(normalize_volume=norm, volume_target=-8,
                               max_gain=30, **base), AudioInfo(SR, 2))
        eng = ServingEngine(cfg, 1)
        now = NS
        t_ph = 0
        for k in range(80):  # > 1 s so the RMS window fills
            t = (np.arange(800) + t_ph) / SR
            x = (quiet_amp * np.sin(2 * np.pi * 1125 * t)).astype(np.float32)  # bin-exact
            eng.feed(0, np.stack([x, x]), now, now_ns=now)
            t_ph += 800
            now += 800 * NS // SR
            eng.tick(now_ns=now)
        engines[norm] = eng.read_decibels()
    peak_raw = engines[False][0, 0].max()
    peak_norm = engines[True][0, 0].max()
    # raw peak ~ 20log10(0.1) = -20 dB; rms of 0.1 sine ~ 0.0707 -> dbfs -23
    # gain = min(-8 - (-23), 30) = 15 dB
    assert abs(peak_raw - (-20.0)) < 0.5
    assert abs((peak_norm - peak_raw) - 15.0) < 0.7


def test_mute_does_not_poison_rms():
    """The normalization RMS derives from raw pre-mute samples
    (src/source.cpp:1843-1871 runs before the mute zero-fill), so a muted
    stream keeps its gain instead of snapping to max_gain on unmute."""
    cfg = resolve(Settings(fft_size=1024, normalize_volume=True,
                           volume_target=-8, max_gain=30,
                           temporal_smoothing=TSmoothingMode.NONE,
                           window=FFTWindow.NONE), AudioInfo(SR, 2))
    for use_native in (False, True):
        from waveform_tpu.native import load_library
        if use_native and load_library() is None:
            continue
        eng = ServingEngine(cfg, 1, use_native=use_native)
        now = NS
        ph = 0

        def feed(muted, n_ticks):
            nonlocal now, ph
            for _ in range(n_ticks):
                t = (np.arange(800) + ph) / SR
                x = (0.25 * np.sin(2 * np.pi * 1125 * t)).astype(np.float32)
                eng.feed(0, np.stack([x, x]), now, now_ns=now, muted=muted)
                ph += 800
                now += 800 * NS // SR
                eng.tick(now_ns=now)

        feed(False, 80)   # 1.3 s unmuted: RMS window fills at 0.25/sqrt(2)
        db_before = eng.read_decibels()[0, 0].max()
        feed(True, 30)    # 0.5 s muted: spectrum silent, RMS must NOT decay
        feed(False, 2)    # unmute
        db_after = eng.read_decibels()[0, 0].max()
        # gain identical before and after the mute (no max_gain blast)
        assert abs(db_after - db_before) < 0.5, (use_native, db_before,
                                                 db_after)


def test_short_channel_packet_zero_fills():
    """A mono packet into a stereo engine zero-fills channel 1 (the
    reference nullptr-checks audio->data[i] per channel)."""
    cfg = resolve(Settings(fft_size=512,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(SR, 2))
    for use_native in (False, True):
        from waveform_tpu.native import load_library
        if use_native and load_library() is None:
            continue
        eng = ServingEngine(cfg, 1, use_native=use_native)
        now = NS
        for k in range(10):
            x = np.ones((1, 480), np.float32) * 0.5  # mono packet
            eng.feed(0, x, now, now_ns=now)
            now += 480 * NS // SR
            eng.tick(now_ns=now)
        buf = np.asarray(eng.ring.view3)   # serving rings ride flat [S*C, L]
        assert (buf[0, 0, -400:] == 0.5).all()
        assert (buf[0, 1] == 0.0).all(), use_native


def test_dead_source_stays_dark():
    """capture_channels == 0 (invalid single-channel index) must not ingest
    audio on either path (reference capture_audio early-returns)."""
    from waveform_tpu import ChannelMode, DB_MIN
    cfg = resolve(Settings(channel_mode=ChannelMode.SINGLE, channel=5,
                           fft_size=512), AudioInfo(SR, 2))
    assert cfg.capture_channels == 0
    for use_native in (False, True):
        from waveform_tpu.native import load_library
        if use_native and load_library() is None:
            continue
        eng = ServingEngine(cfg, 1, use_native=use_native)
        now = NS
        for k in range(10):
            eng.feed(0, np.ones((2, 480), np.float32), now, now_ns=now)
            now += 480 * NS // SR
            eng.tick(now_ns=now)
        assert (eng.read_decibels() == DB_MIN).all(), use_native


def test_multi_engine_heterogeneous_configs():
    """One scene mixing different configs: streams group per config, each
    group runs its own compiled batch."""
    from waveform_tpu import DisplayMode
    from waveform_tpu.runtime.multi import MultiEngine
    cfg_curve = resolve(Settings(fft_size=1024,
                                 temporal_smoothing=TSmoothingMode.NONE),
                        AudioInfo(SR, 2))
    cfg_big = resolve(Settings(fft_size=2048,
                               temporal_smoothing=TSmoothingMode.NONE),
                      AudioInfo(SR, 2))
    cfg_meter = resolve(Settings(display_mode=DisplayMode.METER,
                                 meter_buf=100,
                                 temporal_smoothing=TSmoothingMode.NONE),
                        AudioInfo(SR, 2))
    m = MultiEngine()
    a = m.add_stream(cfg_curve)
    b = m.add_stream(cfg_big)
    c = m.add_stream(cfg_curve)   # same config as a -> same group
    d = m.add_stream(cfg_meter)
    assert m.num_groups == 0 or True  # groups counted at build
    now = NS
    for k in range(40):
        t = (np.arange(480) + k * 480) / SR
        for sid, f in [(a, 1125.0), (b, 3000.0), (c, 6000.0)]:
            x = np.sin(2 * np.pi * f * t).astype(np.float32)
            m.feed(sid, np.stack([x, x]), now, now_ns=now)
        m.feed(d, np.full((2, 480), 0.5, np.float32), now, now_ns=now)
        now += 480 * NS // SR
        m.tick(now_ns=now)
    assert m.num_groups == 3
    for sid, f, n in [(a, 1125.0, 1024), (b, 3000.0, 2048), (c, 6000.0, 1024)]:
        db = m.read_decibels(sid)
        pk = int(np.argmax(db[0])) * SR / n
        assert abs(pk - f) < 2 * SR / n, (sid, pk)
    np.testing.assert_allclose(m.read_decibels(d)[0],
                               20 * np.log10(0.5), atol=0.2)
    # live add: a stream joins a running scene (see
    # test_multi_engine_live_add_remove for the full behavior)
    e = m.add_stream(cfg_curve)
    assert m.config_of(e) is cfg_curve


def test_multi_engine_16_groups():
    """A 16-source scene, every source a distinct config (the reference
    compiles nothing but runs one full tick per source instance,
    src/source.cpp:87-102).  All groups tick together; each stream still
    resolves its own tone."""
    from waveform_tpu import FilterMode
    from waveform_tpu.runtime.multi import MultiEngine
    m = MultiEngine()
    sids = []
    freqs = []
    for g in range(16):
        n = (128, 256, 512, 1024)[g % 4]
        cfg = resolve(Settings(
            fft_size=n,
            window=(FFTWindow.HANN, FFTWindow.BLACKMAN)[g % 2],
            filter_mode=(FilterMode.NONE, FilterMode.GAUSS)[(g // 8) % 2],
            cutoff_high=17000 - 100 * g,   # every group a distinct config
            temporal_smoothing=TSmoothingMode.NONE), AudioInfo(SR, 2))
        f = SR / n * (4 + 2 * g)        # bin-exact per group
        sids.append(m.add_stream(cfg))
        freqs.append((f, n))
    now = NS
    for k in range(20):
        t = (np.arange(480) + k * 480) / SR
        for sid, (f, n) in zip(sids, freqs):
            x = np.sin(2 * np.pi * f * t).astype(np.float32)
            m.feed(sid, np.stack([x, x]), now, now_ns=now)
        now += 480 * NS // SR
        m.tick(now_ns=now)
    assert m.num_groups == 16
    for sid, (f, n) in zip(sids, freqs):
        db = m.read_decibels(sid)
        pk = int(np.argmax(db[0])) * SR / n
        assert abs(pk - f) < 2 * SR / n, (sid, f, pk)
        assert np.isfinite(db).all()


def test_stateful_trajectory_equivalence(rng):
    """100-tick EMA-on trajectory: host engine, serving engine, and the
    float64 oracle all agree (the state chain, not just one frame)."""
    from waveform_tpu.dsp import oracle
    cfg = resolve(Settings(fft_size=512, gravity=0.65, fast_peaks=True,
                           window=FFTWindow.HANN), AudioInfo(SR, 2))
    from waveform_tpu.runtime.engine import WaveformEngine
    host = WaveformEngine(cfg, 1, jit=False)
    srv = ServingEngine(cfg, 1)
    ts = np.zeros((2, 256))
    want = None
    now = NS
    ph = 0
    for k in range(100):
        t = (np.arange(480) + ph) / SR
        amp = 0.5 + 0.4 * np.sin(2 * np.pi * k / 25)  # time-varying level
        x = (amp * np.sin(2 * np.pi * 2250 * t)).astype(np.float32)
        pkt = np.stack([x, 0.7 * x])
        host.feed(0, pkt, now, now_ns=now)
        srv.feed(0, pkt, now, now_ns=now)
        ph += 480
        now += 480 * NS // SR
        db_host = host.tick(now_ns=now)
        srv.tick(now_ns=now)
        # oracle on the same window the engines see (trailing 512 samples)
        if k >= 2:
            lo = ph - 512
            tt = np.arange(lo, ph) / SR
            aa = 0.5 + 0.4 * np.sin(2 * np.pi * (np.floor(
                np.arange(lo, ph) / 480)) / 25)
            win = aa * np.sin(2 * np.pi * 2250 * tt)
            frame = np.stack([win, 0.7 * win])
            want, ts = oracle.spectrum_frame(frame, ts, cfg, dt=1 / 60)
    db_srv = srv.read_decibels()
    # deep sidelobes near -115 dBFS sit at the float32 accumulation limit
    # (~2e-2 dB); compare the display-relevant range
    vis = want[0] > -100
    assert np.abs(db_host[0, 0][vis] - want[0][vis]).max() < 5e-3
    assert np.abs(db_srv[0, 0][vis] - want[0][vis]).max() < 5e-3
    np.testing.assert_allclose(db_srv[0, 0], db_host[0, 0], atol=1e-3)


def test_chunked_put_splits_and_roundtrips(rng):
    """chunked_put: <=8 MB pieces concatenate to the identical array."""
    from waveform_tpu.runtime.serving import H2D_CHUNK_BYTES, chunked_put
    big = rng.standard_normal((40, 70000)).astype(np.float32)  # ~11 MB
    assert big.nbytes > H2D_CHUNK_BYTES
    out = chunked_put(big)
    np.testing.assert_array_equal(np.asarray(out), big)
    small = rng.standard_normal((4, 4)).astype(np.float32)
    np.testing.assert_array_equal(np.asarray(chunked_put(small)), small)


def test_multi_engine_cohort_matches_solo_engines(rng):
    """Cohort fusion is a transfer-layer change only: a MultiEngine scene
    must produce bit-identical decibels to standalone ServingEngines fed
    the same audio (the groups share one upload + device-side row
    slices)."""
    from waveform_tpu.runtime.multi import MultiEngine
    cfg_a = resolve(Settings(fft_size=1024,
                             temporal_smoothing=TSmoothingMode.NONE),
                    AudioInfo(SR, 2))
    cfg_b = resolve(Settings(fft_size=2048, window=FFTWindow.BLACKMAN,
                             temporal_smoothing=TSmoothingMode.NONE),
                    AudioInfo(SR, 2))
    m = MultiEngine()
    a0, a1 = m.add_stream(cfg_a), m.add_stream(cfg_a)
    b0 = m.add_stream(cfg_b)

    ref_a = ServingEngine(cfg_a, 2)
    ref_b = ServingEngine(cfg_b, 1)

    pkts = [rng.standard_normal((3, 2, 480)).astype(np.float32) * 0.4
            for _ in range(30)]
    now = NS
    for pkt in pkts:
        for sid, eng_idx in [(a0, 0), (a1, 1), (b0, 2)]:
            m.feed(sid, pkt[eng_idx], now, now_ns=now)
        ref_a.feed(0, pkt[0], now, now_ns=now)
        ref_a.feed(1, pkt[1], now, now_ns=now)
        ref_b.feed(0, pkt[2], now, now_ns=now)
        now += 480 * NS // SR
        m.tick(now_ns=now)
        ref_a.tick(now_ns=now)
        ref_b.tick(now_ns=now)

    # both spectrum groups share a packed width -> one fused cohort
    assert len(m._cohorts) == 1
    assert len(m._cohorts[0]["engines"]) == 2
    np.testing.assert_array_equal(m.read_decibels(a0), ref_a.read_decibels()[0])
    np.testing.assert_array_equal(m.read_decibels(a1), ref_a.read_decibels()[1])
    np.testing.assert_array_equal(m.read_decibels(b0), ref_b.read_decibels()[0])


# ---------------------------------------------------------------------------
# microbatch (k-frame scan flush) live path
# ---------------------------------------------------------------------------

def _mb_cfg(**kw):
    return resolve(Settings(fft_size=1024, window=FFTWindow.HANN, **kw),
                   AudioInfo(SR, 2))


def _drive(eng, S, n_ticks, normalize=False, per_stream=False, seed=3):
    """Feed + tick n_ticks; returns the host pixels after every tick."""
    rng = np.random.default_rng(seed)
    now = NS
    outs = []
    for k in range(n_ticks):
        pkt = (0.4 * rng.standard_normal((S, 2, 480))).astype(np.float32)
        if per_stream:
            for s in range(S):
                eng.feed(s, pkt[s], now, now_ns=now)
        else:
            eng.feed_batch(pkt, now, now_ns=now)
        now += 480 * NS // SR
        eng.tick(now_ns=now)
        outs.append(None)
    return np.asarray(eng.read_pixels())


def test_microbatch_matches_single_tick():
    """microbatch=k must be frame-for-frame identical to k single ticks
    (the flush is a latency amortizer, not a semantics change)."""
    cfg = _mb_cfg()
    S, T = 4, 12
    a = ServingEngine(cfg, S, use_native=False)
    b = ServingEngine(cfg, S, use_native=False, microbatch=4)
    pa = _drive(a, S, T)
    pb = _drive(b, S, T)
    np.testing.assert_allclose(pb, pa, rtol=0, atol=1e-5)
    assert b.last_batch_pixels.shape[0] == 4


def test_microbatch_per_frame_dt_matches():
    """Each accumulated tick keeps its own dt: under time-varying EMA a
    microbatch engine fed jittery frame times must match microbatch=1
    ticks fed the same dts (the flush scan consumes a [k] dt vector, not
    the flush call's dt)."""
    cfg = _mb_cfg(temporal_smoothing=TSmoothingMode.TVEXPONENTIAL)
    S, T = 3, 8
    dts = [1 / 60, 1 / 20, 1 / 60, 1 / 30, 1 / 75, 1 / 60, 1 / 25, 1 / 50]
    a = ServingEngine(cfg, S, use_native=False)
    b = ServingEngine(cfg, S, use_native=False, microbatch=4)
    rng = np.random.default_rng(7)
    pkts = [(0.4 * rng.standard_normal((S, 2, 480))).astype(np.float32)
            for _ in range(T)]
    for eng in (a, b):
        now = NS
        for k in range(T):
            eng.feed_batch(pkts[k], now, now_ns=now)
            now += 480 * NS // SR
            eng.tick(now_ns=now, dt=dts[k])
    np.testing.assert_allclose(np.asarray(b.read_pixels()),
                               np.asarray(a.read_pixels()),
                               rtol=0, atol=1e-5)


def test_microbatch_matches_with_normalize_and_per_stream_feed():
    """Non-uniform per-stream counts select the gather-push scan variant;
    the RMS ring threads through the scan carry."""
    cfg = _mb_cfg(normalize_volume=True, temporal_smoothing=TSmoothingMode.NONE)
    S, T = 3, 8
    a = ServingEngine(cfg, S, use_native=False)
    b = ServingEngine(cfg, S, use_native=False, microbatch=2)
    pa = _drive(a, S, T, per_stream=True)
    pb = _drive(b, S, T, per_stream=True)
    np.testing.assert_allclose(pb, pa, rtol=0, atol=1e-5)


def test_microbatch_sharded_matches():
    from waveform_tpu.parallel.sharded_serving import ShardedServingEngine
    cfg = _mb_cfg()
    S, T = 8, 8
    a = ServingEngine(cfg, S, use_native=False)
    b = ShardedServingEngine(cfg, S, pixel_parallel=2, use_native=False,
                             microbatch=4)
    pa = _drive(a, S, T)
    pb = _drive(b, S, T)
    np.testing.assert_allclose(pb, pa, rtol=0, atol=1e-4)


def test_microbatch_with_native_assembler():
    """The C++ assembler writes directly into microbatch slot views (meta
    offset depends on the with_rms row layout) — must match the pure-
    Python assembly path frame for frame."""
    from waveform_tpu.native import load_library
    if load_library() is None:
        import pytest
        pytest.skip("no native toolchain")
    cfg = _mb_cfg()
    S, T = 3, 8
    a = ServingEngine(cfg, S, use_native=False, microbatch=4)
    b = ServingEngine(cfg, S, use_native=True, microbatch=4)
    pa = _drive(a, S, T, per_stream=True)
    pb = _drive(b, S, T, per_stream=True)
    np.testing.assert_allclose(pb, pa, rtol=0, atol=1e-5)


def test_render_frames_batched():
    """render_frames rasterizes every stream in one jitted dispatch and
    blanks silence-latched streams under hide_on_silent (the reference's
    per-source render() early return, src/source.cpp:1349-1350)."""
    cfg = resolve(Settings(fft_size=1024, width=64, height=48,
                           hide_on_silent=True), AudioInfo(SR, 2))
    eng = ServingEngine(cfg, 2, use_native=False)
    now = NS
    phase = 0
    for _ in range(30):
        t = (np.arange(800) + phase) / SR
        x = np.sin(2 * np.pi * 2000.0 * t).astype(np.float32)
        eng.feed(0, np.stack([x, x]), now, now_ns=now)  # stream 1: silent
        phase += 800
        now += 800 * NS // SR
        eng.tick(now_ns=now)
    imgs = np.asarray(eng.render_frames())
    assert imgs.shape == (2, 48, 64, 4)
    assert np.isfinite(imgs).all()
    assert imgs[0].max() > 0.5              # fed stream renders content
    assert imgs[1].max() == 0.0             # latched stream fully blank


def test_multi_engine_render_frames():
    """Whole-scene rasterization: one vmapped dispatch per group, frame
    shapes following each stream's own config (the OBS scene composite,
    one render() per source, src/source.cpp:1346-1358)."""
    from waveform_tpu import DisplayMode
    from waveform_tpu.runtime.multi import MultiEngine
    cfg_curve = resolve(Settings(fft_size=1024, width=80, height=60),
                        AudioInfo(SR, 2))
    cfg_meter = resolve(Settings(display_mode=DisplayMode.METER,
                                 meter_buf=100, width=40, height=90,
                                 bar_width=16, bar_gap=4),
                        AudioInfo(SR, 2))
    m = MultiEngine()
    a = m.add_stream(cfg_curve)
    b = m.add_stream(cfg_meter)
    c = m.add_stream(cfg_curve)
    now = NS
    for k in range(40):
        t = (np.arange(480) + k * 480) / SR
        x = np.sin(2 * np.pi * 2000.0 * t).astype(np.float32)
        m.feed(a, np.stack([x, x]), now, now_ns=now)
        m.feed(c, np.stack([x, x]), now, now_ns=now)
        m.feed(b, np.full((2, 480), 0.5, np.float32), now, now_ns=now)
        now += 480 * NS // SR
        m.tick(now_ns=now)
    frames = m.render_frames()
    assert set(frames) == {a, b, c}
    assert frames[a].shape == (60, 80, 4)
    assert frames[b].shape == (90, 40, 4)
    assert frames[c].shape == (60, 80, 4)
    for sid in (a, b, c):
        assert np.isfinite(frames[sid]).all()
        assert frames[sid][..., 3].max() > 0.5   # every look renders content


def test_multi_engine_live_add_remove():
    """Streams join and leave a RUNNING scene: the group's engine resizes
    with every surviving row's state carried over (OBS adds/removes
    sources at any time; the reference rebuilds the affected source
    wholesale on update(), src/source.cpp:1077-1322, and never touches
    the others)."""
    from waveform_tpu.runtime.multi import MultiEngine
    cfg_a = resolve(Settings(fft_size=1024,
                             temporal_smoothing=TSmoothingMode.NONE),
                    AudioInfo(SR, 2))
    cfg_b = resolve(Settings(fft_size=512, window=FFTWindow.BLACKMAN,
                             temporal_smoothing=TSmoothingMode.NONE),
                    AudioInfo(SR, 2))

    def drive(m, sids_freqs, now, ticks, ph0=0):
        for k in range(ticks):
            t = (np.arange(480) + ph0 + k * 480) / SR
            for sid, f in sids_freqs:
                x = np.sin(2 * np.pi * f * t).astype(np.float32)
                m.feed(sid, np.stack([x, x]), now, now_ns=now)
            now += 480 * NS // SR
            m.tick(now_ns=now)
        return now

    m = MultiEngine()
    a = m.add_stream(cfg_a)
    b = m.add_stream(cfg_b)
    now = drive(m, [(a, 1125.0), (b, 3000.0)], NS, 30)

    pre_a = m.read_decibels(a).copy()

    # live add into the EXISTING cfg_a group: a's carried state is intact
    c = m.add_stream(cfg_a)
    np.testing.assert_array_equal(m.read_decibels(a), pre_a)
    # live add of a brand-NEW config group
    d = m.add_stream(cfg_b)
    now = drive(m, [(a, 1125.0), (b, 3000.0), (c, 6000.0), (d, 1500.0)],
                now, 30, ph0=30 * 480)

    for sid, f, n in [(a, 1125.0, 1024), (b, 3000.0, 512),
                      (c, 6000.0, 1024), (d, 1500.0, 512)]:
        pk = int(np.argmax(m.read_decibels(sid)[0])) * SR / n
        assert abs(pk - f) < 2 * SR / n, (sid, pk, f)

    # live remove of the FIRST stream in a group: survivors keep state and
    # keep resolving their own tones (index remap exercised)
    m.remove_stream(a)
    pre_c = m.read_decibels(c).copy()
    now = drive(m, [(b, 3000.0), (c, 6000.0), (d, 1500.0)], now, 20,
                ph0=60 * 480)
    for sid, f, n in [(b, 3000.0, 512), (c, 6000.0, 1024), (d, 1500.0, 512)]:
        pk = int(np.argmax(m.read_decibels(sid)[0])) * SR / n
        assert abs(pk - f) < 2 * SR / n, (sid, pk, f)
    assert np.isfinite(pre_c).all()

    # removing the last member of a group drops the group entirely
    m.remove_stream(c)
    assert m.num_groups == 1   # only cfg_b remains (b and d)
    now = drive(m, [(b, 3000.0), (d, 1500.0)], now, 5, ph0=80 * 480)
    frames = m.render_frames()
    assert set(frames) == {b, d}


def test_multi_engine_update_stream():
    """update_stream re-configures a live stream (the OBS update()
    analog): the stream moves to its new config's group with fresh state
    — the reference's update() likewise drops all analysis state on any
    settings change (src/source.cpp:1077-1322) — while every OTHER
    stream's state carries across."""
    from waveform_tpu.runtime.multi import MultiEngine
    cfg1 = resolve(Settings(fft_size=1024,
                            temporal_smoothing=TSmoothingMode.NONE),
                   AudioInfo(SR, 2))
    cfg2 = resolve(Settings(fft_size=512, window=FFTWindow.BLACKMAN,
                            temporal_smoothing=TSmoothingMode.NONE),
                   AudioInfo(SR, 2))
    m = MultiEngine()
    a, b = m.add_stream(cfg1), m.add_stream(cfg1)
    now, ph = NS, 0
    for k in range(25):
        t = (np.arange(480) + ph) / SR
        ph += 480
        for sid, f in [(a, 1125.0), (b, 2250.0)]:
            x = np.sin(2 * np.pi * f * t).astype(np.float32)
            m.feed(sid, np.stack([x, x]), now, now_ns=now)
        now += 480 * NS // SR
        m.tick(now_ns=now)
    pre_a = m.read_decibels(a).copy()

    m.update_stream(b, cfg2)             # live re-config: 1024 -> 512
    assert m.config_of(b) is cfg2
    np.testing.assert_array_equal(m.read_decibels(a), pre_a)  # a untouched
    for k in range(25):
        t = (np.arange(480) + ph) / SR
        ph += 480
        for sid, f in [(a, 1125.0), (b, 3000.0)]:
            x = np.sin(2 * np.pi * f * t).astype(np.float32)
            m.feed(sid, np.stack([x, x]), now, now_ns=now)
        now += 480 * NS // SR
        m.tick(now_ns=now)
    assert abs(int(np.argmax(m.read_decibels(a)[0])) * SR / 1024
               - 1125.0) < 2 * SR / 1024
    assert abs(int(np.argmax(m.read_decibels(b)[0])) * SR / 512
               - 3000.0) < 2 * SR / 512
    # no-op update keeps everything
    m.update_stream(a, cfg1)
    assert m.config_of(a) is cfg1


def test_resized_validates_keep_and_sharded_resizes():
    import pytest
    cfg = resolve(Settings(fft_size=512), AudioInfo(SR, 2))
    eng = ServingEngine(cfg, 4, use_native=False)
    with pytest.raises(ValueError, match="out of range"):
        eng.resized(4, keep=[0, 9])   # silent gather-clamp would migrate
    with pytest.raises(ValueError, match="out of range"):
        WaveformEngine(cfg, 4).resized(4, keep=[-1])
    # the sharded engine live-resizes since r4 (gather → rebuild →
    # scatter; depth coverage in test_parallel.py::test_sharded_resized_*)
    from waveform_tpu.parallel.sharded_serving import ShardedServingEngine
    sh = ShardedServingEngine(cfg, 6, pixel_parallel=1, use_native=False)
    sh2 = sh.resized(10)
    assert sh2.user_streams == 10


def test_resized_native_sync_survives():
    """resized() migrates the native assembler's per-stream sync
    timestamps, so surviving streams stay ACTIVE across the swap instead
    of reading capture_ts=0 and decaying as timed-out for a tick."""
    from waveform_tpu.native import load_library
    if load_library() is None:
        import pytest
        pytest.skip("native unavailable")
    from waveform_tpu import DB_MIN
    cfg = resolve(Settings(fft_size=1024,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(SR, 2))
    eng = ServingEngine(cfg, 2, use_native=True)
    now, ph = NS, 0
    for k in range(20):
        t = (np.arange(800) + ph) / SR
        ph += 800
        x = np.sin(2 * np.pi * 1125.0 * t).astype(np.float32)
        for s in range(2):
            eng.feed(s, np.stack([x, x]), now, now_ns=now)
        now += 800 * NS // SR
        eng.tick(now_ns=now)
    assert eng.read_decibels().max() > -2
    eng2 = eng.resized(3)
    # tick WITHOUT feeding, inside the 500 ms capture window: surviving
    # streams must not decay toward DB_MIN (their capture_ts migrated)
    eng2.tick(now_ns=now + 10_000_000)
    db = eng2.read_decibels()
    assert db[0].max() > -2 and db[1].max() > -2
    assert (db[2] == DB_MIN).all()   # the brand-new stream starts silent


def test_multi_engine_live_add_meter_and_waveform_groups():
    """Live adds/removes on meter and waveform groups: their host sources
    and scroll/meter state carry across the resize (the spectrum path is
    covered by test_multi_engine_live_add_remove)."""
    from waveform_tpu import DisplayMode
    from waveform_tpu.runtime.multi import MultiEngine
    met = resolve(Settings(display_mode=DisplayMode.METER, meter_buf=150,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(SR, 2))
    wf = resolve(Settings(display_mode=DisplayMode.WAVEFORM, width=256,
                          meter_buf=100), AudioInfo(SR, 2))
    m = MultiEngine()
    a, b = m.add_stream(met), m.add_stream(wf)
    now, ph = NS, 0

    def drive(sids_amp, now, ticks, ph):
        for k in range(ticks):
            t = (np.arange(800) + ph) / SR
            ph += 800
            for sid, amp in sids_amp:
                x = (amp * np.sin(2 * np.pi * 2250.0 * t)).astype(np.float32)
                m.feed(sid, np.stack([x, x]), now, now_ns=now)
            now += 800 * NS // SR
            m.tick(now_ns=now)
        return now, ph

    now, ph = drive([(a, 0.5), (b, 0.5)], now, 30, ph)
    pre_meter = m.read_decibels(a).copy()
    np.testing.assert_allclose(pre_meter[0],
                               20 * np.log10(0.5 / np.sqrt(2)), atol=0.1)

    c = m.add_stream(met)     # live add into the meter group
    d = m.add_stream(wf)      # live add into the waveform group
    # carried state: the surviving meter level is intact post-resize
    np.testing.assert_allclose(m.read_decibels(a), pre_meter, atol=1e-5)
    now, ph = drive([(a, 0.5), (b, 0.5), (c, 0.25), (d, 0.25)], now, 30, ph)
    np.testing.assert_allclose(m.read_decibels(c)[0],
                               20 * np.log10(0.25 / np.sqrt(2)), atol=0.1)
    wf_disp = m.read_decibels(d)
    assert np.isfinite(wf_disp).all() and wf_disp.max() <= 0.0

    m.remove_stream(a)        # meter group shrinks to one
    now, ph = drive([(b, 0.5), (c, 0.25), (d, 0.25)], now, 10, ph)
    np.testing.assert_allclose(m.read_decibels(c)[0],
                               20 * np.log10(0.25 / np.sqrt(2)), atol=0.1)


def test_set_show_hides_and_recovers():
    """show()/hide() (source.hpp:314-346): a hidden stream's graph decays
    to the floor exactly like a capture timeout even while audio keeps
    arriving, and recovers on show — on both the native and Python
    assembly paths."""
    from waveform_tpu import DB_MIN
    from waveform_tpu.native import load_library
    cfg = resolve(Settings(fft_size=1024,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(SR, 2))
    for use_native in (False, True):
        if use_native and load_library() is None:
            continue
        eng = ServingEngine(cfg, 2, use_native=use_native)
        now, ph = NS, 0

        def drive(ticks):
            nonlocal now, ph
            for k in range(ticks):
                t = (np.arange(800) + ph) / SR
                ph += 800
                x = np.sin(2 * np.pi * 1125.0 * t).astype(np.float32)
                for s in range(2):
                    eng.feed(s, np.stack([x, x]), now, now_ns=now)
                now += 800 * NS // SR
                eng.tick(now_ns=now)

        drive(15)
        assert eng.read_decibels()[1].max() > -2
        eng.set_show(1, False)
        drive(15)
        db = eng.read_decibels()
        assert db[0].max() > -2, use_native        # stream 0 unaffected
        assert (db[1] == DB_MIN).all(), use_native  # hidden: full decay
        eng.set_show(1, True)
        drive(15)
        assert eng.read_decibels()[1].max() > -2, use_native
