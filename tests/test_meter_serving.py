"""Device-resident meter serving: parity vs the host engine and reference
semantics (timeout/hide gates, src/source_generic.cpp:182-269)."""

import numpy as np
import pytest

from waveform_tpu import (
    AudioInfo,
    DB_MIN,
    DisplayMode,
    Settings,
    TSmoothingMode,
    resolve,
)
from waveform_tpu.runtime.engine import WaveformEngine
from waveform_tpu.runtime.meter_serving import MeterServingEngine
from waveform_tpu.runtime.serving import ServingEngine

NS, SR = 1_000_000_000, 48000


def meter_cfg(**kw):
    kw.setdefault("display_mode", DisplayMode.METER)
    kw.setdefault("meter_buf", 100)
    return resolve(Settings(**kw), AudioInfo(SR, 2))


def _session(engine_cls, cfg, n_ticks=20, freq=2000.0, amp=0.5,
             dt=0.02, **kw):
    """Feed identical audio at identical timestamps; tick every 20 ms."""
    eng = engine_cls(cfg, 2, **kw)
    now = NS
    phase = 0
    out = None
    for _ in range(n_ticks):
        for _ in range(2):  # 2 x 10 ms packets per tick
            t = (np.arange(480) + phase) / SR
            x = (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)
            for s in range(2):
                eng.feed(s, np.stack([x, 0.5 * x]), now, now_ns=now)
            phase += 480
            now += 480 * NS // SR
        if isinstance(eng, ServingEngine):
            out = eng.tick(now_ns=now, dt=dt)
        else:
            out = eng.tick(now_ns=now)
    return eng, out, now


@pytest.mark.parametrize("rms", [True, False], ids=["rms", "peak"])
@pytest.mark.parametrize("native", [False, True], ids=["py", "native"])
def test_meter_serving_matches_host_engine(rms, native):
    """Same audio, same clock → same levels as WaveformEngine._tick_meter
    (EMA on: the gravity trail must match tick for tick)."""
    cfg = meter_cfg(rms_mode=rms)
    host, host_val, _ = _session(WaveformEngine, cfg, jit=False)
    srv, _, _ = _session(MeterServingEngine, cfg, use_native=native)
    srv_val = np.asarray(srv.meter_values)
    np.testing.assert_allclose(srv_val, np.asarray(host_val)[:, 0],
                               atol=1e-3)
    # channel 1 was fed at half amplitude: levels must differ per channel
    assert srv_val[0, 0] > srv_val[0, 1] + 5.0


def test_meter_serving_golden_levels():
    """0.5 square wave → −6.02 dBFS RMS; 0.25 sine → −12.04 dBFS peak
    (the host-engine golden values, test_runtime.py)."""
    cfg = meter_cfg(rms_mode=True, temporal_smoothing=TSmoothingMode.NONE)
    eng = MeterServingEngine(cfg, 1)
    now = NS
    for k in range(30):
        eng.feed(0, np.full((2, 480), 0.5, np.float32), now, now_ns=now)
        now += 480 * NS // SR
        eng.tick(now_ns=now)
    val = np.asarray(eng.meter_values)
    np.testing.assert_allclose(val[0], 20 * np.log10(0.5), atol=0.1)

    cfg2 = meter_cfg(rms_mode=False, temporal_smoothing=TSmoothingMode.NONE)
    eng2 = MeterServingEngine(cfg2, 1)
    now = NS
    for k in range(30):
        t = (np.arange(480) + k * 480) / SR
        x = (0.25 * np.sin(2 * np.pi * 1000 * t)).astype(np.float32)
        eng2.feed(0, np.stack([x, x]), now, now_ns=now)
        now += 480 * NS // SR
        eng2.tick(now_ns=now)
    val2 = np.asarray(eng2.meter_values)
    np.testing.assert_allclose(val2[0], 20 * np.log10(0.25), atol=0.1)


def test_meter_serving_timeout_latch_and_freeze():
    """Reference timeout path (src/source_generic.cpp:184-199): first
    timed-out tick zeroes the device ring + levels and latches; further
    ticks freeze (early return)."""
    cfg = meter_cfg(temporal_smoothing=TSmoothingMode.NONE)
    eng, _, now = _session(MeterServingEngine, cfg, n_ticks=10)
    assert np.asarray(eng.meter_values).max() > -10
    # > 500 ms without audio → timeout
    eng.tick(now_ns=now + 600_000_000)
    val = np.asarray(eng.meter_values)
    assert (val == DB_MIN).all()
    assert np.asarray(eng.state.last_silent).all()
    assert (np.asarray(eng.ring.buf) == 0).all()
    # frozen on subsequent ticks
    eng.tick(now_ns=now + 700_000_000)
    assert (np.asarray(eng.meter_values) == DB_MIN).all()


def test_meter_serving_hide_keeps_ring():
    """Hide gates the LEVELS but not the ring drain (the reference checks
    m_show after the drain, src/source_generic.cpp:225-232); un-hiding
    with a live window must restore the level in one tick."""
    cfg = meter_cfg(temporal_smoothing=TSmoothingMode.NONE)
    eng, _, now = _session(MeterServingEngine, cfg, n_ticks=10)
    live = np.asarray(eng.meter_values).copy()
    eng.set_show(0, False)

    # keep feeding while hidden
    phase = 0
    for _ in range(4):
        t = (np.arange(960) + phase) / SR
        x = (0.5 * np.sin(2 * np.pi * 2000 * t)).astype(np.float32)
        for s in range(2):
            eng.feed(s, np.stack([x, 0.5 * x]), now, now_ns=now)
        phase += 960
        now += 960 * NS // SR
        eng.tick(now_ns=now)
    val = np.asarray(eng.meter_values)
    assert (val[0] == DB_MIN).all()          # hidden stream gated
    np.testing.assert_allclose(val[1], live[1], atol=0.5)  # other live
    assert not (np.asarray(eng.ring.buf[0]) == 0).all()    # ring kept

    eng.set_show(0, True)
    for s in range(2):
        eng.feed(s, np.full((2, 480), 0.5, np.float32), now, now_ns=now)
    now += 480 * NS // SR
    eng.tick(now_ns=now)
    assert np.asarray(eng.meter_values)[0].max() > -10


def test_meter_serving_microbatch_matches_single():
    """microbatch=k flushes k frames as one scan; levels at flush ticks
    must equal the k-single-tick engine exactly."""
    cfg = meter_cfg()
    e1, _, _ = _session(MeterServingEngine, cfg, n_ticks=20)
    e4, _, _ = _session(MeterServingEngine, cfg, n_ticks=20, microbatch=4)
    np.testing.assert_allclose(np.asarray(e4.meter_values),
                               np.asarray(e1.meter_values), atol=1e-5)


def test_meter_serving_resized_carries_state():
    cfg = meter_cfg()
    eng, _, now = _session(MeterServingEngine, cfg, n_ticks=10)
    before = np.asarray(eng.meter_values)
    eng2 = eng.resized(3, keep=[1, 0])
    assert isinstance(eng2, MeterServingEngine)
    after = np.asarray(eng2.meter_values)
    np.testing.assert_allclose(after[0], before[1], atol=1e-6)
    np.testing.assert_allclose(after[1], before[0], atol=1e-6)
    assert (after[2] == DB_MIN).all()        # fresh row
    # surviving rows stay live across the swap (sync migrated)
    for s in range(2):
        eng2.feed(s, np.full((2, 480), 0.5, np.float32), now, now_ns=now)
    now += 480 * NS // SR
    eng2.tick(now_ns=now)
    assert np.asarray(eng2.meter_values)[0].max() > -10


def test_meter_serving_tick_many_bulk():
    """Bulk scan: T ticks in one dispatch match T single ticks."""
    cfg = meter_cfg(temporal_smoothing=TSmoothingMode.NONE)
    rng = np.random.default_rng(7)
    T, S, hop = 6, 2, 800
    audio = (0.3 * rng.standard_normal((T, S, 2, hop))).astype(np.float32)

    bulk = MeterServingEngine(cfg, S)
    bulk.tick_many(audio, dt=0.02)
    bulk_val = np.asarray(bulk.meter_values)

    single = MeterServingEngine(cfg, S, hop_budget=hop)
    now = NS
    for k in range(T):
        for s in range(S):
            single.feed(s, audio[k, s], now, now_ns=now)
        now += hop * NS // SR
        single.tick(now_ns=now, dt=0.02)
    np.testing.assert_allclose(np.asarray(single.meter_values), bulk_val,
                               atol=1e-4)


def test_meter_serving_save_load_roundtrip(tmp_path):
    cfg = meter_cfg()
    eng, _, _ = _session(MeterServingEngine, cfg, n_ticks=8)
    p = str(tmp_path / "meter.npz")
    eng.save_state(p)
    eng2 = MeterServingEngine(cfg, 2)
    eng2.load_state(p)
    np.testing.assert_allclose(np.asarray(eng2.meter_values),
                               np.asarray(eng.meter_values), atol=0)


def test_multi_engine_routes_meter_to_serving():
    """MultiEngine scenes put meter groups on the device-resident engine
    and tick them alongside spectrum groups."""
    from waveform_tpu.runtime.multi import MultiEngine
    scene = MultiEngine()
    mcfg = meter_cfg()
    scfg = resolve(Settings(fft_size=1024), AudioInfo(SR, 2))
    m0 = scene.add_stream(mcfg)
    s0 = scene.add_stream(scfg)
    now = NS
    for k in range(10):
        x = np.full((2, 960), 0.5, np.float32)
        scene.feed(m0, x, now, now_ns=now)
        scene.feed(s0, x, now, now_ns=now)
        now += 960 * NS // SR
        scene.tick(now_ns=now)
    assert isinstance(scene._engines[mcfg], MeterServingEngine)
    v = scene.read_decibels(m0)
    assert v.shape == (1, 2) and v.max() > -10
    assert scene.read_decibels(s0).shape[-1] == scfg.fft_size // 2


def test_meter_and_spectrum_share_one_cohort():
    """A meter group and a spectrum group with equal packed row widths
    fuse into ONE upload cohort (each engine parses its own rows with its
    own meta layout), and both produce correct values through the fused
    path."""
    from waveform_tpu.runtime.multi import MultiEngine

    mcfg = meter_cfg(rms_mode=True, temporal_smoothing=TSmoothingMode.NONE)
    scfg = resolve(Settings(fft_size=2048,
                            temporal_smoothing=TSmoothingMode.NONE),
                   AudioInfo(SR, 2))
    scene = MultiEngine()
    ids = [scene.add_stream(mcfg), scene.add_stream(mcfg),
           scene.add_stream(scfg), scene.add_stream(scfg)]
    now = NS
    for k in range(30):
        t = (np.arange(480) + k * 480) / SR
        tone = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
        sq = np.full(480, 0.5, np.float32)
        for s in ids[:2]:
            scene.feed(s, np.stack([sq, sq]), now, now_ns=now)
        for s in ids[2:]:
            scene.feed(s, np.stack([tone, tone]), now, now_ns=now)
        now += 480 * NS // SR
        scene.tick(now_ns=now)

    meng = scene._engines[mcfg]
    seng = scene._engines[scfg]
    assert meng.packed_width == seng.packed_width
    assert len(scene._cohorts) == 1 and len(scene._cohorts[0]["engines"]) == 2
    # meter golden: 0.5 square wave -> -6.02 dBFS RMS
    np.testing.assert_allclose(scene.read_decibels(ids[0]),
                               20 * np.log10(0.5), atol=0.1)
    # spectrum golden: tone resolves at 3 kHz near full scale
    db = scene.read_decibels(ids[2])
    pk = int(np.argmax(db[0])) * SR / scfg.fft_size
    assert abs(pk - 3000) < 2 * SR / scfg.fft_size
    assert db[0].max() > -2
