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


def test_bus_rejects_late_subscribe_and_nonspectrum():
    from waveform_tpu import DisplayMode
    cfg = _cfg(fft_size=512)
    bus = OutputBus(cfg.audio)
    bus.subscribe(cfg)
    with pytest.raises(ValueError, match="spectrum"):
        bus.subscribe(resolve(Settings(display_mode=DisplayMode.METER),
                              AudioInfo(SR, 2)))
    bus.tick(now_ns=NS)
    with pytest.raises(RuntimeError, match="subscribe after tick"):
        bus.subscribe(cfg)


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
