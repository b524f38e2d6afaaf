"""Auto microbatch policy: probe-driven k selection (serving.py)."""

import numpy as np

from waveform_tpu import AudioInfo, Settings, TSmoothingMode, resolve
from waveform_tpu.runtime.serving import ServingEngine

NS, SR = 1_000_000_000, 48000


def cfg_for(**kw):
    return resolve(Settings(fft_size=1024, **kw), AudioInfo(SR, 2))


def test_policy_meets_budget_at_k1():
    eng = ServingEngine(cfg_for(), 2)
    # a tick that already fits the frame budget needs no amortization
    assert eng._choose_microbatch(1 / 60, rtt=0.0001, tick=0.002) == 1


def test_policy_amortizes_to_budget():
    eng = ServingEngine(cfg_for(), 2)
    # 30 ms RTT + 5 ms work: RTT/k + 5ms <= 16.7ms needs k >= 2.56 -> 4
    assert eng._choose_microbatch(1 / 60, rtt=0.030, tick=0.035) == 4
    # 10 ms RTT + 5 ms work: k >= 0.85 -> 1... but tick 15ms < budget -> 1
    assert eng._choose_microbatch(1 / 60, rtt=0.010, tick=0.015) == 1


def test_policy_diminishing_returns_when_unreachable():
    eng = ServingEngine(cfg_for(), 2)
    # r3's relay numbers: 37 ms RTT, 58 ms non-RTT work (budget
    # unreachable): stop where a doubling shaves <10% of the work -> k=4,
    # the manual best from BENCH_r03
    assert eng._choose_microbatch(1 / 60, rtt=0.037, tick=0.095) == 4
    # extreme RTT still caps at _MB_MAX
    assert eng._choose_microbatch(1 / 60, rtt=10.0, tick=10.1) == 8


def test_auto_engine_resolves_and_matches_fixed():
    """microbatch="auto" must resolve to some k after the probe window
    and produce the same per-frame spectra as a fixed-k engine."""
    cfg = cfg_for(temporal_smoothing=TSmoothingMode.NONE)

    def run(mb):
        eng = ServingEngine(cfg, 2, microbatch=mb)
        now = NS
        phase = 0
        for _ in range(16):
            t = (np.arange(960) + phase) / SR
            x = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
            for s in range(2):
                eng.feed(s, np.stack([x, x]), now, now_ns=now)
            phase += 960
            now += 960 * NS // SR
            eng.tick(now_ns=now, dt=0.02)
        return eng

    auto = run("auto")
    assert auto.microbatch >= 1 and not auto._mb_auto  # probe resolved
    db = auto.read_decibels()
    assert np.isfinite(db).all()
    if auto.microbatch == 1:   # CPU ticks fit the budget -> k=1 expected
        fixed = run(1)
        np.testing.assert_allclose(db, fixed.read_decibels(), atol=1e-4)
