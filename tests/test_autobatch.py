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


def test_policy_completion_guard_caps_k():
    from waveform_tpu.runtime.serving import choose_microbatch
    # unreachable budget: the amortization knee alone says k=4
    # (need = rtt/(0.2*rest) = 0.1/0.044 = 2.3 -> doubles past 2), but
    # the completion guard (next doubling's 2k*rest+rtt <= 3*tick) blocks
    # 2 -> 4 whenever rest > 2*rtt: predicted completion 4*0.22+0.1 =
    # 0.98 s > 3*0.32 s.  Without the guard this returns 4.
    assert choose_microbatch(1 / 60, rtt=0.1, tick=0.32) == 2
    # lighter non-RTT share (rest < 2*rtt): the guard stays out of the
    # way and the knee's k=4 stands
    assert choose_microbatch(1 / 60, rtt=0.1, tick=0.26) == 4


def test_validate_flush_accepts_and_rejects():
    from waveform_tpu.runtime.serving import validate_flush
    budget = 1 / 60
    # flushes[0] is the compile flush and must be ignored
    ok, k = validate_flush([9.9, 0.20, 0.22], 4, probe_tick=0.08,
                           budget=budget)
    assert ok and k == 4          # 0.21/4 = 52 ms < 80 ms, cap 240 ms
    # completion blows past the cap (3x probe tick): reject, halve
    ok, k = validate_flush([0.1, 0.69, 0.70], 8, probe_tick=0.08,
                           budget=budget)
    assert not ok and k == 4
    # no amortized gain over k=1: reject even under the cap
    ok, k = validate_flush([0.1, 0.20, 0.20], 2, probe_tick=0.08,
                           budget=budget)
    assert not ok and k == 1


def test_auto_validation_steps_down_on_bad_candidate(monkeypatch):
    """Force the open-loop policy to claim k=8; the closed loop must
    re-measure and step down to whatever the real flushes support,
    locking with finite output (the r4 regression scenario)."""
    cfg = cfg_for(temporal_smoothing=TSmoothingMode.NONE)
    eng = ServingEngine(cfg, 2, microbatch="auto")
    monkeypatch.setattr(type(eng), "_choose_microbatch",
                        lambda self, budget, rtt, tick: 8)
    now = NS
    phase = 0
    for _ in range(200):
        if not eng._mb_auto:
            break
        t = (np.arange(960) + phase) / SR
        x = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
        for s in range(2):
            eng.feed(s, np.stack([x, x]), now, now_ns=now)
        phase += 960
        now += 960 * NS // SR
        eng.tick(now_ns=now, dt=0.02)
    assert not eng._mb_auto                    # resolved
    assert eng.microbatch in (1, 2, 4, 8)
    if eng.microbatch > 1:
        # accepted candidates must have recorded their measured completion
        assert eng.microbatch_completion is not None
    # engine still serves fine at the locked k
    for _ in range(2 * max(eng.microbatch, 1)):
        t = (np.arange(960) + phase) / SR
        x = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
        for s in range(2):
            eng.feed(s, np.stack([x, x]), now, now_ns=now)
        phase += 960
        now += 960 * NS // SR
        eng.tick(now_ns=now, dt=0.02)
    assert np.isfinite(eng.read_decibels()).all()
