"""Native C++ assembler: equivalence with the Python runtime + thread stress.

The reference has no race detector (SURVEY.md §5); here the cross-impl
equivalence check and a threaded feed/assemble stress test stand in.
"""

import threading

import numpy as np
import pytest

from waveform_tpu import AudioInfo, Settings, resolve
from waveform_tpu.native import NativeAssembler, load_library
from waveform_tpu.runtime.source import StreamSource

NS, SR = 1_000_000_000, 48000

pytestmark = pytest.mark.skipif(load_library() is None,
                                reason="native toolchain unavailable")


def test_build_and_basic_assemble():
    a = NativeAssembler(2, 2, 1024, SR)
    # prefill gives a full valid window of silence
    frames, valid, active = a.assemble(NS)
    assert frames.shape == (2, 2, 1024)
    assert valid.all()
    assert not active.any()  # nothing captured yet -> timed out
    assert (frames == 0).all()


def test_native_matches_python_runtime(rng):
    """Same packets, same timestamps → identical assembled windows."""
    cfg = resolve(Settings(fft_size=1024), AudioInfo(SR, 2))
    py = StreamSource(cfg)
    nat = NativeAssembler(1, 2, 1024, SR)
    now = NS
    for k in range(50):
        n = int(rng.integers(50, 900))
        x = rng.standard_normal((2, n)).astype(np.float32)
        ts = now + int(rng.integers(-2_000_000, 2_000_000))
        py.capture_audio(x, ts, now_ns=now)
        nat.feed(0, x, ts, now_ns=now)
        now += n * NS // SR
        if k % 7 == 3:
            tick = py.prepare_spectrum_tick(now, 1 / 60)
            frames, valid, active = nat.assemble(now)
            assert (valid[0] == tick.valid).all()
            assert active[0] == tick.active
            if tick.valid.all():
                np.testing.assert_array_equal(frames[0], tick.frame)


def test_native_mute_and_bogus_timestamps(rng):
    nat = NativeAssembler(1, 2, 512, SR)
    now = NS
    x = np.ones((2, 480), np.float32)
    nat.feed(0, x, now, now_ns=now, muted=True)
    frames, valid, _ = nat.assemble(now)
    assert (frames[0, :, -480:] == 0).all()  # mute zero-fills
    # bogus timestamp far in the future clamps to wall clock (no crash,
    # ring not over-trimmed)
    nat.feed(0, x, now + 100 * NS, now_ns=now)
    assert nat.ring_size(0) > 0


def test_native_detach_resets():
    nat = NativeAssembler(1, 2, 512, SR)
    nat.feed(0, np.ones((2, 480), np.float32), NS, now_ns=NS)
    assert nat.ring_size(0) > 0
    nat.detach(0)
    assert nat.ring_size(0) == 0
    _, _, active = nat.assemble(NS)
    assert not active[0]


def test_native_hop_assembly(rng):
    """Serving mode: consumes past the reserve, capped at the hop budget."""
    nat = NativeAssembler(2, 2, 4096, SR, prefill=False)
    now = NS
    x = rng.standard_normal((2, 2, 1600)).astype(np.float32)
    nat.feed(0, x[0], now, now_ns=now)
    nat.feed(1, x[1], now, now_ns=now)
    # assemble after the audio's wall-clock span has elapsed (otherwise the
    # whole packet is still A/V-sync reserve, as the reference would hold it)
    now += 1600 * NS // SR
    new, counts, active = nat.assemble_hop(now, hop_budget=800)
    assert (counts == 800).all()
    np.testing.assert_array_equal(new[0], x[0, :, :800])
    # second call drains the rest
    new, counts, _ = nat.assemble_hop(now, hop_budget=800)

    assert (counts == 800).all()
    np.testing.assert_array_equal(new[1], x[1, :, 800:])
    # third: nothing left
    _, counts, _ = nat.assemble_hop(now, hop_budget=800)
    assert (counts == 0).all()


def test_threaded_stress(rng):
    """Concurrent feeders + assembler: no crashes, windows stay coherent
    (every assembled window is a contiguous slice of the fed ramp)."""
    S, C, W = 4, 2, 1024
    nat = NativeAssembler(S, C, W, SR)
    stop = threading.Event()
    errs = []

    def feeder(stream):
        now = NS
        pos = 0
        while not stop.is_set():
            n = 480
            # strictly increasing ramp so windows are verifiable
            x = np.tile(np.arange(pos, pos + n, dtype=np.float32), (C, 1))
            nat.feed(stream, x, now, now_ns=now)
            pos += n
            now += n * NS // SR

    threads = [threading.Thread(target=feeder, args=(i,)) for i in range(S)]
    for t in threads:
        t.start()
    try:
        for _ in range(200):
            frames, valid, _ = nat.assemble(10 * NS)
            for s in range(S):
                if not valid[s].all():
                    continue
                w = frames[s, 0]
                nz = w[w > 0]
                if len(nz) > 1:
                    d = np.diff(nz)
                    if not (d == 1.0).all():
                        errs.append(f"stream {s}: non-contiguous window")
    finally:
        stop.set()
        for t in threads:
            t.join()
    assert not errs, errs[:3]


def test_native_packed_assembly_layout(rng):
    """wf_assemble_hop_packed writes the single-upload row layout
    (serving.py _in_buf): samples, raw RMS squares, counts, active —
    identical content to the separate assemble_hop_rms outputs."""
    S, C, H = 3, 2, 800
    a = NativeAssembler(S, C, 4096, SR, prefill=False, rms=True)
    b = NativeAssembler(S, C, 4096, SR, prefill=False, rms=True)
    now = NS
    x = (0.5 * rng.standard_normal((S, C, 1200))).astype(np.float32)
    for s in range(S):
        a.feed(s, x[s], now, now_ns=now)
        b.feed(s, x[s], now, now_ns=now)
    now += 1200 * NS // SR

    flat = np.full((S, C * H + H + 3), 7.7, np.float32)  # poison
    a.assemble_hop_packed(now, H, flat, with_rms=True)
    new, rms_sq, counts, active = b.assemble_hop_rms(now, H)

    np.testing.assert_array_equal(
        flat[:, :C * H].reshape(S, C, H), new)
    np.testing.assert_array_equal(flat[:, C * H:C * H + H], rms_sq)
    np.testing.assert_array_equal(flat[:, -3].astype(np.int32), counts)
    np.testing.assert_array_equal(flat[:, -2] > 0.5, active)
    # the input_rms column is host-owned: untouched by C++
    assert (flat[:, -1] == 7.7).all()


def test_native_packed_without_rms(rng):
    """with_rms=False rows carry NO RMS block at all — meta lands right
    after the samples (the upload is a third narrower at C=2; see
    ServingEngine.packed_width)."""
    S, C, H = 2, 2, 400
    a = NativeAssembler(S, C, 2048, SR, prefill=False)
    now = NS
    x = rng.standard_normal((S, C, 500)).astype(np.float32)
    for s in range(S):
        a.feed(s, x[s], now, now_ns=now)
    now += 500 * NS // SR
    flat = np.full((S, C * H + 3), -9.0, np.float32)
    a.assemble_hop_packed(now, H, flat, with_rms=False)
    assert (flat[:, -3] == 400).all()
    assert (flat[:, -2] == 1.0).all()
    assert (flat[:, -1] == -9.0).all()   # input_rms column host-owned
    np.testing.assert_array_equal(
        flat[:, :C * H].reshape(S, C, H), x[:, :, :400])
