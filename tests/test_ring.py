"""SampleRing semantics: push/pop/peek/zero-fill/growth, incl. wraparound."""

import numpy as np

from waveform_tpu.core.ring import (
    SampleRing,
    audio_frames_to_ns,
    ns_to_audio_frames,
)


def test_basic_push_peek_pop():
    r = SampleRing(16)
    r.push_back(np.arange(10, dtype=np.float32))
    assert r.size == 10
    got = r.peek_front(4)
    np.testing.assert_array_equal(got, [0, 1, 2, 3])
    assert r.size == 10  # peek does not consume
    out = np.empty(3, np.float32)
    assert r.pop_front(3, out=out) == 3
    np.testing.assert_array_equal(out, [0, 1, 2])
    assert r.size == 7
    np.testing.assert_array_equal(r.peek_front(3), [3, 4, 5])


def test_wraparound_and_growth(rng):
    r = SampleRing(16)
    fed = []
    ref = []
    for i in range(200):
        chunk = rng.standard_normal(rng.integers(1, 300)).astype(np.float32)
        r.push_back(chunk)
        ref.extend(chunk.tolist())
        ndrop = int(rng.integers(0, len(ref) + 1))
        r.pop_front(ndrop)
        del ref[:ndrop]
        assert r.size == len(ref)
        if ref:
            got = r.peek_front(min(17, len(ref)))
            np.testing.assert_array_equal(got, np.float32(ref[:len(got)]))


def test_push_back_zero():
    r = SampleRing(8)
    r.push_back(np.ones(5, np.float32))
    r.push_back_zero(7)
    assert r.size == 12
    got = r.peek_front(12)
    np.testing.assert_array_equal(got, [1] * 5 + [0] * 7)


def test_pop_more_than_available():
    r = SampleRing()
    r.push_back(np.ones(4, np.float32))
    assert r.pop_front(100) == 4
    assert r.size == 0


def test_time_conversions():
    assert ns_to_audio_frames(48000, 1_000_000_000) == 48000
    assert audio_frames_to_ns(48000, 48000) == 1_000_000_000
    assert ns_to_audio_frames(44100, 10_000_000) == 441
    # floor behavior
    assert ns_to_audio_frames(48000, 999) == 0
