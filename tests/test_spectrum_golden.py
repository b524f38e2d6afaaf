"""Golden tests: the jitted TPU pipeline vs the float64 oracle.

Tolerances: linear magnitudes compare to ~1e-6 relative (float32 rFFT);
dBFS compares to 1e-3 absolute for bins above the render floor (-120 dBFS),
the region that is ever visible.  This mirrors FFTW's accuracy harness
(deps/fftw-3.3.11/libbench2/verify-lib.c:464-477) with numpy-float64 as mp.c.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from waveform_tpu import (
    AudioInfo,
    ChannelMode,
    DB_MIN,
    FFTWindow,
    Settings,
    TSmoothingMode,
    resolve,
)
from waveform_tpu.dsp import oracle
from waveform_tpu.dsp.spectrum import (
    display_decibels,
    init_state,
    make_spectrum_step,
)


def run_frames(cfg, frames, active=None, rms=None, S=3):
    """Drive the batched step over [F, S, C, N] float32 frames."""
    step = make_spectrum_step(cfg)
    state = init_state(cfg, S)
    active = np.ones(S, bool) if active is None else active
    rms = np.zeros(S, np.float32) if rms is None else rms
    outs = []
    for f in frames:
        state = step(jnp.asarray(f, jnp.float32), state,
                     jnp.float32(1 / 60), jnp.asarray(active), jnp.asarray(rms))
        outs.append(np.asarray(display_decibels(cfg, state)))
    return outs, state


def assert_db_close(got, want, atol=2e-3, floor=-120.0):
    """Compare dB where the oracle is above the visible floor."""
    vis = want > floor
    if vis.any():
        np.testing.assert_allclose(got[vis], want[vis], atol=atol, rtol=0)
    # below-floor bins must also be below floor (within slack) in the DUT
    assert (got[~vis] < floor + 1.0).all()


CASES = [
    dict(fft_size=1024, window=FFTWindow.HANN),
    dict(fft_size=1024, window=FFTWindow.BLACKMAN_HARRIS,
         channel_mode=ChannelMode.STEREO),
    dict(fft_size=2048, window=FFTWindow.POWER_OF_SINE, sine_exponent=5,
         slope=2.0),
    dict(fft_size=512, window=FFTWindow.HAMMING, gravity=0.5, fast_peaks=True),
    dict(fft_size=512, window=FFTWindow.NONE,
         temporal_smoothing=TSmoothingMode.TVEXPONENTIAL, gravity=0.8),
    dict(fft_size=960, window=FFTWindow.BLACKMAN, rolloff_q=1.0,
         rolloff_rate=6.0),
    dict(fft_size=1024, window=FFTWindow.HANN, normalize_volume=True,
         volume_target=-8, max_gain=30),
]


@pytest.mark.parametrize("kw", CASES, ids=lambda kw: "-".join(
    f"{k}={getattr(v, 'value', v)}" for k, v in kw.items()))
def test_vs_oracle(kw, rng):
    cfg = resolve(Settings(**kw), AudioInfo(48000, 2))
    S, C, N = 3, cfg.capture_channels, cfg.fft_size
    nfr = 4
    frames = rng.standard_normal((nfr, S, C, N)).astype(np.float32) * 0.3
    rms = np.array([0.3, 0.5, 0.1], np.float32) if cfg.normalize_volume else None
    outs, _ = run_frames(cfg, frames, rms=rms)

    # oracle per stream, carrying EMA state
    for s in range(S):
        ts = np.zeros((C, N // 2))
        for f in range(nfr):
            want, ts = oracle.spectrum_frame(
                frames[f, s].astype(np.float64), ts, cfg, dt=1 / 60,
                input_rms=float(rms[s]) if rms is not None else 0.0)
            assert_db_close(outs[f][s], want)


def test_silence_latch_and_freeze(rng):
    """Silent input with output below floor-10 freezes the frame
    (src/source_generic.cpp:74-95)."""
    cfg = resolve(Settings(fft_size=512, gravity=0.0,
                           temporal_smoothing=TSmoothingMode.NONE,
                           floor=-65), AudioInfo(48000, 2))
    S, C, N = 2, 2, 512
    quiet = np.full((S, C, N), 1e-7, np.float32)  # nonzero but far below floor
    loud = rng.standard_normal((S, C, N)).astype(np.float32)
    zeros = np.zeros((S, C, N), np.float32)

    outs, state = run_frames(cfg, [quiet, zeros, zeros, loud], S=S)
    # frame 0: quiet spectrum, well below floor-10
    assert (outs[0] < cfg.floor - 10).all()
    # frame 1: silent input + out-silent output -> latch + freeze
    np.testing.assert_array_equal(outs[1], outs[0])
    assert np.asarray(state.last_silent).all() is not True  # loud frame cleared it
    # frame 2 stays frozen
    np.testing.assert_array_equal(outs[2], outs[0])
    # frame 3: loud input unlatches and produces fresh output
    assert not np.array_equal(outs[3], outs[0])
    assert (outs[3] > cfg.floor).any()


def test_silence_decay_when_visible(rng):
    """Silent input while output is above the floor keeps processing zeros:
    EMA decays toward DB_MIN instead of freezing."""
    cfg = resolve(Settings(fft_size=512, gravity=0.5, floor=-65),
                  AudioInfo(48000, 2))
    loud = rng.standard_normal((1, 2, 512)).astype(np.float32)
    zeros = np.zeros((1, 2, 512), np.float32)
    outs, _ = run_frames(cfg, [loud, zeros, zeros], S=1)
    # output after silence is lower but not frozen
    assert (outs[1] < outs[0]).all()
    assert (outs[2] < outs[1] - 1.0).all()  # keeps decaying


def test_timeout_clears(rng):
    cfg = resolve(Settings(fft_size=512), AudioInfo(48000, 2))
    loud = rng.standard_normal((2, 2, 512)).astype(np.float32)
    step = make_spectrum_step(cfg)
    state = init_state(cfg, 2)
    state = step(jnp.asarray(loud), state, jnp.float32(1 / 60),
                 jnp.array([True, True]), jnp.zeros(2, jnp.float32))
    assert (np.asarray(display_decibels(cfg, state)) > DB_MIN).any()
    # stream 0 times out -> DB_MIN + latch; stream 1 keeps going
    state = step(jnp.asarray(loud), state, jnp.float32(1 / 60),
                 jnp.array([False, True]), jnp.zeros(2, jnp.float32))
    db = np.asarray(display_decibels(cfg, state))
    assert (db[0] == DB_MIN).all()
    assert (db[1] > DB_MIN).any()
    assert bool(state.last_silent[0]) and not bool(state.last_silent[1])


def test_mono_downmix_channel1_keeps_linear(rng):
    """m_decibels[1] retains linear magnitude after mono fold
    (src/source_generic.cpp:150-153 writes only channel 0)."""
    cfg = resolve(Settings(fft_size=512, temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(48000, 2))
    x = rng.standard_normal((1, 2, 512)).astype(np.float32)
    step = make_spectrum_step(cfg)
    state = init_state(cfg, 1)
    state = step(jnp.asarray(x), state, jnp.float32(1 / 60),
                 jnp.array([True]), jnp.zeros(1, jnp.float32))
    db = np.asarray(state.decibels)
    assert db.shape[1] == 2
    # channel 0 in dB (negative-ish), channel 1 in raw linear magnitude
    assert db[0, 0].mean() < -10
    assert (db[0, 1] >= 0).all()


def test_mono_silent_channel_decays_after_active_channel():
    """Sequential-channel parity (source_generic.cpp:63-95): in mono the
    outsilent scan reads m_decibels[0] MID-tick, so once channel 0
    processes (fresh LINEAR magnitudes, always above the negative
    floor-10 gate) a silent channel 1 must also process — its EMA decays
    — never freeze on stale values, and the latch must not count it."""
    import jax.numpy as jnp

    from waveform_tpu import AudioInfo, Settings, TSmoothingMode, resolve
    from waveform_tpu.dsp.spectrum import init_state, make_spectrum_step

    cfg = resolve(Settings(fft_size=256,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(48000, 2))   # mono fold, C=2
    assert not cfg.stereo
    step = make_spectrum_step(cfg)
    state = init_state(cfg, 1)           # decibels at DB_MIN (sub-gate)
    # sentinel in ch1's work buffer: frozen keeps it, processed clears it
    state = state.replace(decibels=state.decibels.at[:, 1].set(7.0))

    x = np.zeros((1, 2, 256), np.float32)
    x[0, 0, :] = 1e-6                    # ch0: nonzero but deep sub-floor
    new = step(jnp.asarray(x), state, jnp.float32(1 / 60),
               jnp.ones(1, bool), jnp.zeros(1, jnp.float32))
    assert not bool(np.asarray(new.last_silent)[0])
    # ch1 processed: its buffer holds the zero-FFT magnitudes, not 7.0
    ch1 = np.asarray(new.decibels)[0, 1]
    assert not np.allclose(ch1, 7.0), "silent ch1 froze on stale values"
    assert np.all(np.abs(ch1) < 1e-3)

    # contrast: when ch0 is ALSO silent (and sub-gate), both skip and the
    # latch sets — the reference's both-channels-outsilent branch
    state2 = init_state(cfg, 1)
    new2 = step(jnp.zeros((1, 2, 256), jnp.float32), state2,
                jnp.float32(1 / 60), jnp.ones(1, bool),
                jnp.zeros(1, jnp.float32))
    assert bool(np.asarray(new2.last_silent)[0])
