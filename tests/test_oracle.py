"""Property-based checks on the float64 oracle itself.

Adopts FFTW's verification style (deps/fftw-3.3.11/libbench2/verify-lib.c):
impulse response, linearity, Parseval, plus known closed-form spectra —
before the oracle is trusted as ground truth for the TPU pipeline.
"""

import math

import numpy as np
import pytest

from waveform_tpu import (
    AudioInfo,
    DB_MIN,
    DisplayMode,
    FFTWindow,
    InterpMode,
    Settings,
    TSmoothingMode,
    resolve,
)
from waveform_tpu.dsp import oracle
from waveform_tpu.dsp.windows import window_coefficients, window_sum


def cfg_for(**kw):
    audio = kw.pop("audio", AudioInfo(48000, 2))
    return resolve(Settings(**kw), audio)


def test_window_sums():
    # Hann sums to ~N/2; NONE uses N itself (src/source.cpp:1233-1234)
    assert window_sum(FFTWindow.NONE, 1024) == 1024.0
    assert abs(window_sum(FFTWindow.HANN, 1024) - 511.5) < 1e-9
    w = window_coefficients(FFTWindow.HAMMING, 512)
    assert abs(w[0] - (0.53836 - 0.46164)) < 1e-12
    assert abs(w[-1] - (0.53836 - 0.46164)) < 1e-12
    # power-of-sine with exponent 2 equals Hann
    ps = window_coefficients(FFTWindow.POWER_OF_SINE, 512, sine_exponent=2)
    hn = window_coefficients(FFTWindow.HANN, 512)
    np.testing.assert_allclose(ps, hn, atol=1e-12)


def test_dbfs():
    assert oracle.dbfs(np.array([1.0]))[0] == 0.0
    assert oracle.dbfs(np.array([0.0]))[0] == DB_MIN
    assert oracle.dbfs(np.array([-1.0]))[0] == DB_MIN
    assert abs(oracle.dbfs(np.array([0.5]))[0] - 20 * math.log10(0.5)) < 1e-12


def test_slope_modifiers_closed_form():
    mods = oracle.slope_modifiers(1024, slope=2.0)
    i = np.arange(1024)
    expected = 1.0 + 3.0 * 2.0 * i / 1023.0
    np.testing.assert_allclose(mods, expected, rtol=1e-12)


@pytest.mark.parametrize("window", list(FFTWindow))
def test_sine_magnitude(window):
    """A full-scale sine at an exact bin frequency reads ~0 dBFS.

    The 2/window_sum normalization is exactly the factor that makes a
    unit-amplitude sine in the window's passband come out at magnitude 1.
    """
    N = 1024
    cfg = cfg_for(fft_size=N, window=window, temporal_smoothing=TSmoothingMode.NONE,
                  channel_mode="mono")
    k = 128
    t = np.arange(N)
    x = np.sin(2 * np.pi * k * t / N)
    db, _ = oracle.spectrum_frame(np.stack([x, x]), None, cfg, dt=1 / 60)
    # peak bin should be near 0 dBFS (window mainlobe loss < 0.1 dB at center)
    assert db[0, k] > -0.1
    assert db[0, k] < 0.5
    # far-away bins must be far down
    assert db[0, k // 2] < -40


def test_linearity():
    N = 512
    cfg = cfg_for(fft_size=N, window=FFTWindow.HANN,
                  temporal_smoothing=TSmoothingMode.NONE)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, N))
    y = rng.standard_normal((2, N))
    a, b = 0.7, -1.3
    # magnitudes are not linear, but the underlying windowed FFT is; check via
    # complex spectra of the oracle's constituent pieces
    w = window_coefficients(FFTWindow.HANN, N)
    fx = np.fft.rfft(x * w)
    fy = np.fft.rfft(y * w)
    fxy = np.fft.rfft((a * x + b * y) * w)
    np.testing.assert_allclose(fxy, a * fx + b * fy, atol=1e-9)


def test_parseval():
    N = 2048
    rng = np.random.default_rng(2)
    x = rng.standard_normal(N)
    X = np.fft.rfft(x)
    # Parseval for rfft: sum|x|^2 == (|X0|^2 + 2*sum|Xk|^2 + |XN/2|^2)/N
    lhs = np.sum(x * x)
    mid = np.abs(X[1:-1]) ** 2
    rhs = (np.abs(X[0]) ** 2 + 2 * mid.sum() + np.abs(X[-1]) ** 2) / N
    assert abs(lhs - rhs) / lhs < 1e-12


def test_ema_and_fast_peaks():
    N = 256
    cfg = cfg_for(fft_size=N, window=FFTWindow.NONE, gravity=0.5,
                  temporal_smoothing=TSmoothingMode.EXPONENTIAL)
    x = np.zeros((2, N))
    x[:, 0] = 1.0  # impulse
    ts = np.zeros((2, N // 2))
    db1, ts1 = oracle.spectrum_frame(x, ts, cfg, dt=1 / 60)
    # impulse spectrum: |X_k| = 1 for all k -> mag = 2/N; EMA g=.5 halves it
    expected_mag = 0.5 * (2.0 / N)
    np.testing.assert_allclose(ts1[0], expected_mag, rtol=1e-12)
    # second frame of silence decays by g
    db2, ts2 = oracle.spectrum_frame(np.zeros_like(x), ts1, cfg, dt=1 / 60)
    np.testing.assert_allclose(ts2[0], 0.5 * expected_mag, rtol=1e-12)

    # fast peaks: rising input snaps immediately
    cfg_fp = cfg_for(fft_size=N, window=FFTWindow.NONE, gravity=0.5,
                     temporal_smoothing=TSmoothingMode.EXPONENTIAL, fast_peaks=True)
    _, ts_fp = oracle.spectrum_frame(x, np.zeros((2, N // 2)), cfg_fp, dt=1 / 60)
    np.testing.assert_allclose(ts_fp[0], 2.0 / N, rtol=1e-12)


def test_tv_ema_gravity():
    g = oracle.gravity_coefficient(TSmoothingMode.TVEXPONENTIAL, 1.0, 1 / 60)
    expected = math.exp(-(1 / 60) / (5 * oracle.TV_EMA_DENOM))
    assert abs(g - expected) < 1e-12
    assert oracle.gravity_coefficient(TSmoothingMode.NONE, 1.0, 1 / 60) == 0.0
    assert oracle.gravity_coefficient(TSmoothingMode.EXPONENTIAL, 0.65, 1) == 0.65


def test_mono_downmix_vs_stereo():
    N = 256
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, N))
    cfg_m = cfg_for(fft_size=N, temporal_smoothing=TSmoothingMode.NONE)
    cfg_s = cfg_for(fft_size=N, temporal_smoothing=TSmoothingMode.NONE,
                    channel_mode="stereo")
    db_m, _ = oracle.spectrum_frame(x, None, cfg_m, dt=1 / 60)
    db_s, _ = oracle.spectrum_frame(x, None, cfg_s, dt=1 / 60)
    assert db_m.shape == (1, N // 2)
    assert db_s.shape == (2, N // 2)
    # mono is dbfs of channel-mean magnitude, not mean of dbfs
    assert not np.allclose(db_m[0], db_s.mean(axis=0))


def test_rolloff_modifiers():
    mods = oracle.rolloff_modifiers(1024, 48000, 100, 10000, q=1.0, rate=6.0)
    assert mods[0] == 0.0
    # at 50 Hz (~bin 1, freq=46.875): low ratio = 200/46.875 -> 6*log2(4.26)
    freq1 = 48000 / 1024
    expected = 6.0 * math.log2(200.0 / freq1)
    assert abs(mods[1] - expected) < 1e-9
    # mid-band has no attenuation
    mid_bin = int(3000 * 1024 / 48000)
    assert mods[mid_bin] == 0.0


def test_volume_normalization_gain():
    N = 256
    cfg = cfg_for(fft_size=N, normalize_volume=True, volume_target=-8,
                  max_gain=30, temporal_smoothing=TSmoothingMode.NONE)
    x = np.ones((2, N)) * 0.5
    db, _ = oracle.spectrum_frame(x, None, cfg, dt=1 / 60, input_rms=0.5)
    db0, _ = oracle.spectrum_frame(x, None, cfg_for(
        fft_size=N, temporal_smoothing=TSmoothingMode.NONE), dt=1 / 60)
    comp = min(-8.0 - 20 * math.log10(0.5), 30.0)
    # bin 0 untouched, others get compensation (src/source_generic.cpp:161-167)
    assert db[0, 0] == db0[0, 0]
    np.testing.assert_allclose(db[0, 1:], db0[0, 1:] + comp, atol=1e-9)
