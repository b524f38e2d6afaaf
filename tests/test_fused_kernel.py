"""Pallas fused spectrum kernels: correctness in interpret mode (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveform_tpu.kernels.fused_spectrum import (
    fused_packed,
    fused_window_fft_mag_ema,
    supports,
)


def test_supports():
    assert supports(2, 4096)
    assert supports(2, 256)
    assert not supports(1, 4096)
    assert not supports(2, 720)


@pytest.mark.parametrize("fn", [fused_window_fft_mag_ema, fused_packed])
@pytest.mark.parametrize("n", [256, 1024])
def test_fused_vs_numpy(fn, n, rng):
    S = 8
    x = rng.standard_normal((S, 2, n)).astype(np.float32)
    coeffs = np.hanning(n).astype(np.float32)
    norm = 2.0 / coeffs.sum()
    ts = rng.standard_normal((S, 2, n // 2)).astype(np.float32) ** 2
    g = 0.65
    out = np.asarray(fn(jnp.asarray(x), jnp.asarray(ts),
                        jnp.asarray(coeffs * norm), jnp.float32(g),
                        interpret=True))
    mag = np.abs(np.fft.rfft(x.astype(np.float64) * (coeffs * norm),
                             axis=-1))[..., :n // 2]
    want = g * ts + (1 - g) * mag
    np.testing.assert_allclose(out, want, atol=2e-4)


def test_fused_fast_peaks(rng):
    n, S = 256, 4
    x = rng.standard_normal((S, 2, n)).astype(np.float32)
    coeffs = np.ones(n, np.float32) * (2.0 / n)
    ts = np.zeros((S, 2, n // 2), np.float32)
    out = np.asarray(fused_window_fft_mag_ema(
        jnp.asarray(x), jnp.asarray(ts), jnp.asarray(coeffs),
        jnp.float32(0.9), fast_peaks=True, interpret=True))
    # fast peaks from zero state: rising values snap to the new magnitude
    mag = np.abs(np.fft.rfft(x.astype(np.float64) * coeffs,
                             axis=-1))[..., :n // 2]
    np.testing.assert_allclose(out, mag, atol=2e-4)
