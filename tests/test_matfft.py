"""GEMM-native FFT: correctness vs numpy float64 across sizes and packings."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveform_tpu.kernels.matfft import (
    _split_factors,
    cfft,
    rfft_mag,
    rfft_pair_mag,
    rfft_real,
)


@pytest.mark.parametrize("n", [64, 128, 720, 992, 1024, 4096, 16384])
def test_cfft_vs_numpy(n, rng):
    xr = rng.standard_normal((3, n)).astype(np.float32)
    xi = rng.standard_normal((3, n)).astype(np.float32)
    zr, zi = jax.jit(cfft)(jnp.asarray(xr), jnp.asarray(xi))
    want = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    got = np.asarray(zr) + 1j * np.asarray(zi)
    # f32 accumulation error grows ~sqrt(N); scale tolerance accordingly
    tol = 3e-4 * np.sqrt(n / 64)
    assert np.abs(got - want).max() < tol


def test_split_factors():
    assert _split_factors(4096) == (64, 64)
    assert _split_factors(960) == (30, 32)
    n1, n2 = _split_factors(65536)
    assert n1 * n2 == 65536 and n1 == n2 == 256


def test_pair_packing(rng):
    """Two real channels through one complex FFT match per-channel rffts."""
    n = 1024
    x = rng.standard_normal((5, 2, n)).astype(np.float32)
    mag = np.asarray(jax.jit(rfft_pair_mag)(jnp.asarray(x)))
    want = np.abs(np.fft.rfft(x.astype(np.float64), axis=-1))[..., :n // 2]
    np.testing.assert_allclose(mag, want, atol=2e-3)
    assert mag.shape == (5, 2, n // 2)


def test_rfft_real(rng):
    n = 512
    x = rng.standard_normal((4, n)).astype(np.float32)
    re, im = jax.jit(rfft_real)(jnp.asarray(x))
    want = np.fft.rfft(x.astype(np.float64), axis=-1)
    np.testing.assert_allclose(np.asarray(re), want.real, atol=2e-3)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=2e-3)
    assert re.shape == (4, n // 2 + 1)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_rfft_mag_channel_counts(c, rng):
    n = 256
    x = rng.standard_normal((2, c, n)).astype(np.float32)
    mag = np.asarray(jax.jit(rfft_mag)(jnp.asarray(x)))
    want = np.abs(np.fft.rfft(x.astype(np.float64), axis=-1))[..., :n // 2]
    np.testing.assert_allclose(mag, want, atol=1e-3)


def test_impulse_and_linearity(rng):
    """FFTW-style property checks on the GEMM transform
    (deps/fftw-3.3.11/libbench2/verify-lib.c:260-359)."""
    n = 2048
    # impulse → flat unit spectrum
    x = np.zeros((1, n), np.float32)
    x[0, 0] = 1.0
    re, im = jax.jit(rfft_real)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(re)[0], 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(im)[0], 0.0, atol=1e-4)
    # linearity
    a, b = 0.7, -1.3
    u = rng.standard_normal((1, n)).astype(np.float32)
    v = rng.standard_normal((1, n)).astype(np.float32)
    f = jax.jit(rfft_real)
    ru, iu = f(jnp.asarray(u))
    rv, iv = f(jnp.asarray(v))
    rc, ic = f(jnp.asarray(a * u + b * v))
    np.testing.assert_allclose(np.asarray(rc), a * np.asarray(ru) + b * np.asarray(rv),
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(ic), a * np.asarray(iu) + b * np.asarray(iv),
                               atol=5e-3)


def test_time_shift_theorem(rng):
    """FFTW's tf_shift verifier (libbench2/verify-lib.c:360+): a circular
    time shift multiplies the spectrum by e^{-2pi i k m / N} — checked on
    the complex GEMM FFT and, magnitude-invariance, on the exact path."""
    n, m = 512, 37
    x = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    zr, zi = jax.jit(cfft)(jnp.asarray(x), jnp.asarray(xi))
    sr_, si_ = jax.jit(cfft)(jnp.asarray(np.roll(x, m)),
                             jnp.asarray(np.roll(xi, m)))
    k = np.arange(n)
    ph = np.exp(-2j * np.pi * k * m / n)
    want = (np.asarray(zr) + 1j * np.asarray(zi)) * ph
    got = np.asarray(sr_) + 1j * np.asarray(si_)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-4 * scale)

    # exact path: |FFT(roll(x))| == |FFT(x)| to its truncation floor
    from waveform_tpu.kernels.exactfft import rfft_mag_exact
    a = np.stack([x, xi])[None]
    f = jax.jit(lambda v: rfft_mag_exact(v, n // 2))
    mag = np.asarray(f(a))
    mag_s = np.asarray(f(np.stack([np.roll(x, m), np.roll(xi, m)])[None]))
    np.testing.assert_allclose(mag_s, mag, rtol=2e-6, atol=1e-9)
