"""Randomized verifier sweep — the ``check.pl -r`` analog.

FFTW's release harness draws random problem sets and runs the full
verifier battery on each (/root/reference/deps/fftw-3.3.11/tests/check.pl:1-30,
``perl check.pl -r -c=30 ...``); the fixed size lists in
test_verify_theorems.py / test_exactfft.py cover the curated corners but
not the space between them.  This module draws seeded random problems —
size (any multiple of 16 in [128, 8192], the slider's legal range,
/root/reference/src/source.cpp:349,562-565), FFT backend, window function,
sine exponent, and channel mode — and runs the verifier set on each draw:

* impulse response      (verify-lib.c accoutput/impulse machinery)
* linearity             FFT(a·x + b·y) = a·X + b·Y
* time-shift theorem    FFT(x«s»)[k] = X[k]·e^{-2πi k s/N}
* frequency-shift       FFT(x·e^{+2πi m n/N})[k] = X[(k−m) mod N]
* Parseval energy       Σ|x|² = (1/N)·Σ|X|²
* windowed-magnitude    the full pipeline's |rFFT| vs a float64 oracle,
                        in dB (the plugin-level gate)

Errors are reported with BOTH metrics FFTW's verify-lib uses: max
absolute deviation and relative L2 (verify-lib.c:464-477).

Seed and draw count are env-tunable (WAVEFORM_TPU_VERIFY_SEED /
WAVEFORM_TPU_VERIFY_DRAWS) so CI can widen the sweep without edits; the
default is deterministic.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveform_tpu.core.enums import FFTWindow
from waveform_tpu.dsp.windows import window_coefficients
from waveform_tpu.kernels.exactfft import cfft_exact, rfft_mag_exact
from waveform_tpu.kernels.matfft import cfft

SEED = int(os.environ.get("WAVEFORM_TPU_VERIFY_SEED", "20260819"))
DRAWS = int(os.environ.get("WAVEFORM_TPU_VERIFY_DRAWS", "10"))


def _cfft_matfft(xr, xi):
    zr, zi = jax.jit(cfft)(jnp.asarray(xr), jnp.asarray(xi))
    return (np.asarray(zr).astype(np.float64)
            + 1j * np.asarray(zi).astype(np.float64))


def _cfft_exact(xr, xi):
    (zr_hi, zr_lo), (zi_hi, zi_lo) = jax.jit(cfft_exact)(
        jnp.asarray(xr), jnp.asarray(xi))
    re = np.asarray(zr_hi).astype(np.float64) + np.asarray(zr_lo)
    im = np.asarray(zi_hi).astype(np.float64) + np.asarray(zi_lo)
    return re + 1j * im


# per-backend relative tolerance at n=256 (GEMM error grows ~sqrt(N) with
# f32 accumulation; the exact backend sits at its df32 truncation floor)
_BACKENDS = {"matfft": (_cfft_matfft, 3e-4), "exact": (_cfft_exact, 5e-7)}

_WINDOWS = [FFTWindow.NONE, FFTWindow.HANN, FFTWindow.HAMMING,
            FFTWindow.BLACKMAN, FFTWindow.BLACKMAN_HARRIS,
            FFTWindow.POWER_OF_SINE]


def _rel_l2(got, want):
    """FFTW's relative L2 metric (verify-lib.c:464-477)."""
    return (np.linalg.norm(got - want)
            / max(np.linalg.norm(want), 1e-300))


def _draws():
    rng = np.random.default_rng(SEED)
    out = []
    for i in range(DRAWS):
        n = 16 * int(rng.integers(8, 513))       # 128..8192, any *16
        backend = ["matfft", "exact"][int(rng.integers(2))]
        win = _WINDOWS[int(rng.integers(len(_WINDOWS)))]
        sine_exp = int(rng.integers(1, 5))
        stereo = bool(rng.integers(2))
        out.append((i, n, backend, win, sine_exp, stereo))
    return out


@pytest.mark.parametrize(
    "i,n,backend,win,sine_exp,stereo", _draws(),
    ids=lambda v: str(v) if not hasattr(v, "name") else v.name)
def test_random_problem(i, n, backend, win, sine_exp, stereo):
    """One random problem through the whole verifier battery."""
    f, tol0 = _BACKENDS[backend]
    tol = tol0 * np.sqrt(n / 256)
    rng = np.random.default_rng(SEED * 1000 + i)
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    x = xr + 1j * xi
    z = f(xr, xi)
    want = np.fft.fft(x.astype(np.complex128))
    scale = np.abs(want).max()

    # transform correctness (the impulse/accoutput umbrella: a random
    # vector checked against the float64 DFT bounds every linear-
    # combination-of-impulses response at once)
    assert np.abs(z - want).max() < tol * scale
    assert _rel_l2(z, want) < tol

    # impulse: FFT(delta_0) = ones
    d = np.zeros(n, np.float32)
    d[0] = 1.0
    zd = f(d, np.zeros(n, np.float32))
    assert np.abs(zd - 1.0).max() < tol

    # linearity
    yr = rng.standard_normal(n).astype(np.float32)
    yi = rng.standard_normal(n).astype(np.float32)
    a, b = np.float32(1.375), np.float32(-0.6875)  # exact in f32
    zy = f(yr, yi)
    zc = f(a * xr + b * yr, a * xi + b * yi)
    lin_want = a * z + b * zy
    assert _rel_l2(zc, lin_want) < tol

    # time shift: FFT(x<<s)[k] = X[k] * e^{-2pi i k s / n}
    s = int(rng.integers(1, n))
    xs = np.roll(x, s)
    zs = f(xs.real.astype(np.float32), xs.imag.astype(np.float32))
    k = np.arange(n)
    ts_want = want * np.exp(-2j * np.pi * k * s / n)
    assert _rel_l2(zs, ts_want) < tol

    # frequency shift: FFT(x * e^{+2pi i m t / n})[k] = X[(k-m) mod n]
    m = int(rng.integers(1, n))
    mod = np.exp(2j * np.pi * m * np.arange(n) / n)
    xm = x * mod
    zm = f(xm.real.astype(np.float32), xm.imag.astype(np.float32))
    assert _rel_l2(zm, np.roll(want, m)) < tol

    # Parseval
    e_time = np.sum(np.abs(x.astype(np.complex128)) ** 2)
    e_freq = np.sum(np.abs(z) ** 2) / n
    assert abs(e_freq - e_time) / e_time < tol

    # windowed-magnitude pipeline vs float64 oracle, in dB — the
    # plugin-level property (window x channel-mode drawn per problem)
    C = 2 if stereo else 1
    xa = rng.standard_normal((C, n)).astype(np.float32)
    if win == FFTWindow.NONE:
        w64 = np.ones(n, np.float64)
        window = None
    else:
        w64 = window_coefficients(win, n, sine_exp, dtype=np.float64)
        w_hi = w64.astype(np.float32)
        w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
        window = (jnp.asarray(w_hi), jnp.asarray(w_lo))
    nbins = n // 2
    if backend == "exact":
        mag = np.asarray(rfft_mag_exact(
            jnp.asarray(xa), nbins, window=window)).astype(np.float64)
        db_tol = 1e-4                      # the north-star render gate
    else:
        from waveform_tpu.kernels.matfft import rfft_mag
        xw = jnp.asarray(xa * w64.astype(np.float32))
        mag = np.asarray(rfft_mag(xw, nbins)).astype(np.float64)
        db_tol = 0.05 * np.sqrt(n / 256)   # f32 GEMM accumulation class
    want_mag = np.abs(np.fft.rfft(xa.astype(np.float64) * w64,
                                  axis=-1))[:, :nbins]
    vis = want_mag > 10 ** (-120 / 20.0)   # above the render floor
    db_err = np.abs(20 * np.log10(np.maximum(mag[vis], 1e-300))
                    - 20 * np.log10(want_mag[vis]))
    assert db_err.max() < db_tol, (
        f"draw {i}: n={n} backend={backend} win={win.name} "
        f"sine^{sine_exp} stereo={stereo}: max dB err {db_err.max():.2e}")

    if backend == "exact" and n % 128 == 0 and (n // 128) % 8 == 0:
        # the r5 zero-relayout contract on the same draw: block bin order
        # is a pure permutation of the identical values (every lowering —
        # kernel or fallback — must honor block_bin_of_pos bit-exactly)
        from waveform_tpu.kernels.exact_pallas import block_bin_of_pos
        magb = np.asarray(rfft_mag_exact(
            jnp.asarray(xa), None, window=window, bin_order="block"))
        inv = np.argsort(block_bin_of_pos(n))
        np.testing.assert_array_equal(magb[..., inv], mag.astype(np.float32))
