"""FFTW verifier parity: frequency-shift theorem and Parseval/energy checks.

Completes the FFTW ``libbench2`` property set for both FFT backends —
impulse/linearity/time-shift live in test_matfft.py/test_exactfft.py; this
module adds the remaining two verifiers:

* frequency-shift theorem (``tf_shift`` with TIME_SHIFT's dual,
  /root/reference/deps/fftw-3.3.11/libbench2/verify-lib.c:360-443):
  FFT(x·e^{+2πi m n/N})[k] = FFT(x)[(k−m) mod N]
* Parseval/energy: Σ|x|² = (1/N)·Σ|X|² — FFTW's ``acomplete`` L2 impulse
  machinery checks preserved energy through the same identity
  (verify-lib.c:444-477).

Each check runs against BOTH the plain GEMM backend (kernels/matfft.py) and
the digit-sliced exact backend (kernels/exactfft.py), parametrized over
sizes including a non-power-of-two multiple of 16 (any such size is legal,
/root/reference/src/source.cpp:562-565).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from waveform_tpu.kernels.exactfft import cfft_exact, rfft_mag_exact
from waveform_tpu.kernels.matfft import cfft, rfft_real

SIZES = [256, 1024, 1040, 4096]


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


# (name, transform, rel-tolerance-at-n=256); GEMM-backend error grows
# ~sqrt(N) with f32 accumulation, the exact backend sits at its df32
# truncation floor
BACKENDS = [
    ("matfft", _cfft_matfft, 3e-4),
    ("exact", _cfft_exact, 5e-7),
]


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("backend", BACKENDS, ids=lambda b: b[0])
def test_frequency_shift_theorem(n, backend, rng):
    """Modulating the input by e^{+2πi m n/N} rotates the spectrum by m
    bins (verify-lib.c:360-443, the FREQ_SHIFT direction of tf_shift)."""
    _, f, tol0 = backend
    m = 29
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    z = f(xr, xi)

    t = np.arange(n)
    mod = np.exp(2j * np.pi * m * t / n)
    y = (xr + 1j * xi) * mod
    zy = f(y.real.astype(np.float32), y.imag.astype(np.float32))

    want = np.roll(z, m)            # X[(k-m) mod N]
    scale = np.abs(want).max()
    tol = tol0 * np.sqrt(n / 256) * scale
    assert np.abs(zy - want).max() < tol


@pytest.mark.parametrize("n", SIZES)
@pytest.mark.parametrize("backend", BACKENDS, ids=lambda b: b[0])
def test_parseval_energy(n, backend, rng):
    """Σ|x|² == (1/N)·Σ|X|² (FFTW's preserved-L2 check,
    verify-lib.c:444-477)."""
    _, f, tol0 = backend
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    z = f(xr, xi)
    e_time = np.sum(xr.astype(np.float64) ** 2 + xi.astype(np.float64) ** 2)
    e_freq = np.sum(np.abs(z) ** 2) / n
    rel = abs(e_freq - e_time) / e_time
    assert rel < tol0 * np.sqrt(n / 256)


@pytest.mark.parametrize("n", [512, 1024, 4096])
def test_parseval_real_input(n, rng):
    """Real-input Parseval through both real paths: rfft_real keeps all
    N/2+1 bins; the exact magnitude path keeps the below-Nyquist half the
    plugin uses (src/source_avx2.cpp:29), so its identity adds the dropped
    Nyquist bin explicitly."""
    x = rng.standard_normal((2, n)).astype(np.float32)
    e_time = np.sum(x.astype(np.float64) ** 2, axis=-1)

    re, im = jax.jit(rfft_real)(jnp.asarray(x))
    X = np.asarray(re).astype(np.float64) + 1j * np.asarray(im)
    # hermitian energy: DC + Nyquist once, interior bins twice
    e = (np.abs(X[:, 0]) ** 2 + np.abs(X[:, -1]) ** 2
         + 2 * np.sum(np.abs(X[:, 1:-1]) ** 2, axis=-1)) / n
    np.testing.assert_allclose(e, e_time, rtol=2e-3 * np.sqrt(n / 512))

    mag = np.asarray(jax.jit(rfft_mag_exact)(jnp.asarray(x))
                     ).astype(np.float64)
    ny = np.abs(np.fft.rfft(x.astype(np.float64), axis=-1)[:, -1]) ** 2
    e_x = (2 * np.sum(mag[:, 1:] ** 2, axis=-1) + mag[:, 0] ** 2 + ny) / n
    np.testing.assert_allclose(e_x, e_time, rtol=1e-5)
