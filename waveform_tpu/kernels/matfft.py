"""GEMM-native FFT: the MXU replacement for FFTW's codelet engine.

The reference dispatches to FFTW's generated SIMD codelets
(/root/reference/deps/fftw-3.3.11/dft/simd/, selected by the runtime planner
kernel/planner.c).  On TPU the systolic array is the fast path, so the
transform becomes the classic 4-step Cooley-Tukey factorization N = N1·N2
expressed as two batched matmuls plus a twiddle multiply — every FLOP lands
on the MXU instead of the VPU:

    x[n1,n2] --F1[N1,N1]--> A[k1,n2] --·W_N^{n2·k1}--> B --F2[N2,N2]--> X

Complex arithmetic rides the MXU as 2×2 real block matrices
([[Re,-Im],[Im,Re]]), which doubles the contraction width to 2·N1 — full
128-lane utilization at N1=64 and one matmul per step instead of four.

Real input uses the two-channels-in-one-complex-FFT packing (z = ch0 +
i·ch1; unpack via conjugate symmetry), which exactly matches this
framework's [S, C=2, N] batch layout — the stereo pair rides one transform.

Precision: matmuls run at jax "highest" (6-pass bf16 ≈ full f32).  Measured
at N=4096 on v5e: max relative magnitude error vs float64 numpy is 1.4e-5
("high"/3-pass: 1.4e-3) for only ~15% more time (181 µs vs 158 µs per
128-pair batch).  Accumulation in the MXU passes — not the f32-rounded
constants — dominates that error, so the double-float ``precise`` option
(which compensates constants only) buys little at any size; measured at
N=65536 it does not move the ~1e-4 relative error.  When the <1e-4 dB
north star binds, use the digit-sliced exact-accumulation FFT
(kernels/exactfft.py, ~1e-9 relative), the default spectrum backend on
TPU.  This module is the fast plain-f32 path.
"""

from __future__ import annotations

import math
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

MATMUL_PRECISION = "highest"


def _split_factors(n: int) -> tuple[int, int]:
    """N = N1·N2 with N1 ≈ N2 (2·N1 = 128 at N=4096: full MXU width)."""
    best = (1, n)
    for n1 in range(1, int(math.isqrt(n)) + 1):
        if n % n1 == 0:
            best = (n1, n // n1)
    return best


def _split_f32(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Double-float split: a ≈ hi + lo with hi = f32(a), lo = f32(a - hi)."""
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


@lru_cache(maxsize=32)
def _plan(n: int):
    """Host-precomputed block-DFT matrices + twiddles (float64 → float32,
    with double-float residuals for the precise path)."""
    n1, n2 = _split_factors(n)
    f1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    # left block [[Re,-Im],[Im,Re]]: [ar; ai] = F1b @ [xr; xi]
    f1b = np.block([[f1.real, -f1.imag], [f1.imag, f1.real]])
    # right block for row-vector multiply: [cr, ci] = [br, bi] @ F2b
    f2b = np.block([[f2.real, f2.imag], [-f2.imag, f2.real]])
    return (n1, n2, _split_f32(f1b), _split_f32(f2b),
            _split_f32(tw.real), _split_f32(tw.imag))


def cfft(re: jnp.ndarray, im: jnp.ndarray,
         precise: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Complex FFT over the last axis via two block matmuls; [..., N] f32.

    ``precise=True`` adds error-compensated constant residuals (double-float
    split of the DFT matrices and twiddles): each step gains one extra
    matmul against the tiny ``lo`` residual, removing the error the
    f32-rounded constants inject.  It does NOT compensate accumulation
    inside the matmuls, which dominates — measured ~1.2e-4 relative at
    N=65536 with or without it.  For guaranteed <1e-4 dB accuracy use
    kernels/exactfft.py instead (the default TPU spectrum backend).
    """
    n = re.shape[-1]
    n1, n2, (f1b, f1b_lo), (f2b, f2b_lo), (twr, twr_lo), (twi, twi_lo) = \
        _plan(n)
    f1b, f2b = jnp.asarray(f1b), jnp.asarray(f2b)
    twr, twi = jnp.asarray(twr), jnp.asarray(twi)

    xr = re.reshape(*re.shape[:-1], n1, n2)
    xi = im.reshape(*im.shape[:-1], n1, n2)

    # step 1: [A_r; A_i] = F1b @ [x_r; x_i]       (one [2N1, 2N1] matmul)
    x2 = jnp.concatenate([xr, xi], axis=-2)                  # [..., 2N1, N2]
    a2 = jnp.einsum("kj,...jn->...kn", f1b, x2,
                    precision=MATMUL_PRECISION)
    if precise:
        a2 = a2 + jnp.einsum("kj,...jn->...kn", jnp.asarray(f1b_lo), x2,
                             precision=MATMUL_PRECISION)
    ar, ai = a2[..., :n1, :], a2[..., n1:, :]

    # step 2: twiddle B = A · W_N^{k1·n2}
    br = ar * twr - ai * twi
    bi = ar * twi + ai * twr
    if precise:
        br = br + (ar * twr_lo - ai * twi_lo)
        bi = bi + (ar * twi_lo + ai * twr_lo)

    # step 3: [C_r, C_i] = [B_r, B_i] @ F2b       (one [2N2, 2N2] matmul)
    b2 = jnp.concatenate([br, bi], axis=-1)                  # [..., N1, 2N2]
    c2 = jnp.einsum("...kn,nm->...km", b2, f2b,
                    precision=MATMUL_PRECISION)
    if precise:
        c2 = c2 + jnp.einsum("...kn,nm->...km", b2, jnp.asarray(f2b_lo),
                             precision=MATMUL_PRECISION)
    cr, ci = c2[..., :n2], c2[..., n2:]

    # output index k = k1 + N1·k2 → transpose (k2, k1) then flatten
    zr = jnp.swapaxes(cr, -1, -2).reshape(*re.shape[:-1], n)
    zi = jnp.swapaxes(ci, -1, -2).reshape(*im.shape[:-1], n)
    return zr, zi


def rfft_pair_mag(x: jnp.ndarray, nbins: int | None = None,
                  precise: bool = False) -> jnp.ndarray:
    """|rFFT| of a channel pair via one packed complex FFT.

    ``x`` is [..., 2, N] float32; returns magnitudes [..., 2, nbins]
    (default N//2, matching the reference's kept-bins convention).

    z = x0 + i·x1 ⇒ X0[k] = (Z[k]+conj(Z[N-k]))/2,
                    X1[k] = (Z[k]-conj(Z[N-k]))/(2i).
    """
    n = x.shape[-1]
    nbins = n // 2 if nbins is None else nbins
    zr, zi = cfft(x[..., 0, :], x[..., 1, :], precise=precise)
    # Z[(N-k) mod N] = reverse-roll
    zrr = jnp.roll(zr[..., ::-1], 1, axis=-1)
    zir = jnp.roll(zi[..., ::-1], 1, axis=-1)
    x0r = 0.5 * (zr + zrr)
    x0i = 0.5 * (zi - zir)
    x1r = 0.5 * (zi + zir)
    x1i = 0.5 * (zrr - zr)
    mag0 = jnp.sqrt(x0r * x0r + x0i * x0i)[..., :nbins]
    mag1 = jnp.sqrt(x1r * x1r + x1i * x1i)[..., :nbins]
    return jnp.stack([mag0, mag1], axis=-2)


def rfft_real(x: jnp.ndarray,
              precise: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """rFFT of real input via the GEMM path: (re, im) each [..., N//2+1].

    Avoids complex dtypes; pairs of channels should prefer
    :func:`rfft_pair_mag`.
    """
    n = x.shape[-1]
    zr, zi = cfft(x, jnp.zeros_like(x), precise=precise)
    return zr[..., :n // 2 + 1], zi[..., :n // 2 + 1]


def rfft_mag(x: jnp.ndarray, nbins: int | None = None,
             precise: bool = False) -> jnp.ndarray:
    """|rFFT| for arbitrary channel counts [..., C, N] → [..., C, nbins].

    Even channel counts pair up through :func:`rfft_pair_mag`; odd ones fall
    back to a zero-imag transform for the last channel.
    """
    c = x.shape[-2]
    n = x.shape[-1]
    nbins = n // 2 if nbins is None else nbins
    outs = []
    for i in range(0, c - 1, 2):
        outs.append(rfft_pair_mag(x[..., i:i + 2, :], nbins, precise=precise))
    if c % 2:
        zr, zi = cfft(x[..., -1, :], jnp.zeros_like(x[..., -1, :]),
                      precise=precise)
        m = jnp.sqrt(zr * zr + zi * zi)[..., :nbins]
        outs.append(m[..., None, :])
    return jnp.concatenate(outs, axis=-2)
