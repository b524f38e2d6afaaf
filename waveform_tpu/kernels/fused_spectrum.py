"""Pallas fused spectrum kernel: window → GEMM-FFT → |z| → EMA in one pass.

BASELINE.json config 5 calls for a "fully fused Pallas window+rFFT+mag+smooth"
kernel.  This keeps a stream pair resident in VMEM through all four stages —
no HBM round trips between the window multiply, the two block-matmul FFT
stages (kernels/matfft.py math), the magnitude, and the EMA update — and
writes only the smoothed magnitudes back.

Mosaic constraints shape the implementation:

* 2D matmuls only → one stream pair per grid program, factorized with
  N2 = 128 so every matmul's lane dimension fills the MXU/VPU width;
* no lane-splitting reshape → inputs/outputs travel in Cooley-Tukey block
  coordinates ([2, N1, N2] samples, [2, N2/2, N1] bins, bin k = k1 + N1·k2);
  the cheap reshapes happen outside in XLA;
* no array-reverse primitive → the conjugate-symmetry unpack's index
  reversal Z[(N-k) mod N] becomes antidiagonal permutation matmuls
  (P1·C·P2) with a masked fix for the k1=0 row — it stays on the MXU.

Supported: C == 2 (pair packing) and N a multiple of 256; other configs use
the unfused jnp path (kernels/matfft.py).

Measured on v5e (S=256, scan-amortized): at N=4096 per-stream kernel
369 µs, stream-packed 292 µs, unfused jnp GEMM path 131 µs; at N=16384
(where VMEM residency should matter most) per-stream 1291 µs, packed
1485 µs, unfused 1055 µs — XLA's batched einsum scheduling wins at both
sizes, so the spectrum pipeline defaults to the jnp path (SURVEY.md §7
step 6: "keep whichever wins").  Both kernels match the float64 oracle
to 1.2e-8 and remain available for future Mosaic versions with batched
dot support.
"""

from __future__ import annotations

import functools
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MATMUL_PRECISION = "highest"  # Mosaic supports DEFAULT/HIGHEST only
LANES = 128


def supports(num_channels: int, fft_size: int) -> bool:
    return num_channels == 2 and fft_size % (2 * LANES) == 0


@lru_cache(maxsize=32)
def _fused_plan(n: int):
    """Factorization with N2 = 128 (full lane width) + DFT/twiddle tables."""
    n2 = LANES
    n1 = n // n2
    f1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    f1b = np.block([[f1.real, -f1.imag], [f1.imag, f1.real]])
    f2b = np.block([[f2.real, f2.imag], [-f2.imag, f2.real]])
    # reversal permutations: k1' = (N1-k1)%N1; k2' = N2-1-k2 (k1>0 rows)
    p1 = np.zeros((n1, n1), np.float32)
    for k1 in range(n1):
        p1[(n1 - k1) % n1, k1] = 1.0
    p2 = np.zeros((n2, n2), np.float32)
    for k2 in range(n2):
        p2[k2, n2 - 1 - k2] = 1.0
    p2b = np.zeros((n2, n2), np.float32)  # k1=0 row: k2' = (N2-k2)%N2
    for k2 in range(n2):
        p2b[k2, (n2 - k2) % n2] = 1.0
    return (n1, n2, f1b.astype(np.float32), f2b.astype(np.float32),
            tw.real.astype(np.float32), tw.imag.astype(np.float32),
            p1, p2, p2b)


def _mm(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=MATMUL_PRECISION,
                               preferred_element_type=jnp.float32)


def _kernel(n1, n2, fast_peaks, block_streams,
            x_ref, ts_ref, coeffs_ref, f1b_ref, f2b_ref, twr_ref, twi_ref,
            p1_ref, p2_ref, p2b_ref, g_ref, out_ref):
    g = g_ref[0]
    g2 = 1.0 - g

    for si in range(block_streams):
        _one_stream(si, n1, n2, fast_peaks, g, g2, x_ref, ts_ref, coeffs_ref,
                    f1b_ref, f2b_ref, twr_ref, twi_ref, p1_ref, p2_ref,
                    p2b_ref, out_ref)


def _one_stream(si, n1, n2, fast_peaks, g, g2,
                x_ref, ts_ref, coeffs_ref, f1b_ref, f2b_ref, twr_ref,
                twi_ref, p1_ref, p2_ref, p2b_ref, out_ref):
    re = x_ref[si, 0] * coeffs_ref[0]                     # [N1, N2] windowed
    im = x_ref[si, 1] * coeffs_ref[0]

    # FFT step 1: [2N1, 2N1] @ [2N1, N2]
    x2 = jnp.concatenate([re, im], axis=0)
    a2 = _mm(f1b_ref[:], x2)
    ar, ai = a2[:n1, :], a2[n1:, :]

    # twiddle
    br = ar * twr_ref[:] - ai * twi_ref[:]
    bi = ar * twi_ref[:] + ai * twr_ref[:]

    # FFT step 2: [N1, 2N2] @ [2N2, 2N2]
    b2 = jnp.concatenate([br, bi], axis=1)
    c2 = _mm(b2, f2b_ref[:])
    cr, ci = c2[:, :n2], c2[:, n2:]                       # Z in block coords

    # reversed-index partner V[k] = Z[(N-k) mod N] via permutation matmuls
    def reversed_blocks(c):
        main = _mm(p1_ref[:], _mm(c, p2_ref[:]))
        row0 = _mm(c[0:1, :], p2b_ref[:])
        row_ids = jax.lax.broadcasted_iota(jnp.int32, main.shape, 0)
        return jnp.where(row_ids == 0, row0, main)

    vr = reversed_blocks(cr)
    vi = reversed_blocks(ci)

    # unpack the channel pair (conjugate symmetry)
    x0r = 0.5 * (cr + vr)
    x0i = 0.5 * (ci - vi)
    x1r = 0.5 * (ci + vi)
    x1i = 0.5 * (vr - cr)
    m0 = jnp.sqrt(x0r * x0r + x0i * x0i)                  # [N1, N2]
    m1 = jnp.sqrt(x1r * x1r + x1i * x1i)

    # bins k < N/2 ⇔ k2 < N2/2; output layout [2, N2/2, N1]
    m0 = m0.T[:n2 // 2, :]
    m1 = m1.T[:n2 // 2, :]
    mag = jnp.stack([m0, m1], axis=0)

    # EMA (src/source_generic.cpp:124-132)
    old = ts_ref[si]
    if fast_peaks:
        old = jnp.maximum(mag, old)
    out_ref[si] = g * old + g2 * mag


@functools.partial(jax.jit, static_argnames=("fast_peaks", "interpret",
                                              "block_streams"))
def fused_window_fft_mag_ema(x: jnp.ndarray, tsmooth: jnp.ndarray,
                             coeffs: jnp.ndarray, g: jnp.ndarray,
                             fast_peaks: bool = False,
                             block_streams: int = 8,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused pass over ``x [S, 2, N]``; returns new tsmooth [S, 2, N//2].

    ``coeffs`` [N] window table; ``g`` scalar EMA retain factor.  Magnitude
    normalization (2/Σw) is folded into ``coeffs`` by the caller.
    """
    S, C, N = x.shape
    assert supports(C, N), "use the jnp path for this config"
    nbins = N // 2
    n1, n2, f1b, f2b, twr, twi, p1, p2, p2b = _fused_plan(N)
    bs = min(block_streams, S)
    assert S % bs == 0, "stream count must divide the block size"

    # block coordinates: samples [S,2,N1,N2]; bins [S,2,N2/2,N1]
    xb = x.astype(jnp.float32).reshape(S, 2, n1, n2)
    tsb = tsmooth.reshape(S, 2, n2 // 2, n1)
    cb = coeffs.astype(jnp.float32).reshape(1, n1, n2)

    vm = pltpu.VMEM
    kernel = functools.partial(_kernel, n1, n2, fast_peaks, bs)
    out = pl.pallas_call(
        kernel,
        grid=(S // bs,),
        in_specs=[
            pl.BlockSpec((bs, 2, n1, n2), lambda i: (i, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((bs, 2, n2 // 2, n1), lambda i: (i, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, n1, n2), lambda i: (0, 0, 0), memory_space=vm),
            pl.BlockSpec((2 * n1, 2 * n1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((2 * n2, 2 * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, n1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bs, 2, n2 // 2, n1), lambda i: (i, 0, 0, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((S, 2, n2 // 2, n1), jnp.float32),
        interpret=interpret,
    )(xb, tsb, cb, jnp.asarray(f1b), jnp.asarray(f2b), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(p2b),
      jnp.asarray([g], jnp.float32))
    return out.reshape(S, 2, nbins)


# ---------------------------------------------------------------------------
# Stream-packed variant: streams ride the matmul's N dimension
# ---------------------------------------------------------------------------

@lru_cache(maxsize=32)
def _packed_consts(n: int, bs: int):
    n1, n2, f1b, f2b, twr, twi, p1, p2, p2b = _fused_plan(n)
    # block-diagonal kron(I_bs, p1) applies the k1 reversal per stream when
    # streams are stacked along rows
    p1_big = np.kron(np.eye(bs, dtype=np.float32), p1)
    tw_tiled_r = np.tile(twr, (1, bs))   # [n1, bs*n2]
    tw_tiled_i = np.tile(twi, (1, bs))
    return n1, n2, f1b, f2b, tw_tiled_r, tw_tiled_i, p1_big, p2, p2b


def _packed_kernel(n1, n2, bs, fast_peaks,
                   x_ref, ts_ref, f1b_ref, f2b_ref, twr_ref, twi_ref,
                   p1_ref, p2_ref, p2b_ref, g_ref, out_ref):
    """x_ref: [2*n1, bs*n2] (streams packed along columns, re over im);
    ts/out: [bs*n1, n2] with stream-major rows, holding [k2<n2/2 valid]."""
    g = g_ref[0]
    g2 = 1.0 - g

    # step 1 for every stream at once: [2n1, 2n1] @ [2n1, bs*n2]
    a2 = _mm(f1b_ref[:], x_ref[:])
    ar, ai = a2[:n1, :], a2[n1:, :]                       # [n1, bs*n2]

    br = ar * twr_ref[:] - ai * twi_ref[:]
    bi = ar * twi_ref[:] + ai * twr_ref[:]

    # regroup to [bs*n1, 2n2]: row s*n1+k1 holds stream s's row k1
    br_rows = jnp.concatenate(
        [br[:, si * n2:(si + 1) * n2] for si in range(bs)], axis=0)
    bi_rows = jnp.concatenate(
        [bi[:, si * n2:(si + 1) * n2] for si in range(bs)], axis=0)
    b2 = jnp.concatenate([br_rows, bi_rows], axis=1)      # [bs*n1, 2n2]
    c2 = _mm(b2, f2b_ref[:])
    cr, ci = c2[:, :n2], c2[:, n2:]                       # [bs*n1, n2]

    def reversed_blocks(c):
        main = _mm(p1_ref[:], _mm(c, p2_ref[:]))          # per-stream reversal
        row0 = _mm(c, p2b_ref[:])
        row_ids = jax.lax.broadcasted_iota(jnp.int32, main.shape, 0)
        return jnp.where(row_ids % n1 == 0, row0, main)

    vr = reversed_blocks(cr)
    vi = reversed_blocks(ci)

    x0r = 0.5 * (cr + vr)
    x0i = 0.5 * (ci - vi)
    x1r = 0.5 * (ci + vi)
    x1i = 0.5 * (vr - cr)
    m0 = jnp.sqrt(x0r * x0r + x0i * x0i)                  # [bs*n1, n2]
    m1 = jnp.sqrt(x1r * x1r + x1i * x1i)

    old0, old1 = ts_ref[0], ts_ref[1]
    if fast_peaks:
        old0 = jnp.maximum(m0, old0)
        old1 = jnp.maximum(m1, old1)
    out_ref[0] = g * old0 + g2 * m0
    out_ref[1] = g * old1 + g2 * m1


@functools.partial(jax.jit, static_argnames=("fast_peaks", "interpret",
                                             "block_streams"))
def fused_packed(x: jnp.ndarray, tsmooth: jnp.ndarray, coeffs: jnp.ndarray,
                 g: jnp.ndarray, fast_peaks: bool = False,
                 block_streams: int = 16,
                 interpret: bool = False) -> jnp.ndarray:
    """Stream-column-packed fused pass; same contract as
    :func:`fused_window_fft_mag_ema` (x [S,2,N] → tsmooth' [S,2,N//2])."""
    S, C, N = x.shape
    assert supports(C, N)
    nbins = N // 2
    bs = min(block_streams, S)
    assert S % bs == 0
    n1, n2, f1b, f2b, twr, twi, p1b, p2, p2b = _packed_consts(N, bs)

    # pack: window on the flat axis, then [S,2,n1,n2] → [2*n1, S*n2]
    xw = x.astype(jnp.float32) * coeffs.astype(jnp.float32)
    xb = xw.reshape(S, 2, n1, n2)
    packed = jnp.concatenate([xb[:, 0], xb[:, 1]], axis=1)   # [S, 2n1, n2]
    packed = jnp.swapaxes(packed, 0, 1).reshape(2 * n1, S * n2)

    # state layout: [2, S*n1, n2] rows stream-major; bins k=(k1 + n1*k2),
    # valid k2 < n2/2 — caller keeps tsmooth flat [S,2,nbins]
    ts = tsmooth.reshape(S, 2, n2 // 2, n1)                  # [.., k2, k1]
    ts_rows = jnp.swapaxes(ts, -1, -2)                       # [S, 2, n1, n2/2]
    ts_rows = jnp.pad(ts_rows, ((0, 0), (0, 0), (0, 0), (0, n2 - n2 // 2)))
    ts_rows = jnp.swapaxes(ts_rows, 0, 1).reshape(2, S * n1, n2)

    vm = pltpu.VMEM
    kernel = functools.partial(_packed_kernel, n1, n2, bs, fast_peaks)
    out = pl.pallas_call(
        kernel,
        grid=(S // bs,),
        in_specs=[
            pl.BlockSpec((2 * n1, bs * n2), lambda i: (0, i), memory_space=vm),
            pl.BlockSpec((2, bs * n1, n2), lambda i: (0, i, 0),
                         memory_space=vm),
            pl.BlockSpec((2 * n1, 2 * n1), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((2 * n2, 2 * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((bs * n1, bs * n1), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n2, n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((2, bs * n1, n2), lambda i: (0, i, 0),
                               memory_space=vm),
        out_shape=jax.ShapeDtypeStruct((2, S * n1, n2), jnp.float32),
        interpret=interpret,
    )(packed, ts_rows, jnp.asarray(f1b), jnp.asarray(f2b), jnp.asarray(twr),
      jnp.asarray(twi), jnp.asarray(p1b), jnp.asarray(p2), jnp.asarray(p2b),
      jnp.asarray([g], jnp.float32))

    # unpack [2, S*n1, n2] → [S, 2, nbins]
    out = out.reshape(2, S, n1, n2)[..., :n2 // 2]
    out = jnp.swapaxes(out, -1, -2)                          # [2, S, k2, k1]
    out = jnp.swapaxes(out, 0, 1).reshape(S, 2, nbins)
    return out
