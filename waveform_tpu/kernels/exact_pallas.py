"""Pallas exact-FFT core: the digit-sliced GEMM FFT in one VMEM pass.

The XLA lowering of kernels/exactfft.py is HBM-bound, not MXU-bound:
measured on v5e at S=256/N=4096 the digit slicing alone costs ~600 µs/tick
because each of the 4 serially-dependent round/subtract iterations and each
of the 10 digit-pair GEMM partials round-trips an [S, 2N1, N2] tensor
through HBM.  This kernel keeps the whole exact pipeline — per-block pow2
scaling, digit slicing, the weight-class GEMMs, compensated recombination,
the double-float twiddle, and the second stage — resident in VMEM, reading
the windowed df32 input once and writing the df32 spectrum once.

Layout follows kernels/fused_spectrum.py's stream-packed variant (streams
ride the matmul's lane dimension; Mosaic's 2D-dot restriction shapes both):

    in  : x2 (hi, lo)  [2N1, S·N2]   — [re; im] rows, stream-s columns
    out : c  (hi, lo)  [S·N1, 2N2]   — stream-major rows, [C_r | C_i]

Digit dots run at DEFAULT (single-pass bf16) precision: digit values are
integers ≤ 64, exactly representable in bf16; MXU products are exact and
every partial sum is an integer < 2^24, exact in the f32 accumulator — the
same invariant as the XLA path (kernels/exactfft.py module docstring).
The conjugate-symmetry unpack and magnitude stay in XLA (exact index math;
a one-hot matmul inside Mosaic would round f32 values at DEFAULT precision
and cost 6-pass matmuls at HIGHEST).

Used automatically by rfft_mag_exact for supported configs on TPU
(MAX_T == 3, both FFT factors multiples of 8); WAVEFORM_TPU_EXACT_KERNEL
= never | auto forces it off.
"""

from __future__ import annotations

import functools
import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .exactfft import DIGIT_BITS, FIRST_SHIFT, MAX_T, two_sum

_N_DIGITS = MAX_T + 1   # digits that participate in kept pairs
_LANES = 128            # N2 fixed to the lane width: per-stream column
                        # slices stay register-aligned (Mosaic rejects
                        # concatenation of lane-offset slices)


def _factors(n: int) -> tuple[int, int]:
    return n // _LANES, _LANES


def supports(n: int) -> bool:
    """Kernel preconditions: the default term budget, MXU-friendly factor
    sizes (N1 a sublane multiple at N2 = 128 lanes), and VMEM-resident
    stage-1 constants — at N=65536 the four [2N1, 2N1] digit planes alone
    are 16 MB (the whole VMEM), so 64k windows use the XLA lowering."""
    return (MAX_T == 3 and n % _LANES == 0 and (n // _LANES) % 8 == 0
            and n <= 32768)


def _block_streams(n: int) -> int:
    """Streams per grid block, sized to keep ~12 [2N1, bs·N2] f32 planes
    under the VMEM budget."""
    for bs in (16, 8, 4, 2, 1):
        if 96 * n * bs <= 9_000_000:
            return bs
    return 1


@lru_cache(maxsize=16)
def _kernel_plan(n: int, bs: int):
    """Digit planes of the DFT block matrices + tiled df twiddles (host)."""
    n1, n2 = _factors(n)
    f1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    f1b = np.block([[f1.real, -f1.imag], [f1.imag, f1.real]])
    f2b = np.block([[f2.real, f2.imag], [-f2.imag, f2.real]])

    def digit_planes(a64):
        out = np.empty((_N_DIGITS,) + a64.shape, np.float32)
        r = a64.astype(np.float64)
        for k in range(_N_DIGITS):
            sc = 2.0 ** (FIRST_SHIFT + DIGIT_BITS * k)
            d = np.rint(r * sc)
            out[k] = d.astype(np.float32)
            r = r - d / sc
        return out

    def stacked_classes(planes, axis):
        """Per-weight-class stacked constants: class t is
        [C_0 | C_1 | .. | C_t] along the contraction axis, so each class
        runs as ONE dot whose K is (t+1)x deeper — stage-1 K was 2N1
        (64 at N=4096), only a quarter of the MXU's 256-deep pipe.
        Classes concatenate into one array; the kernel slices statically."""
        return np.concatenate(
            [planes[i] for t in range(_N_DIGITS) for i in range(t + 1)],
            axis=axis)

    def df_tiled(a64):
        hi = a64.astype(np.float32)
        lo = (a64 - hi.astype(np.float64)).astype(np.float32)
        return np.tile(hi, (1, bs)), np.tile(lo, (1, bs))

    twr_hi, twr_lo = df_tiled(tw.real)
    twi_hi, twi_lo = df_tiled(tw.imag)
    # stage 1 is C @ X (contract on C's columns); stage 2 is X @ C
    # (contract on C's rows)
    return (n1, n2,
            stacked_classes(digit_planes(f1b), axis=1),
            stacked_classes(digit_planes(f2b), axis=0),
            twr_hi, twr_lo, twi_hi, twi_lo)


def _pow2_scale_scalar(hi):
    """Power-of-two scale >= max|hi| (exp2 of an integer float is exact; a
    one-off log2 misrounding only widens digit range to <=128, still exact
    in bf16)."""
    m = jnp.max(jnp.abs(hi))
    e = jnp.ceil(jnp.log2(jnp.maximum(m, jnp.float32(1e-30)))) + 1.0
    return jnp.exp2(e), jnp.exp2(-e)


def _slice4(hi, lo, s_inv):
    """4-digit slice of a df32 block scaled to [-1, 1] (VMEM-resident).

    Digits come out as bf16: the values are integers <= 64, exactly
    representable, and bf16 operands keep the MXU dots single-pass —
    f32 operands at DEFAULT precision lower to the 3-pass bf16x3
    schedule (measured 2.0x end-to-end on the N=16384 kernel)."""
    r = hi * s_inv
    digits = []
    for k in range(_N_DIGITS):
        if k == 3:
            r = r + lo * s_inv
        sc = jnp.float32(2.0 ** (FIRST_SHIFT + DIGIT_BITS * k))
        d = jnp.round(r * sc)
        digits.append(d.astype(jnp.bfloat16))
        r = r - d / sc
    return digits


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _digit_stage(const_ref, digits, s, left: bool):
    """Weight-class GEMMs + compensated recombination (VMEM).

    ``const_ref`` holds the class-stacked DFT block matrix digits (bf16,
    see ``stacked_classes``); ``left`` selects C @ X vs X @ C.  Class t
    is ONE dot: [C_0..C_t] against [X_t;..;X_0] stacked along K — deeper
    MXU pipes and 4 dots/stage instead of 10.  Exact: stacked integer
    partial sums stay <= 4*256*2^12 = 2^22 < 2^24 in the f32
    accumulator.  Mirrors exactfft._digit_gemm for MAX_T=3.
    """
    k1 = digits[0].shape[0 if left else 1]   # single-plane K
    dots = []
    off = 0
    for t in range(_N_DIGITS):
        w = (t + 1) * k1
        xcat = jnp.concatenate([digits[t - i] for i in range(t + 1)],
                               axis=0 if left else 1) if t else digits[0]
        if left:
            g = _dot(const_ref[:, off:off + w], xcat)
        else:
            g = _dot(xcat, const_ref[off:off + w, :])
        off += w
        dots.append(g)

    def weighted(t, v):
        return v * (jnp.float32(2.0 ** -(2 * FIRST_SHIFT + DIGIT_BITS * t))
                    * s)

    v0 = weighted(0, dots[0])
    tail = weighted(3, dots[3])
    tail = tail + weighted(2, dots[2])
    tail = tail + weighted(1, dots[1])
    return two_sum(v0, tail)


def _core(n1, n2, bs, x_hi, x_lo, f1d_ref, f2d_ref,
          twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
          c_hi_ref, c_lo_ref):
    """Both FFT stages + twiddle on a VMEM-resident df32 block.

    ``x_hi/x_lo``: [2n1, bs*n2] windowed df32 input ([x_r; x_i] rows,
    stream-s columns).  Writes the df32 spectrum to ``c_hi/lo_ref``."""
    # ---- stage 1: A = F1b @ [x_r; x_i], digit-exact --------------------
    s, s_inv = _pow2_scale_scalar(x_hi)
    digits = _slice4(x_hi, x_lo, s_inv)
    a_hi, a_lo = _digit_stage(f1d_ref, digits, s, left=True)

    ar = (a_hi[:n1, :], a_lo[:n1, :])          # [n1, bs*n2] df
    ai = (a_hi[n1:, :], a_lo[n1:, :])

    # ---- double-float twiddle (Dekker TwoProd, no fma) -----------------
    twr = (twr_hi_ref[:], twr_lo_ref[:])
    twi = (twi_hi_ref[:], twi_lo_ref[:])

    def df_mul(x, y):
        p = x[0] * y[0]
        c = jnp.float32(4097.0)
        tx = c * x[0]
        xh = tx - (tx - x[0])
        xl = x[0] - xh
        ty = c * y[0]
        yh = ty - (ty - y[0])
        yl = y[0] - yh
        e = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
        e = e + (x[0] * y[1] + x[1] * y[0])
        return two_sum(p, e)

    def df_add(x, y):
        s0, e = two_sum(x[0], y[0])
        return two_sum(s0, e + (x[1] + y[1]))

    br = df_add(df_mul(ar, twr), (lambda m: (-m[0], -m[1]))(df_mul(ai, twi)))
    bi = df_add(df_mul(ar, twi), df_mul(ai, twr))

    # ---- regroup to stream-major rows: [bs*n1, 2n2] --------------------
    def rows(a):
        return jnp.concatenate(
            [a[:, si * n2:(si + 1) * n2] for si in range(bs)], axis=0)

    b_hi = jnp.concatenate([rows(br[0]), rows(bi[0])], axis=1)
    b_lo = jnp.concatenate([rows(br[1]), rows(bi[1])], axis=1)

    # ---- stage 2: C = B @ F2b, digit-exact ------------------------------
    s2, s2_inv = _pow2_scale_scalar(b_hi)
    digits2 = _slice4(b_hi, b_lo, s2_inv)
    c_hi, c_lo = _digit_stage(f2d_ref, digits2, s2, left=False)
    c_hi_ref[:] = c_hi
    c_lo_ref[:] = c_lo


def _kernel(n1, n2, bs, x_hi_ref, x_lo_ref, f1d_ref, f2d_ref,
            twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
            c_hi_ref, c_lo_ref):
    _core(n1, n2, bs, x_hi_ref[:], x_lo_ref[:], f1d_ref, f2d_ref,
          twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
          c_hi_ref, c_lo_ref)


def _kernel_fused(n1, n2, bs, x_ref, w_hi_ref, w_lo_ref, sel_ref,
                  f1d_ref, f2d_ref,
                  twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
                  c_hi_ref, c_lo_ref, nz_ref):
    """Raw-input variant: pack + df window multiply + silence reduction
    all VMEM-resident.

    ``x_ref``: [bs, 2, n1, n2] RAW f32 samples (stream, channel, block row,
    lane) — a zero-copy reshape of the serving ring's [S, C, N] window, so
    the XLA-side pack fusions and the separate windowed hi/lo HBM arrays
    (four extra [S, 2N1, N2] round-trips per tick) disappear.
    ``w_hi/lo_ref``: [2n1, bs*n2] pre-tiled df32 window (same window on
    both channel halves).  ``sel_ref``: [bs*n2, bs] 0/1 lane-group selector
    (bf16) — the per-stream silence reduction rides one tiny MXU dot over
    data already in VMEM instead of an [S, C, N] HBM re-scan.
    ``nz_ref``: [1, 2, bs] f32 nonzero counts per (channel, stream).
    """
    xcat = jnp.concatenate(
        [jnp.concatenate([x_ref[si, c] for si in range(bs)], axis=1)
         for c in (0, 1)], axis=0)                     # [2n1, bs*n2] raw

    # silence scan on the RAW samples (reference semantics: pre-window,
    # src/source_generic.cpp:63-66): counts are exact — 0/1 mask values and
    # integer partial sums <= n2 per dot lane, n1*n2 per channel total
    mask = (xcat != 0.0).astype(jnp.bfloat16)
    counts = _dot(mask, sel_ref[:])                    # [2n1, bs] f32 exact
    nz_ref[0] = jnp.concatenate(
        [jnp.sum(counts[:n1], axis=0, keepdims=True),
         jnp.sum(counts[n1:], axis=0, keepdims=True)], axis=0)

    # df window multiply (TwoProd + low-word correction), in VMEM
    p = xcat * w_hi_ref[:]
    c4 = jnp.float32(4097.0)
    t = c4 * xcat
    xh = t - (t - xcat)
    xl = xcat - xh
    t = c4 * w_hi_ref[:]
    wh = t - (t - w_hi_ref[:])
    wl = w_hi_ref[:] - wh
    e = ((xh * wh - p) + xh * wl + xl * wh) + xl * wl
    x_hi, x_lo = two_sum(p, e + xcat * w_lo_ref[:])

    _core(n1, n2, bs, x_hi, x_lo, f1d_ref, f2d_ref,
          twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
          c_hi_ref, c_lo_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def cfft_exact_packed(x2_hi: jnp.ndarray, x2_lo: jnp.ndarray,
                      interpret: bool = False):
    """Exact complex FFT core on packed blocks.

    ``x2_hi/lo``: [S, 2N1, N2] df32 ([x_r; x_i] rows per stream).
    Returns ``(c_hi, c_lo)`` [S, N1, 2N2] — [C_r | C_i] in block coords
    (bin k = k1 + N1·k2).
    """
    S, two_n1, n2 = x2_hi.shape
    n1 = two_n1 // 2
    n = n1 * n2
    bs = _block_streams(n)
    while S % bs:
        bs //= 2
    (n1, n2, f1d, f2d, twr_hi, twr_lo, twi_hi, twi_lo) = _kernel_plan(n, bs)

    # pack streams along columns: [2N1, S*N2]
    def packed(a):
        return jnp.swapaxes(a, 0, 1).reshape(two_n1, S * n2)

    xp_hi, xp_lo = packed(x2_hi), packed(x2_lo)

    vm = pltpu.VMEM
    kernel = functools.partial(_kernel, n1, n2, bs)
    c_hi, c_lo = pl.pallas_call(
        kernel,
        grid=(S // bs,),
        in_specs=[
            pl.BlockSpec((two_n1, bs * n2), lambda i: (0, i),
                         memory_space=vm),
            pl.BlockSpec((two_n1, bs * n2), lambda i: (0, i),
                         memory_space=vm),
            pl.BlockSpec((two_n1, 10 * two_n1), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((10 * 2 * n2, 2 * n2), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((bs * n1, 2 * n2), lambda i: (i, 0),
                         memory_space=vm),
            pl.BlockSpec((bs * n1, 2 * n2), lambda i: (i, 0),
                         memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S * n1, 2 * n2), jnp.float32),
            jax.ShapeDtypeStruct((S * n1, 2 * n2), jnp.float32),
        ],
        interpret=interpret,
    )(xp_hi, xp_lo,
      jnp.asarray(f1d, jnp.bfloat16), jnp.asarray(f2d, jnp.bfloat16),
      jnp.asarray(twr_hi), jnp.asarray(twr_lo),
      jnp.asarray(twi_hi), jnp.asarray(twi_lo))

    return (c_hi.reshape(S, n1, 2 * n2), c_lo.reshape(S, n1, 2 * n2))


@lru_cache(maxsize=16)
def _lane_selector(n2: int, bs: int) -> np.ndarray:
    """[bs*n2, bs] 0/1 matrix: column s sums stream s's lane group."""
    sel = np.zeros((bs * n2, bs), np.float32)
    for s in range(bs):
        sel[s * n2:(s + 1) * n2, s] = 1.0
    return sel


@functools.partial(jax.jit, static_argnames=("interpret",))
def cfft_exact_packed_fused(x4: jnp.ndarray, w_hi: jnp.ndarray,
                            w_lo: jnp.ndarray, interpret: bool = False):
    """Exact FFT core on RAW channel-pair windows (+ silence counts).

    ``x4``: [S, 2, N1, N2] f32 raw samples (channel 0 rides the real part,
    channel 1 the imaginary — conjugate-symmetry pair packing).
    ``w_hi/w_lo``: [N] df32 window coefficient tables (pass ones/zeros for
    no window).  Returns ``(c_hi, c_lo, nzcount)`` — the df32 spectrum in
    block coords as :func:`cfft_exact_packed`, plus per-(stream, channel)
    raw-sample nonzero counts [S, 2] f32 (``> 0`` is the reference's
    silence-scan predicate, src/source_generic.cpp:63-66).
    """
    S, _, n1, n2 = x4.shape
    n = n1 * n2
    bs = _block_streams(n)
    while S % bs:
        bs //= 2
    (n1, n2, f1d, f2d, twr_hi, twr_lo, twi_hi, twi_lo) = _kernel_plan(n, bs)

    def wtile(w):
        return jnp.tile(w.reshape(n1, n2), (2, bs))    # [2n1, bs*n2]

    vm = pltpu.VMEM
    kernel = functools.partial(_kernel_fused, n1, n2, bs)
    two_n1 = 2 * n1
    c_hi, c_lo, nz = pl.pallas_call(
        kernel,
        grid=(S // bs,),
        in_specs=[
            pl.BlockSpec((bs, 2, n1, n2), lambda i: (i, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((two_n1, bs * n2), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((two_n1, bs * n2), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((bs * n2, bs), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((two_n1, 10 * two_n1), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((10 * 2 * n2, 2 * n2), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
            pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((bs * n1, 2 * n2), lambda i: (i, 0),
                         memory_space=vm),
            pl.BlockSpec((bs * n1, 2 * n2), lambda i: (i, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 2, bs), lambda i: (i, 0, 0), memory_space=vm),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S * n1, 2 * n2), jnp.float32),
            jax.ShapeDtypeStruct((S * n1, 2 * n2), jnp.float32),
            jax.ShapeDtypeStruct((S // bs, 2, bs), jnp.float32),
        ],
        interpret=interpret,
    )(x4, wtile(w_hi), wtile(w_lo),
      jnp.asarray(_lane_selector(n2, bs), jnp.bfloat16),
      jnp.asarray(f1d, jnp.bfloat16), jnp.asarray(f2d, jnp.bfloat16),
      jnp.asarray(twr_hi), jnp.asarray(twr_lo),
      jnp.asarray(twi_hi), jnp.asarray(twi_lo))

    return (c_hi.reshape(S, n1, 2 * n2), c_lo.reshape(S, n1, 2 * n2),
            jnp.swapaxes(nz, 1, 2).reshape(S, 2))


def cfft_exact_kernel_fused(x, window=None, interpret: bool = False):
    """Raw channel-pair FFT: [..., 2, N] f32 -> ((cr), (ci), nz).

    Drop-in upstream of exactfft.rfft_pair_mag_exact's windowing: applies
    the df32 window in VMEM and returns the df32 spectrum plus the
    per-channel raw-sample nonzero predicate [..., 2] (bool).
    """
    shp = x.shape[:-2]
    n = x.shape[-1]
    n1, n2 = _factors(n)
    S = int(np.prod(shp)) if shp else 1
    if window is None:
        w_hi = jnp.ones((n,), jnp.float32)
        w_lo = jnp.zeros((n,), jnp.float32)
    else:
        w_hi, w_lo = window
    x4 = x.reshape(S, 2, n1, n2)
    c_hi, c_lo, nzc = cfft_exact_packed_fused(x4, w_hi, w_lo,
                                              interpret=interpret)

    def fin(a, sl):
        return jnp.swapaxes(a[..., sl], -1, -2).reshape(*shp, n)

    cr = (fin(c_hi, slice(0, n2)), fin(c_lo, slice(0, n2)))
    ci = (fin(c_hi, slice(n2, None)), fin(c_lo, slice(n2, None)))
    return cr, ci, (nzc > 0).reshape(*shp, 2)


def cfft_exact_kernel(re, im, interpret: bool = False):
    """Drop-in for exactfft.cfft_exact on supported sizes (df32 in/out)."""
    if not isinstance(re, tuple):
        re = (re, jnp.zeros_like(re))
    if not isinstance(im, tuple):
        im = (im, jnp.zeros_like(im))
    shp = re[0].shape[:-1]
    n = re[0].shape[-1]
    n1, n2 = _factors(n)
    S = int(np.prod(shp)) if shp else 1

    def blk(a):
        return a.reshape(S, n1, n2)

    x2_hi = jnp.concatenate([blk(re[0]), blk(im[0])], axis=-2)
    x2_lo = jnp.concatenate([blk(re[1]), blk(im[1])], axis=-2)
    c_hi, c_lo = cfft_exact_packed(x2_hi, x2_lo, interpret=interpret)

    def fin(a, sl):
        # [S, n1, n2] block coords -> flat bins k = k1 + n1*k2
        return jnp.swapaxes(a[..., sl], -1, -2).reshape(*shp, n)

    cr = (fin(c_hi, slice(0, n2)), fin(c_lo, slice(0, n2)))
    ci = (fin(c_hi, slice(n2, None)), fin(c_lo, slice(n2, None)))
    return cr, ci


def enabled() -> bool:
    """Kernel policy: on for TPU unless WAVEFORM_TPU_EXACT_KERNEL=never
    (set =always to force it on CPU interpret-style lowering)."""
    mode = os.environ.get("WAVEFORM_TPU_EXACT_KERNEL", "auto")
    if mode == "never":
        return False
    if mode == "always":
        return True
    return jax.default_backend() == "tpu"
