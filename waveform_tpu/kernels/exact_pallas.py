"""Pallas exact-FFT core: the digit-sliced GEMM FFT in one VMEM pass.

The XLA lowering of kernels/exactfft.py is HBM-bound, not MXU-bound:
measured on v5e at S=256/N=4096 the digit slicing alone costs ~600 µs/tick
because each of the 4 serially-dependent round/subtract iterations and each
of the 10 digit-pair GEMM partials round-trips an [S, 2N1, N2] tensor
through HBM.  This kernel keeps the whole exact pipeline — per-LANE pow2
scaling (see _pow2_scale_axis: a corrupted stream cannot zero its
blockmates' digits), digit slicing, the weight-class GEMMs, compensated
recombination, the double-float twiddle, and the second stage — resident in
VMEM, reading the windowed df32 input once and writing the df32 spectrum
once.

Layout packs streams along the matmul's lane dimension (Mosaic's 2D-dot
restriction shapes both operand layouts):

    in  : x2 (hi, lo)  [2N1, S·N2]   — [re; im] rows, stream-s columns
    out : c  (hi, lo)  [S·N1, 2N2]   — stream-major rows, [C_r | C_i]

Digit dots run at DEFAULT (single-pass bf16) precision: digit values are
integers ≤ 64, exactly representable in bf16; MXU products are exact and
every partial sum is an integer < 2^24, exact in the f32 accumulator — the
same invariant as the XLA path (kernels/exactfft.py module docstring).

The production serving path uses :func:`rfft_pair_mag_kernel` — a
REAL-SPLIT formulation (see _kernel_plan_real) that consumes the raw
[S, C, N] ring window directly and emits kept-half |rFFT| magnitudes plus
the per-channel silence predicate, all VMEM-resident: no packed hi/lo HBM
arrays, no conjugate-symmetry unpack, 8x smaller kernel output.
:func:`cfft_exact_kernel` (df32 complex in/out) remains for mono channels
and as the direct analog of exactfft.cfft_exact.

Used automatically by rfft_mag_exact for supported configs on TPU
(MAX_T == 3, both FFT factors multiples of 8); WAVEFORM_TPU_EXACT_KERNEL
= never | auto forces it off, WAVEFORM_TPU_EXACT_FUSED = never keeps the
kernel but routes around the real-split fused path (ablation).
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

from .exactfft import (
    DIGIT_BITS,
    FIRST_SHIFT,
    MAX_T,
    _windowed_df,
    df_add,
    df_mul,
    df_neg,
    two_sum,
)

_N_DIGITS = MAX_T + 1   # digits that participate in kept pairs
_LANES = 128            # N2 fixed to the lane width: per-stream column
                        # slices stay register-aligned (Mosaic rejects
                        # concatenation of lane-offset slices)


def _factors(n: int) -> tuple[int, int]:
    return n // _LANES, _LANES


def _stage1_split(n: int) -> int:
    """Row-side factorization of the kernel's stage 1: 2 = one dense
    [N1, N1] digit dot (constants quadratic in N1); 3 = N1 = a·4 with an
    exact radix-4 layer + twiddle-folded dense [a, a] digit dots
    (constants quadratic in a = N1/4 — 16x smaller), which is what fits
    N=65536 in VMEM.  Resolution order: WAVEFORM_TPU_STAGE1_SPLIT=2|3
    env override, then a measured plan entry (utils/plans.py — the FFTW
    measure-and-pick analog), then the heuristic default (3-factor from
    N=32768 up, where the 2-factor constants crowd out stream
    blocking)."""
    mode = os.environ.get("WAVEFORM_TPU_STAGE1_SPLIT", "auto")
    if mode in ("2", "3"):
        return int(mode)
    from ..utils.plans import plan_for
    p = plan_for(n)
    if p is not None and p.get("split") in (2, 3):
        split = p["split"]
        n1 = n // _LANES
        if (split == 2 and n <= 32768) or (split == 3 and n1 % 32 == 0):
            return split
    return 3 if n >= 32768 else 2


def _default_geometry() -> bool:
    """The kernel is built for the default digit geometry ONLY: _slice4
    hardcodes the k==3 low-word join and the exact-f32-accumulation bound
    (class-3 stacked dots at N=65536 contract 2048 rows of products up to
    2^(2*(DIGIT_BITS-1)); 2048*2^12 = 2^23 < 2^24 holds at 7 bits but
    breaks at 8).  A WAVEFORM_TPU_DIGIT_BITS/FIRST_SHIFT/MAXT ablation
    must therefore fall back to the XLA lowering, whose _digit_gemm
    enforces the bound with a loud ValueError instead of silently
    rounding on the MXU."""
    return MAX_T == 3 and DIGIT_BITS == 7 and FIRST_SHIFT == 6


def supports(n: int, split: int | None = None) -> bool:
    """Kernel preconditions: the default term budget and MXU-friendly
    factor sizes — N1 = n/128 a sublane multiple (and, for the 3-factor
    stage 1 that large sizes need, a = N1/4 a sublane multiple).  The
    3-factor split keeps stage-1 constants quadratic only in N1/4, which
    admits N=65536 (the 2-factor's four [2N1, 2N1] digit planes alone
    would be 16 MB there — the whole VMEM).  ``split`` checks a specific
    stage-1 split (the plan tuner probes both); default resolves the
    env/plan/heuristic choice."""
    if not (_default_geometry() and n % _LANES == 0
            and (n // _LANES) % 8 == 0):
        return False
    if (split if split in (2, 3) else _stage1_split(n)) == 2:
        return n <= 32768
    return (n // _LANES) % 32 == 0 and n <= 65536


def supports_cfft(n: int) -> bool:
    """The complex (mono-channel) kernel still runs the 2-factor stage 1
    — complex chunks double the 3-factor constants again, and mono 64k is
    an edge case — so it keeps the 2-factor VMEM ceiling; above it the
    XLA exact lowering serves (correct, slower)."""
    return (_default_geometry() and n % _LANES == 0
            and (n // _LANES) % 8 == 0 and n <= 32768)


def _vmem_terms(n: int, split: int) -> tuple[int, int]:
    """(constant, per-block-stream) VMEM byte estimates for the kernel."""
    n1 = n // _LANES
    if split == 3:
        # F_ab stacked [2a, 10·2a] bf16 (a = n1/4) + f2/selector slack;
        # the radix-4 layer adds the column-concat working set (W, its
        # digits, the class-dot output), ~160 B/sample-block total
        return 5 * n1 * n1 + 700_000, 160 * n + 24 * n
    return 160 * n1 * n1 + 700_000, 96 * n  # f1 digit planes + f2 slack


def _bs_cap(n: int, split: int, ddt: str) -> int:
    """Hard cap on streams per block for one measured compiler quirk:
    the 2-factor int8 kernel at bs=16 / N=8192 CRASHES the Mosaic
    compiler (tpu_compile_helper exit 1, reproduced 4x on v5e) while
    bf16 at the same shape and int8 at bs=8 both compile."""
    return 8 if (ddt == "int8" and split == 2 and n == 8192) else 64


def admits_bs(n: int, bs: int, split: int | None = None,
              ddt: str = "bf16") -> bool:
    """Whether a block of ``bs`` streams fits the kernel's VMEM budget
    (and dodges the pinned compiler quirk) — the plan tuner's candidate
    gate for the bs dimension."""
    if split is None:
        split = _stage1_split(n)
    const, per_bs = _vmem_terms(n, split)
    return bs <= _bs_cap(n, split, ddt) and \
        per_bs * bs + const <= 15_500_000


def _block_streams(n: int, split: int | None = None,
                   ddt: str = "bf16", want: int | None = None) -> int:
    """Streams per grid block, sized to keep ~12 [2N1, bs·N2] f32 working
    planes PLUS the resident constants under the VMEM budget.  The
    class-stacked stage-1 digit planes are quadratic in N1
    ([4N1, 10·2N1] bf16 = 160·N1² bytes — 10.5 MB alone at N=32768),
    which the per-stream term alone missed: bs=2 at N=32768 was a 21 MB
    scoped-vmem OOM on v5e.

    ``want`` requests a specific block size (clamped to the VMEM gate);
    without it, a measured plan entry's "bs" applies, else the default
    ceiling of 16 (bs=32 wins only where measured — the tuner probes it,
    utils/plans.py)."""
    n1 = n // _LANES
    if split is None:
        split = _stage1_split(n)
    if want is None:
        from ..utils.plans import plan_for
        p = plan_for(n)
        if p is not None and isinstance(p.get("bs"), int):
            want = int(p["bs"])
    ceiling = min(want if want else 16, _bs_cap(n, split, ddt))
    const, per_bs = _vmem_terms(n, split)
    # 15.5 MB measured-usable VMEM on v5e (16 MB minus Mosaic runtime
    # overhead): bs=1 at N=32768 (14.3 MB estimate) must pass the gate
    # itself, not fall through it — growth in kernel constants then fails
    # loudly here instead of OOMing at compile time
    for bs in (64, 32, 16, 8, 4, 2, 1):
        if bs > ceiling:
            continue
        if per_bs * bs + const <= 15_500_000:
            return bs
    raise ValueError(
        f"exact kernel working set exceeds VMEM even at bs=1 for N={n} "
        f"(estimate {(per_bs + const) / 1e6:.1f} MB); supports() should "
        "have excluded this size")


def _vsplit_host(a_f32: np.ndarray) -> np.ndarray:
    """Veltkamp-high of an f32 array in f32 arithmetic — the exact split
    the kernel's two_prod would compute; hoisting it to the host deletes
    four VPU ops per twiddle element per tick.  ONE copy shared by both
    real-split plan builders (Dekker products are only valid against this
    exact split)."""
    c = np.float32(4097.0)
    t = (c * a_f32).astype(np.float32)
    return (t - (t - a_f32).astype(np.float32)).astype(np.float32)


def _digit_planes(a64):
    """f64 constant -> _N_DIGITS integer digit planes (f32 storage)."""
    out = np.empty((_N_DIGITS,) + a64.shape, np.float32)
    r = a64.astype(np.float64)
    for k in range(_N_DIGITS):
        sc = 2.0 ** (FIRST_SHIFT + DIGIT_BITS * k)
        d = np.rint(r * sc)
        out[k] = d.astype(np.float32)
        r = r - d / sc
    return out


def _stacked_classes(planes, axis):
    """Per-weight-class stacked constants: class t is
    [C_0 | C_1 | .. | C_t] along the contraction axis, so each class
    runs as ONE dot whose K is (t+1)x deeper — stage-1 K was 2N1
    (64 at N=4096), only a quarter of the MXU's 256-deep pipe.
    Classes concatenate into one array; the kernel slices statically."""
    return np.concatenate(
        [planes[i] for t in range(_N_DIGITS) for i in range(t + 1)],
        axis=axis)


def _df_tiled(a64, bs):
    """f64 constant -> bs-column-tiled df32 (hi, lo) pair."""
    hi = a64.astype(np.float32)
    lo = (a64 - hi.astype(np.float64)).astype(np.float32)
    return np.tile(hi, (1, bs)), np.tile(lo, (1, bs))


@lru_cache(maxsize=16)
def _kernel_plan(n: int, bs: int):
    """Digit planes of the DFT block matrices + tiled df twiddles (host)."""
    n1, n2 = _factors(n)
    f1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    f1b = np.block([[f1.real, -f1.imag], [f1.imag, f1.real]])
    f2b = np.block([[f2.real, f2.imag], [-f2.imag, f2.real]])

    twr_hi, twr_lo = _df_tiled(tw.real, bs)
    twi_hi, twi_lo = _df_tiled(tw.imag, bs)
    # stage 1 is C @ X (contract on C's columns); stage 2 is X @ C
    # (contract on C's rows)
    return (n1, n2,
            _stacked_classes(_digit_planes(f1b), axis=1),
            _stacked_classes(_digit_planes(f2b), axis=0),
            twr_hi, twr_lo, twi_hi, twi_lo)


def _pow2_scale_axis(hi, axis: int):
    """Per-lane power-of-two scales varying along ``axis``: |hi| reduces
    over the other axis, then the exponent bound runs elementwise so
    scaled values stay in [-1, 1] per lane and plane-0 digits stay
    <= 2^FIRST_SHIFT.  The +1 margin makes the bound robust: even if
    log2 misrounds by a full ulp, ceil(log2 m) + 1 > log2 m, so s >= m
    always (exp2 of an integer float is exact).

    Valid because every dot-product partial sum touches exactly ONE
    column of the data operand in stage 1 (C @ X sums over rows of X's
    column j) and exactly ONE row in stage 2 (X @ C sums over row i's
    columns), so all products in a sum share their lane's scale and the
    digit bounds (plane 0 <= 2^FIRST_SHIFT, later planes
    <= 2^(DIGIT_BITS-1)) hold per lane exactly as they did per block.

    Lane granularity subsumes per-stream isolation — the reference's
    per-source buffers (/root/reference/src/source.cpp:87-102): a
    corrupted (~1e20) or NaN stream can no longer zero its blockmates'
    digit planes, because their lanes keep their own scales.  It is also
    FREE relative to per-stream group scales: the reduction is one VPU
    pass (same elements the old global max visited) and there is no
    per-group unrolled slice/broadcast/concat chain, which measured ~9%
    end-to-end at bs=16 (0.825 vs 0.755 us/frame, N=4096 int8 on v5e).
    Returns (s, s_inv) shaped [1, cols] (axis=1) or [rows, 1] (axis=0);
    broadcasting a pow2 vector is as exact as the scalar was.
    """
    m = jnp.max(jnp.abs(hi), axis=1 - axis, keepdims=True)
    e = jnp.ceil(jnp.log2(jnp.maximum(m, jnp.float32(1e-30)))) + 1.0
    # clamp so garbage input (~1e38) yields inf magnitudes, not 0*inf=NaN
    # (exactfft._pow2_scale applies the same bound)
    e = jnp.clip(e, -125.0, 125.0)   # keep exp2(-e) normal f32
    return jnp.exp2(e), jnp.exp2(-e)


def _kernel_dtypes(ddt: str):
    """Digit/accumulator dtype pair for the MXU passes.  bf16 digits are
    exact (integers <= 64) with exact f32 integer accumulation; int8
    digits are equally exact at 2x the v5e MXU rate via int32
    accumulation, but cost an f32->int8 repack per plane on the VPU —
    which is why the choice is measured, not assumed (the XLA lowering's
    raw-GEMM ablation saw only ~14% from int8, not the spec-sheet 2x)."""
    if ddt == "int8":
        if DIGIT_BITS > 7 or FIRST_SHIFT > 6:
            # plane-0 data digits reach 2^FIRST_SHIFT (see
            # _pow2_scale_axis: s >= max|hi| holds per lane even under a
            # 1-ulp log2 misround), later planes 2^(DIGIT_BITS-1); both
            # must fit int8's +127
            raise ValueError("int8 digit planes overflow at DIGIT_BITS > 7"
                             " or FIRST_SHIFT > 6")
        return jnp.int8, jnp.int32
    return jnp.bfloat16, jnp.float32


# fixed-point geometry of the parallel extraction (see _slice4):
# i = rint(r * 2^TOP) decomposes into 4 balanced base-128 fields
_SLICE_TOP = FIRST_SHIFT + (_N_DIGITS - 1) * DIGIT_BITS        # 27
_SLICE_BIAS = sum(64 << (_SLICE_TOP - FIRST_SHIFT - DIGIT_BITS * k)
                  for k in range(_N_DIGITS))


def _slice4(hi, lo, s_inv, dtype=jnp.bfloat16, exact: bool = False):
    """4-digit slice of a df32 block scaled to [-1/2, 1/2] (VMEM-resident).

    Digits come out as bf16 by default: the values are integers <= 64,
    exactly representable, and bf16 operands keep the MXU dots
    single-pass — f32 operands at DEFAULT precision lower to the 3-pass
    bf16x3 schedule (measured 2.0x end-to-end on the N=16384 kernel).

    Two formulations, selected by the kernel accuracy tier:

    * ``exact=False`` (fast tier, default): PARALLEL extraction — one
      fixed-point conversion ``i = rint(r·2^27)`` (plus the lo word's),
      then four INDEPENDENT offset-binary field extracts
      ``d_k = ((i + BIAS) >> s_k) & 127 − 64``.  Reconstruction is exact
      by construction (Σ d_k·2^{s_k} = i) and every digit is bounded by
      64, so the MXU exactness invariants are identical to the serial
      form; what changes is the representation floor: the single f32
      product r·2^27 rounds at r's own ulp (~2^-25 relative) instead of
      the serial chain's 2^-27 absolute truncation — the same ~1.5e-7
      error class as the fast twiddle tier it ships with (measured
      end-to-end indistinguishable; see _twiddle_choice).  Removing the
      4-step serial round/subtract dependency measured 0.463 vs 0.578
      µs/frame at N=4096/S=256 on v5e (+20% end-to-end).
      The per-lane pow2 scale guarantees |r| ≤ 1/2 (the +1 exponent
      margin in _pow2_scale_axis), so |i| ≤ 2^26 + the lo word's few
      counts: the top offset-binary field cannot overflow.
    * ``exact=True`` (df tier): the serial round/subtract chain, whose
      residuals keep r's full mantissa down to 2^-27 absolute — the
      ~1e-9-relative floor the compensated twiddle tier needs.
    """
    if exact:
        r = hi * s_inv
        digits = []
        for k in range(_N_DIGITS):
            if k == 3:
                r = r + lo * s_inv
            sc = jnp.float32(2.0 ** (FIRST_SHIFT + DIGIT_BITS * k))
            d = jnp.round(r * sc)
            digits.append(d.astype(dtype))
            r = r - d / sc
        return digits

    sc = jnp.float32(2.0 ** _SLICE_TOP)
    i = jnp.rint(hi * s_inv * sc).astype(jnp.int32)
    if lo is not None:   # fast stage 2's input carries no lo words
        i = i + jnp.rint(lo * s_inv * sc).astype(jnp.int32)
    u = i + jnp.int32(_SLICE_BIAS)
    digits = []
    for k in range(_N_DIGITS):
        sh = _SLICE_TOP - FIRST_SHIFT - DIGIT_BITS * k
        d = jnp.bitwise_and(jnp.right_shift(u, sh), 127) - 64
        digits.append(d.astype(dtype))
    return digits


def _dot(a, b, acc=jnp.float32):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=acc)


def _digit_stage(const_ref, digits, s, left: bool, exact: bool = True):
    """Weight-class GEMMs + recombination (VMEM).

    ``const_ref`` holds the class-stacked DFT block matrix digits (bf16,
    see ``stacked_classes``); ``left`` selects C @ X vs X @ C.  Class t
    is ONE dot: [C_0..C_t] against [X_t;..;X_0] stacked along K — deeper
    MXU pipes and 4 dots/stage instead of 10.  Exact: stacked integer
    partial sums stay <= 4*256*2^12 = 2^22 < 2^24 in the f32
    accumulator.  Mirrors exactfft._digit_gemm for MAX_T=3.

    Recombination tiers (the dots are EXACT either way; only how the
    four weighted class sums fold differs):

    * ``exact=True``: TwoSum-compensated — the df pair carries the
      rounding of v0 + tail (~1e-9-relative chain)
    * ``exact=False`` (fast tier): plain f32 sum, lo ≡ None — one
      rounding per add (~2^-24 of |v|), the same ~1.5e-7 class as the
      fast twiddle/slice tiers; deletes the serial TwoSum from between
      the MXU stages (measured with the fast magnitude: 0.462 → 0.374
      µs/frame at N=4096/S=256 on v5e).  The lo half is None, not a
      zeros array: Mosaic does not algebraically fold x·0 or x+0, so a
      materialized zero lane used to ride the whole downstream tail for
      real — twiddle products, the stage-2 regroup stack, and a
      fixed-point convert all executed on dead zeros (r5, measured).
    """
    acc = jnp.int32 if digits[0].dtype == jnp.int8 else jnp.float32
    k1 = digits[0].shape[0 if left else 1]   # single-plane K
    dots = []
    off = 0
    for t in range(_N_DIGITS):
        w = (t + 1) * k1
        xcat = jnp.concatenate([digits[t - i] for i in range(t + 1)],
                               axis=0 if left else 1) if t else digits[0]
        if left:
            g = _dot(const_ref[:, off:off + w], xcat, acc)
        else:
            g = _dot(xcat, const_ref[off:off + w, :], acc)
        off += w
        dots.append(g)

    def weighted(t, v):
        return v.astype(jnp.float32) * (
            jnp.float32(2.0 ** -(2 * FIRST_SHIFT + DIGIT_BITS * t)) * s)

    if not exact:
        v = (weighted(0, dots[0]) + weighted(1, dots[1])
             + weighted(2, dots[2]) + weighted(3, dots[3]))
        return v, None

    v0 = weighted(0, dots[0])
    tail = weighted(3, dots[3])
    tail = tail + weighted(2, dots[2])
    tail = tail + weighted(1, dots[1])
    return two_sum(v0, tail)


def _core(n1, n2, bs, x_hi, x_lo, f1d_ref, f2d_ref,
          twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref):
    """Both FFT stages + twiddle on a VMEM-resident df32 block.

    ``x_hi/x_lo``: [2n1, bs*n2] windowed df32 input ([x_r; x_i] rows,
    stream-s columns).  Returns the df32 spectrum ``(c_hi, c_lo)``
    [bs*n1, 2n2] (stream-major rows, [C_r | C_i] columns)."""
    # ---- stage 1: A = F1b @ [x_r; x_i], digit-exact --------------------
    # per-column scales (isolation per stream lane): _pow2_scale_axis
    s, s_inv = _pow2_scale_axis(x_hi, axis=1)
    digits = _slice4(x_hi, x_lo, s_inv, exact=True)
    a_hi, a_lo = _digit_stage(f1d_ref, digits, s, left=True)

    ar = (a_hi[:n1, :], a_lo[:n1, :])          # [n1, bs*n2] df
    ai = (a_hi[n1:, :], a_lo[n1:, :])

    # ---- double-float twiddle (Dekker TwoProd, no fma) -----------------
    twr = (twr_hi_ref[:], twr_lo_ref[:])
    twi = (twi_hi_ref[:], twi_lo_ref[:])

    # the shared exactfft df primitives trace into the kernel unchanged
    # (pure jnp; _real_mag_tail already uses them) — no local copies to
    # drift from the XLA lowering's arithmetic
    br = df_add(df_mul(ar, twr), df_neg(df_mul(ai, twi)))
    bi = df_add(df_mul(ar, twi), df_mul(ai, twr))

    # ---- regroup to stream-major rows: [bs*n1, 2n2] --------------------
    def rows(a):
        return jnp.concatenate(
            [a[:, si * n2:(si + 1) * n2] for si in range(bs)], axis=0)

    b_hi = jnp.concatenate([rows(br[0]), rows(bi[0])], axis=1)
    b_lo = jnp.concatenate([rows(br[1]), rows(bi[1])], axis=1)

    # ---- stage 2: C = B @ F2b, digit-exact (per-row scales) -------------
    s2, s2_inv = _pow2_scale_axis(b_hi, axis=0)
    digits2 = _slice4(b_hi, b_lo, s2_inv, exact=True)
    return _digit_stage(f2d_ref, digits2, s2, left=False)


def _kernel(n1, n2, bs, x_hi_ref, x_lo_ref, f1d_ref, f2d_ref,
            twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
            c_hi_ref, c_lo_ref):
    c_hi_ref[:], c_lo_ref[:] = _core(
        n1, n2, bs, x_hi_ref[:], x_lo_ref[:], f1d_ref, f2d_ref,
        twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref)


@lru_cache(maxsize=16)
def _kernel_plan_real(n: int, bs: int):
    """Constants for the real-split kernel (see _kernel_real_mag).

    Stage 1 runs both channels as ONE block-diagonal real-input GEMM:
    [A0r; A0i; A1r; A1i] = blockdiag(F1r, F1r) @ [x0; x1] with
    F1r = [f1.real; f1.imag] [2N1, N1] — real input halves each channel's
    contraction depth, so two real transforms cost exactly one packed
    complex transform (and the block-diagonal gives full 128 MXU rows at
    N1 = 32).  Stage 2 keeps only the half-spectrum columns
    (k2 < N2/2 covers every bin k = k1 + N1*k2 < N/2), which the packed
    conjugate-symmetry formulation cannot do — its unpack needs the
    mirrored bins Z[N-k] — so the col restriction pays for the channel
    split: total MXU flops match the packed path with NO unpack at all.
    """
    n1, n2 = _factors(n)
    f1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    f1r = np.concatenate([f1.real, f1.imag], axis=0)        # [2n1, n1]
    z = np.zeros_like(f1r)
    f1bd = np.block([[f1r, z], [z, f1r]])                   # [4n1, 2n1]
    keep = n2 // 2
    f2b_kept = np.block([[f2.real[:, :keep], f2.imag[:, :keep]],
                         [-f2.imag[:, :keep], f2.real[:, :keep]]])

    twr_hi, twr_lo = _df_tiled(tw.real, bs)
    twi_hi, twi_lo = _df_tiled(tw.imag, bs)

    vsplit_host = _vsplit_host

    return (n1, n2,
            _stacked_classes(_digit_planes(f1bd), axis=1),
            _stacked_classes(_digit_planes(f2b_kept), axis=0),
            twr_hi, twr_lo, twi_hi, twi_lo,
            vsplit_host(twr_hi), vsplit_host(twi_hi))


def _kernel_real_mag(n1, n2, bs, ddt, twiddle, flat_in, flat_out, x_ref,
                     w_hi_ref,
                     w_lo_ref, sel_ref,
                     f1d_ref, f2d_ref,
                     twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
                     twr_h_ref, twi_h_ref,
                     mag_ref, nz_ref):
    """Raw input -> |rFFT| magnitudes of both channels, fully VMEM-resident.

    Real-split formulation (see _kernel_plan_real): window, digit FFT,
    twiddle, and magnitude never touch HBM between stages, there is no
    conjugate-symmetry unpack, and the kernel writes only the kept
    half-spectrum f32 magnitudes — an 8x smaller output than the df32
    complex spectrum of the packed path.

    I/O rides FLAT (stream, channel) ROWS in both directions — ``x_ref``
    [2bs, N] raw rows exactly as the serving ring stores them
    (dsp/devring.py: [S·C, L], T(8,128) tiles) and ``mag_ref`` [2bs, N/2]
    magnitude rows in block bin order (pos = k1·(n2/2) + k2, see
    :func:`block_bin_of_pos`) exactly as the EMA/dB consumer carries
    them — so neither side of the kernel needs an HBM relayout (the r4
    device trace itemized 11 µs ring→kernel + 10 µs mag→EMA relayouts of
    a 169 µs tick, both pure layout waste).  The retile to block
    coordinates happens HERE, in VMEM, where a relayout costs ~20× less
    than in HBM — FFTW's transposed-layout plan variants exist for the
    same reason (deps/fftw-3.3.11/mpi/dft-rank-geq2-transposed.c).

    ``flat_io=False`` is the small-bs fallback (2·bs < 8 rows, below the
    Mosaic block minimum): refs arrive/leave 3-D [2bs, n1, n2] /
    [2bs, n1, keep] and the caller owns the XLA-side relayouts.
    """
    x3 = x_ref[:].reshape(2 * bs, n1, n2) if flat_in else x_ref[:]
    xcat = jnp.concatenate(
        [jnp.concatenate([x3[2 * si + c] for si in range(bs)], axis=1)
         for c in (0, 1)], axis=0)                     # [2n1, bs*n2] raw

    # silence scan on the RAW samples (reference semantics: pre-window,
    # src/source_generic.cpp:63-66): exact 0/1-mask counts on the MXU
    mask = (xcat != 0.0).astype(jnp.bfloat16)
    counts = _dot(mask, sel_ref[:])                    # [2n1, bs] f32 exact
    nz_ref[0] = jnp.concatenate(
        [jnp.sum(counts[:n1], axis=0, keepdims=True),
         jnp.sum(counts[n1:], axis=0, keepdims=True)], axis=0)

    # df window multiply — exactfft's helper is pure jnp, so the same
    # code runs on the VPU here and in the XLA lowering
    x_hi, x_lo = _windowed_df(xcat, w_hi_ref[:], w_lo_ref[:])

    # ---- stage 1: per-channel real-input DFT, digit-exact --------------
    # per-column scales (each column = one stream's lane across both
    # channel row halves): see _pow2_scale_axis
    dtype = _kernel_dtypes(ddt)[0]
    ex = twiddle == "df"
    s, s_inv = _pow2_scale_axis(x_hi, axis=1)
    digits = _slice4(x_hi, x_lo, s_inv, dtype, exact=ex)
    a_hi, a_lo = _digit_stage(f1d_ref, digits, s, left=True,
                              exact=ex)            # [4n1, bs*n2]

    def _lo(r0):
        # fast tier: stage 1 emits no lo words (see _digit_stage) — keep
        # the absence structural so no dead lane rides the tail
        return None if a_lo is None else a_lo[r0:r0 + n1, :]

    chans = []
    for c in (0, 1):
        chans.append((
            (a_hi[2 * c * n1:(2 * c + 1) * n1, :], _lo(2 * c * n1)),
            (a_hi[(2 * c + 1) * n1:(2 * c + 2) * n1, :],
             _lo((2 * c + 1) * n1))))
    _real_mag_tail(n1, n2, bs, dtype, chans,
                   twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
                   twr_h_ref, twi_h_ref, f2d_ref, mag_ref, twiddle,
                   flat_out)


def _real_mag_tail(n1, n2, bs, dtype, chans,
                   twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
                   twr_h_ref, twi_h_ref, f2d_ref, mag_ref,
                   twiddle: str = "df", flat_out: bool = True):
    """Shared back half of the real-split kernels: outer twiddle per
    channel, regroup to stream-major rows, kept-half stage 2, magnitude.
    ``chans`` is [(ar, ai)] per capture channel, df pairs [n1, bs·n2]
    (in whatever k1 row order the stage-1 strategy produced — the twiddle
    refs arrive in the same order, and the caller unscrambles bins).

    ``twiddle`` selects the accuracy tier of the outer twiddle multiply:
    "df" (default) is the compensated Dekker product chain (~1e-9
    relative end to end); "f32" rounds each product once (~1e-7 relative,
    still ~50× under the 1e-4 dB gate), deleting the Veltkamp splits and
    error terms — a measured VPU-pressure experiment (the roofline model
    places the kernel's wait on exactly this serial df arithmetic)."""
    # twiddle constants arrive with their Veltkamp-high halves precomputed
    # on the host (tw*_h_ref): each df product then splits only the data
    # operand — 4 splits/channel-pair instead of 8 and the constant halves
    # cost one subtract each
    twr0, twi0 = twr_hi_ref[:], twi_hi_ref[:]
    twr1, twi1 = twr_lo_ref[:], twi_lo_ref[:]

    # ---- twiddle per channel + regroup to stream-major rows ------------
    rows_hi, rows_lo = [], []
    if twiddle == "f32":
        # single-rounding products.  The fast stage 1 emits NO lo words
        # (_digit_stage returns None), so there is no lo lane here at
        # all — a zeros-array lo used to ride the twiddle products, the
        # stage-2 regroup stack, and a fixed-point convert as real VPU
        # work (Mosaic folds none of it; measured r5)
        for ar, ai in chans:
            br = ar[0] * twr0 - ai[0] * twi0
            bi = ar[0] * twi0 + ai[0] * twr0
            if ar[1] is not None:   # robustness: lo-carrying caller
                rows_lo.append((ar[1] * twr0 - ai[1] * twi0,
                                ar[1] * twi0 + ai[1] * twr0))
            else:
                rows_lo.append((None, None))
            rows_hi.append((br, bi))
        _tail_stage2(n1, n2, bs, dtype, rows_hi, rows_lo, f2d_ref, mag_ref,
                     exact=False, flat_out=flat_out)
        return

    twrh, twih = twr_h_ref[:], twi_h_ref[:]
    twrl, twil = twr0 - twrh, twi0 - twih

    c4 = jnp.float32(4097.0)

    def vsplit(a):
        t = c4 * a
        h = t - (t - a)
        return h, a - h

    def mul_ps(a0, a1, ah, al, b0, b1, bh, bl):
        """df multiply with both operands' Veltkamp splits in hand."""
        p = a0 * b0
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        return two_sum(p, e + (a0 * b1 + a1 * b0))

    for ar, ai in chans:
        arh, arl = vsplit(ar[0])
        aih, ail = vsplit(ai[0])
        pr = mul_ps(ar[0], ar[1], arh, arl, twr0, twr1, twrh, twrl)
        pi = mul_ps(ai[0], ai[1], aih, ail, twi0, twi1, twih, twil)
        qr = mul_ps(ar[0], ar[1], arh, arl, twi0, twi1, twih, twil)
        qi = mul_ps(ai[0], ai[1], aih, ail, twr0, twr1, twrh, twrl)
        br = df_add(pr, (-pi[0], -pi[1]))
        bi = df_add(qr, qi)
        rows_hi.append((br[0], bi[0]))
        rows_lo.append((br[1], bi[1]))
    _tail_stage2(n1, n2, bs, dtype, rows_hi, rows_lo, f2d_ref, mag_ref,
                 exact=True, flat_out=flat_out)


def _tail_stage2(n1, n2, bs, dtype, rows_hi, rows_lo, f2d_ref, mag_ref,
                 exact: bool = False, flat_out: bool = True):
    """Regroup to stream-major rows, kept-half stage 2, magnitude.

    The fast tier (exact=False) folds the df pair once and squares in
    plain f32 — one rounding per op, the tier's ~1.5e-7 class — instead
    of the df products + TwoSum ladder (measured +11% end-to-end at
    N=4096/S=256)."""

    def stack(parts):
        # rows (si, c, k1): stream-major, then channel, then block row
        return jnp.concatenate(
            [jnp.concatenate(
                [parts[c][0][:, si * n2:(si + 1) * n2],
                 parts[c][1][:, si * n2:(si + 1) * n2]], axis=1)
             for si in range(bs) for c in (0, 1)], axis=0)

    b_hi = stack(rows_hi)                              # [bs*2*n1, 2n2]
    # the fast tier carries no lo lane (see _real_mag_tail) — skip the
    # whole lo regroup instead of stacking a dead array
    b_lo = None if rows_lo[0][0] is None else stack(rows_lo)

    # ---- stage 2: kept half-spectrum columns only ----------------------
    # per-row scales: rows are (si, c, k1)-major, so every (stream,
    # channel, k1) row keeps its own scale — see _pow2_scale_axis
    s2, s2_inv = _pow2_scale_axis(b_hi, axis=0)
    digits2 = _slice4(b_hi, b_lo, s2_inv, dtype, exact)
    c_hi, c_lo = _digit_stage(f2d_ref, digits2, s2, left=False, exact=exact)
    # cols [C_r | C_i] of the kept n2/2 bins
    keep = n2 // 2
    # clamp to +-2^63 before squaring: past ~2^64.5 the square overflows
    # f32 and the df sum turns NaN — sticky through the EMA, unlike a
    # finite huge magnitude that decays; inert for any real signal
    # (exactfft._df_mag applies the same bound)
    lim = jnp.float32(2.0 ** 63)
    if exact:
        cr = (jnp.clip(c_hi[:, :keep], -lim, lim), c_lo[:, :keep])
        ci = (jnp.clip(c_hi[:, keep:], -lim, lim), c_lo[:, keep:])
        rr = df_mul(cr, cr)
        ii = df_mul(ci, ci)
        s0, e0 = two_sum(rr[0], ii[0])
        mag = jnp.sqrt(jnp.maximum(s0 + (e0 + rr[1] + ii[1]), 0.0))
    else:
        # fast stage 2 emits c_lo=None (nothing to fold)
        cr = jnp.clip(c_hi[:, :keep], -lim, lim)
        ci = jnp.clip(c_hi[:, keep:], -lim, lim)
        mag = jnp.sqrt(cr * cr + ci * ci)
    # flat-row emission: mag's rows are already (si, c, k1)-major, so
    # each (si, c) block of n1 rows collapses into ONE [n1·keep]-lane row
    # and the HBM output lands in the EMA consumer's exact [S·C, nbins]
    # layout (block bin order — see block_bin_of_pos).  Mosaic's v5e
    # backend CRASHES (tpu_compile_helper exit 1, reproduced on every
    # shape tried) on any reshape whose SOURCE rows are sub-lane-width
    # (keep = 64 < 128 lanes), so the collapse goes through a 128-lane
    # intermediate: pair each block's row j with row j+n1/2 along lanes
    # (both are full-width contiguous slices; the pairing is just another
    # fixed bin permutation, folded into block_bin_of_pos), THEN collapse
    # — reshapes from exactly-128-lane sources compile and are
    # layout-only.  note: transposing to NATURAL flat bin order here
    # instead measured SLOWER on v5e (578k vs 596-604k frames/s headline,
    # r3) — a cross-tile transpose is real work even in VMEM, while this
    # pairing is lane-concat + row-collapse; consumers absorb the block
    # order by permuting their per-bin constants/gather indices instead
    # (dsp/spectrum.py kernel_bin_perm).
    if flat_out:
        # rows leave CHANNEL-PLANAR ([2, bs, n1·keep] blocks of a
        # [2, S, nbins] output): XLA's layout assignment carries the EMA
        # state [S, C, nbins] as {2,0,1} (channel-planar memory), so the
        # logical (C, S)->(S, C) transpose outside is a metadata bitcast
        # — the (si, c)-interleaved form still paid a 5.6 µs T(2,128)->
        # T(8,128) retile into the EMA blend every tick (trace r5)
        h = n1 // 2

        def row(q):
            blk = mag[q * n1:(q + 1) * n1]
            return jnp.concatenate([blk[:h], blk[h:]], axis=1)

        planar = [row(si * 2 + c) for c in (0, 1) for si in range(bs)]
        m2 = jnp.concatenate(planar, axis=0).reshape(
            2 * bs, n1 * (n2 // 2))
        mag_ref[:] = jnp.concatenate([m2[:bs][None], m2[bs:][None]],
                                     axis=0)
    else:
        # small-bs fallback (2·bs < 8 rows — N >= 32768 VMEM budgets):
        # 3-D [2bs, n1, keep] blocks; the caller reproduces the SAME
        # paired bin order with an XLA-side relayout (those sizes paid it
        # before this change too)
        for q in range(2 * bs):
            mag_ref[q] = mag[q * n1:(q + 1) * n1]




@lru_cache(maxsize=16)
def _kernel_plan_real3(n: int, bs: int):
    """Constants for the 3-factor real-split kernel (see
    _kernel_real_mag3).

    Stage 1 factors N1 = a·4 (j1 = jq·a + jp, k1 = kq + 4·kp): an exact
    radix-4 butterfly over the four contiguous a-row chunks (ω₄ ∈
    {±1, ±i} — pure df adds, no digit work), then the ω_{N1}^{jp·kq}
    twiddle FOLDED into the outer DFT_a constants (G_kq = F_a ⊙ t_kq is
    just another exact digit-sliced constant), so the whole stage is two
    class-stacked [4a, 2a] digit dots on REAL operands — chunk pair
    (0, 2) consumes [u0; u2] and pair (1, 3) consumes [u1; u3], each
    emitting two complex chunks.  Constants are quadratic in a = N1/4
    (16x smaller than the 2-factor's F1 planes), which is what lets
    N=65536 fit in VMEM (/root/reference/src/source.cpp:359-363 is the
    reference's 64k ceiling).  Output rows come out chunk-major
    (pos = kq·a + kp ↔ k1 = kq + 4·kp): the outer twiddle rows are
    host-permuted to match and the caller unscrambles the final bins.
    """
    n1, n2 = _factors(n)
    a = n1 // 4
    fa = np.exp(-2j * np.pi * np.outer(np.arange(a), np.arange(a)) / a)
    t = [np.exp(-2j * np.pi * np.arange(a) * kq / n1) for kq in range(4)]
    g = [fa * t[kq][None, :] for kq in range(4)]        # [a, a] complex
    # pair (0,2): [A0r; A0i; A2r; A2i] from [u0; u2] (A0 = g0@(u0+u2),
    # A2 = g2@(u0-u2)); pair (1,3): from [u1; u3] (Y1 = u1 - i·u3,
    # Y3 = u1 + i·u3)
    c02 = np.block([[g[0].real, g[0].real],
                    [g[0].imag, g[0].imag],
                    [g[2].real, -g[2].real],
                    [g[2].imag, -g[2].imag]])           # [4a, 2a]
    c13 = np.block([[g[1].real, g[1].imag],
                    [g[1].imag, -g[1].real],
                    [g[3].real, -g[3].imag],
                    [g[3].imag, g[3].real]])            # [4a, 2a]

    f2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    keep = n2 // 2
    f2b_kept = np.block([[f2.real[:, :keep], f2.imag[:, :keep]],
                         [-f2.imag[:, :keep], f2.real[:, :keep]]])

    # outer twiddle in chunk-major row order
    k1_of_pos = (np.arange(n1) // a) + 4 * (np.arange(n1) % a)
    tw = np.exp(-2j * np.pi * np.outer(k1_of_pos, np.arange(n2)) / n)
    twr_hi, twr_lo = _df_tiled(tw.real, bs)
    twi_hi, twi_lo = _df_tiled(tw.imag, bs)

    vsplit_host = _vsplit_host

    return (n1, n2, a,
            _stacked_classes(_digit_planes(c02), axis=1),
            _stacked_classes(_digit_planes(c13), axis=1),
            _stacked_classes(_digit_planes(f2b_kept), axis=0),
            twr_hi, twr_lo, twi_hi, twi_lo,
            vsplit_host(twr_hi), vsplit_host(twi_hi))


def _kernel_real_mag3(n1, n2, bs, a, ddt, twiddle, flat_in, flat_out,
                      x_ref,
                      w_hi_ref,
                      w_lo_ref,
                      sel_ref,
                      c02_ref, c13_ref, f2d_ref,
                      twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
                      twr_h_ref, twi_h_ref, mag_ref, nz_ref):
    """3-factor variant of _kernel_real_mag: radix-4 + twiddle-folded
    DFT_a stage 1 (see _kernel_plan_real3), shared tail.  Same flat-row
    I/O contract as _kernel_real_mag (its mag rows additionally carry the
    chunk-major k1 order — block_bin_of_pos folds that in)."""
    M = bs * n2
    x3 = x_ref[:].reshape(2 * bs, n1, n2) if flat_in else x_ref[:]
    xcat = jnp.concatenate(
        [jnp.concatenate([x3[2 * si + c] for si in range(bs)], axis=1)
         for c in (0, 1)], axis=0)                     # [2n1, bs*n2] raw

    mask = (xcat != 0.0).astype(jnp.bfloat16)
    counts = _dot(mask, sel_ref[:])                    # [2n1, bs] f32 exact
    nz_ref[0] = jnp.concatenate(
        [jnp.sum(counts[:n1], axis=0, keepdims=True),
         jnp.sum(counts[n1:], axis=0, keepdims=True)], axis=0)

    x_hi, x_lo = _windowed_df(xcat, w_hi_ref[:], w_lo_ref[:])

    dfa = df_add                                 # shared primitives —
    dfs = lambda x, y: df_add(x, df_neg(y))      # see _core's note

    # ---- radix-4 butterflies (exact df adds), both channels ------------
    u02, u13 = [], []
    for c in (0, 1):
        ch = [(x_hi[c * n1 + q * a:c * n1 + (q + 1) * a],
               x_lo[c * n1 + q * a:c * n1 + (q + 1) * a]) for q in range(4)]
        u0 = dfa(ch[0], ch[2])
        u1 = dfs(ch[0], ch[2])
        u2 = dfa(ch[1], ch[3])
        u3 = dfs(ch[1], ch[3])
        u02.append((jnp.concatenate([u0[0], u2[0]], axis=0),
                    jnp.concatenate([u0[1], u2[1]], axis=0)))  # [2a, M]
        u13.append((jnp.concatenate([u1[0], u3[0]], axis=0),
                    jnp.concatenate([u1[1], u3[1]], axis=0)))

    def ccat(parts):   # channels side by side along columns: [2a, 2M]
        return (jnp.concatenate([p[0] for p in parts], axis=1),
                jnp.concatenate([p[1] for p in parts], axis=1))

    U02, U13 = ccat(u02), ccat(u13)

    # ---- two digit dots cover all four chunks of both channels ---------
    # per-column scales: U02/U13 columns are [c0 streams | c1 streams],
    # so every (channel, stream) lane is isolated (see _pow2_scale_axis)
    dtype = _kernel_dtypes(ddt)[0]
    exact = twiddle == "df"
    sA, sA_inv = _pow2_scale_axis(U02[0], axis=1)
    a02 = _digit_stage(c02_ref,
                       _slice4(U02[0], U02[1], sA_inv, dtype, exact), sA,
                       left=True, exact=exact)         # [4a, 2M]
    sB, sB_inv = _pow2_scale_axis(U13[0], axis=1)
    a13 = _digit_stage(c13_ref,
                       _slice4(U13[0], U13[1], sB_inv, dtype, exact), sB,
                       left=True, exact=exact)

    # ---- reassemble chunk-major [n1, M] (re, im) rows per channel ------
    chans = []
    for c in (0, 1):
        col = slice(c * M, (c + 1) * M)

        def rows(src, r0):
            lo = None if src[1] is None else src[1][r0:r0 + a, col]
            return (src[0][r0:r0 + a, col], lo)

        def cat4(blocks):
            lo = (None if blocks[0][1] is None else
                  jnp.concatenate([b[1] for b in blocks], axis=0))
            return (jnp.concatenate([b[0] for b in blocks], axis=0), lo)

        ar = cat4([rows(a02, 0), rows(a13, 0),
                   rows(a02, 2 * a), rows(a13, 2 * a)])
        ai = cat4([rows(a02, a), rows(a13, a),
                   rows(a02, 3 * a), rows(a13, 3 * a)])
        chans.append((ar, ai))

    _real_mag_tail(n1, n2, bs, dtype, chans,
                   twr_hi_ref, twr_lo_ref, twi_hi_ref, twi_lo_ref,
                   twr_h_ref, twi_h_ref, f2d_ref, mag_ref, twiddle,
                   flat_out)


def _twiddle_choice() -> str:
    """Outer-twiddle accuracy tier: "f32" (single-rounding, the default)
    or "df" (fully compensated Dekker products).

    Default rationale, all measured on v5e: f32 is 20%/17%/12% faster at
    N=4096/16384/65536 (0.576 vs 0.720 us/frame at 4096 int8) and its
    END-TO-END accuracy through the windowed spectrum pipeline is
    indistinguishable from df (4.02e-6 vs 3.99e-6 dB at N=4096, 8.45e-6
    vs 8.6e-6 at 65536 vs the float64 oracle) — the pipeline's residual
    error is dominated by the df window product and magnitude floor, not
    the twiddle rounding.  Raw |rFFT| worst case at the -120dB-of-peak
    edge: 1.5e-7 vs 1e-7 relative.  WAVEFORM_TPU_KERNEL_TWIDDLE=df
    restores the compensated chain for applications that consume raw
    magnitudes at extreme dynamic range.  Env-only: accuracy tiers are a
    user decision, not a plan the tuner may silently flip."""
    env = os.environ.get("WAVEFORM_TPU_KERNEL_TWIDDLE")
    return env if env in ("df", "f32") else "f32"


def _digit_dtype_choice(n: int) -> str:
    """bf16 vs int8 digit planes: env override, then the measured plan
    (utils/plans.py), then bf16 (results are bit-identical either way —
    this is purely a speed plan)."""
    env = os.environ.get("WAVEFORM_TPU_KERNEL_DIGIT_DTYPE")
    if env in ("bf16", "int8"):
        return env
    from ..utils.plans import plan_for
    p = plan_for(n)
    if p is not None and p.get("ddt") in ("bf16", "int8"):
        return p["ddt"]
    return "bf16"


@lru_cache(maxsize=16)
def _row_unscramble(n: int) -> np.ndarray:
    """pos(k1) for the 3-factor chunk-major row order: natural bin k1
    lives at kernel row (k1 % 4)·a + k1 // 4."""
    n1 = n // _LANES
    a = n1 // 4
    k1 = np.arange(n1)
    return ((k1 % 4) * a + k1 // 4).astype(np.int32)


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
    bs = _block_streams(n, split=2)   # the complex kernel is 2-factor
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


def block_bin_of_pos(n: int, split: int | None = None) -> np.ndarray:
    """Natural bin index stored at each flat position of a kernel mag row.

    :func:`rfft_rows_mag_packed` emits each (stream, channel)'s kept-half
    magnitudes as ONE [N/2]-lane row in BLOCK bin order: the stage-2 rows
    (one per stage-1 k1 row, keep = N2/2 kept lanes each) land in
    half-paired 128-lane chunks — chunk j carries row j's keep bins then
    row j + N1/2's (the pairing that lets the in-VMEM collapse run from
    full-lane-width sources, see _tail_stage2).  Position
    p = j·2keep + l therefore holds stage-2 row r = j + (N1/2)·(l // keep)
    at k2 = l % keep; the stage-1 row order maps r to k1 (identity for
    the 2-factor split; chunk-major for the 3-factor, see
    _kernel_plan_real3) and the natural bin is k = k1 + N1·k2.
    Consumers that keep their whole pipeline in block order (EMA, dB,
    rebin — dsp/spectrum.py, rebin/apply.py) permute their per-bin
    CONSTANTS by this map instead of relayouting the data every tick.
    ``split=None`` resolves the same env/plan choice the kernel uses —
    callers building a consumer and its kernel in one breath get
    matching orders by construction.
    """
    n1, n2 = _factors(n)
    keep = n2 // 2
    if n % _LANES or n1 % 2:
        # block order exists only for the kernel's factorization (the
        # half-pairing needs an even N1); a silent wrong-length permute
        # would mis-shape downstream consumers, so fail loudly — engines
        # never request block order here (kernel_bin_perm gates on
        # kernel_would_run, which implies this geometry)
        raise ValueError(f"block bin order undefined for N={n}: needs "
                         f"N % {_LANES} == 0 and an even N/{_LANES}")
    if split not in (2, 3):
        # resolve the env/plan-dependent default OUTSIDE any caching: a
        # plan retune between two engine builds must yield the retuned
        # permutation, not a stale cached one (the kernel trace itself is
        # keyed on the resolved split, so they stay in step)
        split = _stage1_split(n)
    return _block_bin_of_pos(n, split)


@lru_cache(maxsize=32)
def _block_bin_of_pos(n: int, split: int) -> np.ndarray:
    n1, n2 = _factors(n)
    keep = n2 // 2
    p = np.arange(n1 * keep)
    j, l = p // (2 * keep), p % (2 * keep)
    r = j + (n1 // 2) * (l // keep)
    k2 = l % keep
    if split == 3:
        a = n1 // 4
        k1 = (r % a) * 4 + r // a          # inverse of _row_unscramble
    else:
        k1 = r
    return (k1 + n1 * k2).astype(np.int32)


def rfft_rows_mag_packed(x2: jnp.ndarray, w_hi: jnp.ndarray,
                         w_lo: jnp.ndarray, interpret: bool = False,
                         split: int = 2, ddt: str = "bf16",
                         bs: int | None = None, twiddle: str = "df"):
    """Raw channel-pair rows -> |rFFT| magnitude rows + silence counts.

    ``x2``: [S·2, N] f32 raw samples, one (stream, channel) row each —
    the serving ring's native flat layout (dsp/devring.py).  Returns
    ``(mag2, nzcount)``: ``mag2`` [2, S, N/2] f32 kept-half magnitudes,
    CHANNEL-PLANAR with bins in block order (see :func:`block_bin_of_pos`
    and _tail_stage2's planar note — ``swapaxes(mag2, 0, 1)`` is the
    logical [S, 2, N/2] view, and lands as a free metadata bitcast in the
    layout XLA assigns the EMA carry), ``nzcount`` [S, 2] f32
    per-(stream, channel) raw nonzero counts.  Neither side of the kernel
    call inserts an HBM relayout.  ``split`` is the stage-1 strategy,
    ``ddt`` the digit dtype for the MXU passes and ``bs`` an explicit
    streams-per-block request (all static: callers resolve env/plan
    reads so they never hide inside a cached trace; likewise the
    WAVEFORM_TPU_KERNEL_FLAT_IO ablation env resolves HERE, outside the
    jit, so flipping it between calls can never silently alias to a
    cached trace — the r4 ablation trap).
    """
    return _rows_mag_packed(
        x2, w_hi, w_lo, interpret=interpret, split=split, ddt=ddt, bs=bs,
        twiddle=twiddle,
        io_env=os.environ.get("WAVEFORM_TPU_KERNEL_FLAT_IO", "out"))


@functools.partial(jax.jit,
                   static_argnames=("interpret", "split", "ddt", "bs",
                                    "twiddle", "io_env"))
def _rows_mag_packed(x2: jnp.ndarray, w_hi: jnp.ndarray,
                     w_lo: jnp.ndarray, interpret: bool = False,
                     split: int = 2, ddt: str = "bf16",
                     bs: int | None = None, twiddle: str = "df",
                     io_env: str = "out"):
    S2, n = x2.shape
    S = S2 // 2
    n1, n2 = _factors(n)
    keep = n2 // 2
    bs = _block_streams(n, split=split, ddt=ddt, want=bs)
    while S % bs:
        bs //= 2

    def wtile(w):
        return jnp.tile(w.reshape(n1, n2), (2, bs))

    vm = pltpu.VMEM
    two_n1 = 2 * n1
    # flat 2-D rows need >= 8-row (or whole-array) blocks; the big-N VMEM
    # budgets that force bs < 4 fall back to 3-D blocks with XLA-side
    # relayouts (what those sizes paid before flat I/O existed).  The in
    # and out sides decide independently: the INPUT keeps the pre-r5 3-D
    # blocks (Mosaic lowers the [2bs, n] -> [2bs, n1, n2] lane-split
    # reshape to lane shuffles measured ~3x the whole kernel; the XLA-
    # side relayout it would save is 11 us of a 169 us tick), while the
    # OUTPUT emits flat half-paired rows (the lane-concat + row-collapse
    # is layout-only and deletes the EMA-side transpose entirely).
    # WAVEFORM_TPU_KERNEL_FLAT_IO=in,out / in / out / none overrides for
    # measurement.
    flat_in = ((2 * bs) % 8 == 0 or 2 * bs == S2) \
        and "in" in io_env.split(",")
    # the in-VMEM half-pairing lane-concats blk[:h] with blk[h:] — the
    # second operand must start on a sublane-tile boundary (h % 8 == 0,
    # i.e. N1 % 16 == 0) or Mosaic rejects the concat ("result/input
    # offset mismatch on non-concat dimension", reproduced at N=1024);
    # misaligned sizes keep 3-D blocks + the XLA-side pairing.  The
    # planar [2, bs, N/2] output block additionally needs its stream dim
    # tile-friendly (bs % 8 == 0 or the whole axis).
    flat_out = ((bs % 8 == 0 or bs == S) and (n1 // 2) % 8 == 0
                and "out" in io_env.split(","))
    tw_spec = pl.BlockSpec((n1, bs * n2), lambda i: (0, 0), memory_space=vm)
    if flat_in:
        x_in = x2
        x_spec = pl.BlockSpec((2 * bs, n), lambda i: (i, 0),
                              memory_space=vm)
    else:
        x_in = x2.reshape(S2, n1, n2)
        x_spec = pl.BlockSpec((2 * bs, n1, n2), lambda i: (i, 0, 0),
                              memory_space=vm)
    if flat_out:
        # channel-planar [2, S, nbins]: block i owns both channels' rows
        # of its bs streams (see _tail_stage2's planar note)
        mag_spec = pl.BlockSpec((2, bs, n // 2), lambda i: (0, i, 0),
                                memory_space=vm)
        mag_shape = jax.ShapeDtypeStruct((2, S, n // 2), jnp.float32)
    else:
        mag_spec = pl.BlockSpec((2 * bs, n1, keep), lambda i: (i, 0, 0),
                                memory_space=vm)
        mag_shape = jax.ShapeDtypeStruct((S2, n1, keep), jnp.float32)
    common_in = [
        x_spec,
        pl.BlockSpec((two_n1, bs * n2), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((two_n1, bs * n2), lambda i: (0, 0), memory_space=vm),
        pl.BlockSpec((bs * n2, bs), lambda i: (0, 0), memory_space=vm),
    ]
    out_specs = [
        mag_spec,
        pl.BlockSpec((1, 2, bs), lambda i: (i, 0, 0), memory_space=vm),
    ]
    out_shape = [
        mag_shape,
        jax.ShapeDtypeStruct((S // bs, 2, bs), jnp.float32),
    ]

    if split == 3:
        (n1, n2, a, c02, c13, f2d, twr_hi, twr_lo,
         twi_hi, twi_lo, twr_h, twi_h) = _kernel_plan_real3(n, bs)
        kernel = functools.partial(_kernel_real_mag3, n1, n2, bs, a, ddt,
                                   twiddle, flat_in, flat_out)
        const_specs = [
            pl.BlockSpec((4 * a, 10 * 2 * a), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((4 * a, 10 * 2 * a), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((10 * 2 * n2, n2), lambda i: (0, 0),
                         memory_space=vm),
        ]
        cdt = _kernel_dtypes(ddt)[0]
        consts = (jnp.asarray(c02, cdt), jnp.asarray(c13, cdt),
                  jnp.asarray(f2d, cdt))
    else:
        (n1, n2, f1d, f2d, twr_hi, twr_lo,
         twi_hi, twi_lo, twr_h, twi_h) = _kernel_plan_real(n, bs)
        kernel = functools.partial(_kernel_real_mag, n1, n2, bs, ddt,
                                   twiddle, flat_in, flat_out)
        const_specs = [
            pl.BlockSpec((4 * n1, 10 * two_n1), lambda i: (0, 0),
                         memory_space=vm),
            pl.BlockSpec((10 * 2 * n2, n2), lambda i: (0, 0),
                         memory_space=vm),
        ]
        cdt = _kernel_dtypes(ddt)[0]
        consts = (jnp.asarray(f1d, cdt), jnp.asarray(f2d, cdt))

    mag2, nz = pl.pallas_call(
        kernel,
        grid=(S // bs,),
        in_specs=common_in + const_specs
        + [tw_spec, tw_spec, tw_spec, tw_spec, tw_spec, tw_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x_in, wtile(w_hi), wtile(w_lo),
      jnp.asarray(_lane_selector(n2, bs), jnp.bfloat16),
      *consts,
      jnp.asarray(twr_hi), jnp.asarray(twr_lo),
      jnp.asarray(twi_hi), jnp.asarray(twi_lo),
      jnp.asarray(twr_h), jnp.asarray(twi_h))

    if not flat_out:
        # reproduce the flat contract's half-paired rows + channel-planar
        # grouping (see block_bin_of_pos / _tail_stage2) from the 3-D
        # fallback blocks — an XLA-side relayout those sizes always paid
        h = n1 // 2
        m2 = jnp.concatenate([mag2[:, :h], mag2[:, h:]],
                             axis=-1).reshape(S, 2, n // 2)
        mag2 = jnp.swapaxes(m2, 0, 1)
    return mag2, jnp.swapaxes(nz, 1, 2).reshape(S, 2)


def rfft_pair_mag_kernel(x, nbins: int | None = None, window=None,
                         interpret: bool = False,
                         bin_order: str = "natural"):
    """|rFFT| + silence predicate for [..., 2, N] raw f32 channel pairs.

    The all-in-VMEM path behind exactfft.rfft_pair_mag_exact: window,
    FFT, conjugate-symmetry unpack, and magnitude never touch HBM between
    stages.  Returns ``(mag [..., 2, nbins] f32, nz [..., 2] bool)``.

    ``bin_order="block"`` returns the kernel's native row layout (bin at
    position p is :func:`block_bin_of_pos`(N)[p]) with NO relayout at all
    — the serving engine's hot path, whose EMA/dB/rebin stages consume
    block order directly; requires ``nbins == N//2``.  The default
    "natural" order pays one transpose, exactly the pre-r5 contract.
    """
    shp = x.shape[:-2]
    n = x.shape[-1]
    n1, n2 = _factors(n)
    nbins = n // 2 if nbins is None else nbins
    S = int(np.prod(shp)) if shp else 1
    if window is None:
        w_hi = jnp.ones((n,), jnp.float32)
        w_lo = jnp.zeros((n,), jnp.float32)
    else:
        w_hi, w_lo = window
    split = _stage1_split(n)
    mag2, nzc = rfft_rows_mag_packed(
        x.reshape(S * 2, n), w_hi, w_lo, interpret=interpret,
        split=split, ddt=_digit_dtype_choice(n),
        twiddle=_twiddle_choice())
    nz = (nzc > 0).reshape(*shp, 2)
    mag = jnp.swapaxes(mag2, 0, 1)      # logical [S, 2, N/2] view
    if bin_order == "block":
        if nbins != n // 2:
            raise ValueError("bin_order='block' requires nbins == N//2 "
                             f"(got nbins={nbins}, N={n})")
        return mag.reshape(*shp, 2, n // 2), nz
    # block rows -> natural flat bins: one constant-index gather inverts
    # the whole layout (half-pairing, 3-factor chunk order, and the
    # k1-major transpose at once — see block_bin_of_pos)
    inv = np.argsort(block_bin_of_pos(n, split))[:nbins]
    mag = jnp.take(mag, jnp.asarray(inv.astype(np.int32)), axis=-1)
    return mag.reshape(*shp, 2, nbins), nz


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


def kernel_would_run(n: int) -> bool:
    """Single source of truth for "will rfft_pair_mag_exact route into the
    Pallas kernel": size support, backend policy, and the EXACT_FUSED
    ablation gate.  exactfft's dispatch and spectrum's shard_map decision
    both consult this — keep the gate here only."""
    return (supports(n) and enabled()
            and os.environ.get("WAVEFORM_TPU_EXACT_FUSED", "auto")
            != "never")


def kernel_cost(n: int, streams: int, split: int | None = None,
                ddt: str | None = None) -> dict:
    """Static MXU/HBM cost model of one real-split kernel call on
    [streams, 2, N] — the roofline's numerator (the FFTW planner's
    iestimate_cost analog, deps/fftw-3.3.11/kernel/planner.c:426, except
    these counts are EXACT: every dot shape is static).

    Returns a dict with:

    * ``mxu_flops`` — 2·MACs across the digit-class dots (stage 1 + kept-
      half stage 2 + the silence-scan selector dot).  The class-stacked
      geometry makes this exact: class t contracts (t+1)·K rows, so the
      ten (t, pair) products of MAX_T=3 sum to a 10× single-plane dot per
      stage (see _digit_stage).
    * ``hbm_bytes`` — compulsory traffic: raw input read + magnitude/
      nzcount writes + ONE fetch of every invariant operand (digit
      planes, tiled twiddles/window, selector).  Invariant blocks
      (index_map constant across the grid) are NOT re-fetched per grid
      step — measured two ways on v5e (r5): an 8 MB invariant operand
      costs the same at grid=1/16/64 (re-fetch would add ~640 µs at
      grid=64), and the kernel's per-frame cost FALLS with block count
      (0.568/0.357/0.335 µs/frame at 1/4/16 blocks — amortizing
      per-call overhead, the opposite sign of per-block reloads).
      The pre-r5 model counted constants per block, overstating HBM
      ~3× at N=4096/S=256 and mislabeling VPU-bound sizes as HBM-bound.
    * ``split``/``ddt``/``bs`` — the resolved plan, so callers can pick
      the matching peak rate (bf16 vs int8 MXU).
    """
    if split not in (2, 3):
        split = _stage1_split(n)
    if ddt not in ("bf16", "int8"):
        ddt = _digit_dtype_choice(n)
    n1, n2 = _factors(n)
    bs = _block_streams(n, split=split, ddt=ddt)
    while streams % bs:
        bs //= 2
    S = streams
    classes = _N_DIGITS * (_N_DIGITS + 1) // 2   # Σ(t+1) = 10 at MAX_T=3

    if split == 3:
        a = n1 // 4
        # two [4a, (t+1)·2a] @ [(t+1)·2a, 2·bs·n2] dot families
        stage1 = 2 * (2 * (4 * a) * (2 * a) * (2 * n2)) * classes * S
        const_bytes = 2 * (4 * a) * (classes * 2 * a)
    else:
        # [4n1, (t+1)·2n1] @ [(t+1)·2n1, bs·n2], both channels in rows
        stage1 = (2 * (4 * n1) * (2 * n1) * n2) * classes * S
        const_bytes = (4 * n1) * (classes * 2 * n1)
    # stage 2: [bs·2n1, (t+1)·2n2] @ [(t+1)·2n2, n2/2·2] kept-half
    stage2 = (2 * (2 * n1) * (2 * n2) * n2) * classes * S
    const_bytes += (classes * 2 * n2) * n2
    # silence scan: [2n1, bs·n2] @ [bs·n2, bs] per block
    silence = 2 * (2 * n1) * (bs * n2) * bs * (S // bs)

    itemsize = 1 if ddt == "int8" else 2
    hbm = (S * 2 * n * 4                 # raw input read
           + S * 2 * (n // 2) * 4        # magnitude write
           + S * 2 * 4                   # nz counts
           # invariant operands, fetched ONCE per call (see docstring):
           + const_bytes * itemsize      # digit-plane constants
           + 6 * n1 * bs * n2 * 4        # tiled twiddle planes
           + 2 * 2 * n1 * bs * n2 * 4    # tiled df window planes
           + bs * n2 * bs * 2)           # silence selector (bf16)
    return {"mxu_flops": stage1 + stage2 + silence, "hbm_bytes": hbm,
            "split": split, "ddt": ddt, "bs": bs}
