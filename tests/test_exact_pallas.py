"""Pallas exact-FFT core: interpret-mode equivalence with the XLA path.

Mirrors test_fused_kernel.py's strategy — Mosaic kernels validate on CPU
via interpret=True against float64 references and the XLA exactfft path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import waveform_tpu.kernels.exactfft as exactfft
from waveform_tpu.kernels.exact_pallas import (
    cfft_exact_kernel,
    rfft_pair_mag_kernel,
    supports,
)


@pytest.mark.parametrize("n", [1024, 4096, 16384])
def test_kernel_matches_f64(n, rng):
    assert supports(n)
    xr = (0.4 * rng.standard_normal((3, n))).astype(np.float32)
    xi = (0.4 * rng.standard_normal((3, n))).astype(np.float32)
    (rh, rl), (ih, il) = cfft_exact_kernel(jnp.asarray(xr), jnp.asarray(xi),
                                           interpret=True)
    want = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    got = ((np.asarray(rh, np.float64) + np.asarray(rl, np.float64))
           + 1j * (np.asarray(ih, np.float64) + np.asarray(il, np.float64)))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2.5e-7, rel


def test_kernel_matches_xla_path(rng, monkeypatch):
    """Same digits, same truncation class: kernel vs the XLA exactfft."""
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "never")
    n = 1024
    xr = rng.standard_normal((2, n)).astype(np.float32)
    xi = rng.standard_normal((2, n)).astype(np.float32)
    (rh, rl), (ih, il) = cfft_exact_kernel(jnp.asarray(xr), jnp.asarray(xi),
                                           interpret=True)
    (rh2, rl2), (ih2, il2) = exactfft.cfft_exact(jnp.asarray(xr),
                                                 jnp.asarray(xi))
    a = np.asarray(rh, np.float64) + np.asarray(rl, np.float64)
    b = np.asarray(rh2, np.float64) + np.asarray(rl2, np.float64)
    scale = np.abs(b).max()
    # per-block vs global pow2 scaling differ in which bits truncate, so
    # agreement is to the shared truncation floor, not bit-exact
    np.testing.assert_allclose(a, b, atol=2e-7 * scale)
    ai = np.asarray(ih, np.float64) + np.asarray(il, np.float64)
    bi = np.asarray(ih2, np.float64) + np.asarray(il2, np.float64)
    np.testing.assert_allclose(ai, bi, atol=2e-7 * scale)


def test_kernel_df_input_window(rng):
    """df32 (windowed) inputs flow through the kernel path exactly."""
    n = 1024
    w64 = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)
    w_hi = w64.astype(np.float32)
    w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
    x = (0.5 * rng.standard_normal((2, 2, n))).astype(np.float32)
    re = exactfft._windowed_df(jnp.asarray(x[:, 0]), jnp.asarray(w_hi),
                               jnp.asarray(w_lo))
    im = exactfft._windowed_df(jnp.asarray(x[:, 1]), jnp.asarray(w_hi),
                               jnp.asarray(w_lo))
    zr, zi = cfft_exact_kernel(re, im, interpret=True)
    want = np.fft.fft((x[:, 0].astype(np.float64)
                       + 1j * x[:, 1].astype(np.float64)) * w64)
    got = ((np.asarray(zr[0], np.float64) + np.asarray(zr[1], np.float64))
           + 1j * (np.asarray(zi[0], np.float64)
                   + np.asarray(zi[1], np.float64)))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2.5e-7, rel


def test_real_split_mag_kernel_matches_f64_and_nz(rng):
    """Raw-input real-split kernel: window, FFT, and magnitude in VMEM
    match the f64 |rfft| reference, and the silence predicate equals the
    raw-sample scan — including all-zero streams and a silent channel."""
    n = 1024
    x = (0.5 * rng.standard_normal((4, 2, n))).astype(np.float32)
    x[1] = 0.0          # fully silent stream
    x[2, 1] = 0.0       # silent channel rides a live partner
    w64 = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)
    w_hi = w64.astype(np.float32)
    w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
    mag, nz = rfft_pair_mag_kernel(
        jnp.asarray(x), window=(jnp.asarray(w_hi), jnp.asarray(w_lo)),
        interpret=True)
    want = np.abs(np.fft.rfft(x.astype(np.float64) * w64))[..., :n // 2]
    rel = np.abs(np.asarray(mag, np.float64) - want).max() / want.max()
    assert rel < 2.5e-7, rel
    np.testing.assert_array_equal(np.asarray(nz), np.any(x != 0, axis=-1))


def test_real_split_mag_kernel_no_window(rng):
    n = 1024
    x = (0.4 * rng.standard_normal((2, 2, n))).astype(np.float32)
    mag, nz = rfft_pair_mag_kernel(jnp.asarray(x), interpret=True)
    want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :n // 2]
    rel = np.abs(np.asarray(mag, np.float64) - want).max() / want.max()
    assert rel < 2.5e-7, rel
    assert np.asarray(nz).all()


def test_real_split_mag_kernel_nbins_slice(rng):
    """nbins < n//2 slices the flat kept-half spectrum."""
    n = 1024
    x = (0.4 * rng.standard_normal((2, 2, n))).astype(np.float32)
    mag_full, _ = rfft_pair_mag_kernel(jnp.asarray(x), interpret=True)
    mag_small, _ = rfft_pair_mag_kernel(jnp.asarray(x), nbins=100,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(mag_small),
                                  np.asarray(mag_full)[..., :100])


def test_real_split_mag_deep_null_accuracy(rng):
    """A full-scale sine windowed by Hann has Rayleigh nulls many orders
    below the peak.  The exact path's design floor is the MAX_T=3 digit
    truncation (~2^-31 of the spectrum scale, same as the XLA exactfft
    path — measured old 0.023 / new 0.012 dB at bins 1e-6 of peak): bins
    above 1e-4 of the spectrum peak must stay within the 1e-4 dB class,
    and the absolute error must sit at the truncation floor."""
    n = 2048
    t = np.arange(n)
    x0 = np.sin(2 * np.pi * 100.25 * t / n).astype(np.float32)
    x = np.stack([x0, 0.5 * x0])[None]
    w64 = 0.5 - 0.5 * np.cos(2 * np.pi * t / n)
    w_hi = w64.astype(np.float32)
    w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
    mag, _ = rfft_pair_mag_kernel(
        jnp.asarray(x), window=(jnp.asarray(w_hi), jnp.asarray(w_lo)),
        interpret=True)
    want = np.abs(np.fft.rfft(x.astype(np.float64) * w64))[..., :n // 2]
    got = np.asarray(mag, np.float64)
    vis = want > want.max() * 1e-4
    db_err = np.abs(20 * np.log10(np.maximum(got, 1e-30))
                    - 20 * np.log10(np.maximum(want, 1e-30)))[vis]
    assert db_err.max() < 2e-4, db_err.max()
    # null bins: absolute error bounded by the truncation floor
    assert np.abs(got - want).max() < want.max() * 2 ** -23, \
        np.abs(got - want).max() / want.max()


def test_rfft_mag_exact_with_nz_fallback(rng, monkeypatch):
    """The XLA fallback path (kernel off) produces the same (mag, nz)
    contract as the fused kernel."""
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "never")
    n = 1024
    x = (0.5 * rng.standard_normal((3, 2, n))).astype(np.float32)
    x[0, 0] = 0.0
    mag, nz = exactfft.rfft_mag_exact(jnp.asarray(x), with_nz=True)
    mag2 = exactfft.rfft_mag_exact(jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(mag), np.asarray(mag2))
    np.testing.assert_array_equal(np.asarray(nz), np.any(x != 0, axis=-1))


def test_kernel_tiny_signal_scaling(rng):
    """Per-lane pow2 scaling keeps RELATIVE precision for quiet signals."""
    n = 1024
    xr = (1e-5 * rng.standard_normal((1, n))).astype(np.float32)
    zr, zi = cfft_exact_kernel(jnp.asarray(xr),
                               jnp.zeros_like(jnp.asarray(xr)),
                               interpret=True)
    want = np.fft.fft(xr.astype(np.float64))
    got = ((np.asarray(zr[0], np.float64) + np.asarray(zr[1], np.float64))
           + 1j * (np.asarray(zi[0], np.float64)
                   + np.asarray(zi[1], np.float64)))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2.5e-7, rel


def test_block_streams_fit_vmem():
    """Block sizing accounts for the quadratic stage-1 constants: bs=2 at
    N=32768 was a 21 MB scoped-vmem OOM on v5e (16 MB limit) under the
    2-factor split; the 3-factor split's 16x-smaller constants admit
    bs=2 there and bs=1 at 65536."""
    from waveform_tpu.kernels.exact_pallas import _block_streams
    assert _block_streams(4096) == 16
    assert _block_streams(16384) == 4
    assert _block_streams(32768, split=2) == 1
    assert _block_streams(32768, split=3) == 2
    assert _block_streams(65536, split=3) == 1


def test_supports_covers_large_fft():
    """The 3-factor stage-1 split extends the kernel to the reference's
    large-FFT ceiling (65536, /root/reference/src/source.cpp:359-363);
    the complex (mono) kernel keeps the 2-factor ceiling."""
    from waveform_tpu.kernels.exact_pallas import supports, supports_cfft
    assert supports(32768) and supports(65536)
    assert not supports(131072)
    assert supports_cfft(32768) and not supports_cfft(65536)


@pytest.mark.parametrize("n", [4096, 8192])
def test_real_split3_matches_f64(n, rng, monkeypatch):
    """The 3-factor stage 1 (radix-4 + twiddle-folded DFT_a) matches the
    f64 reference through the full mag kernel, windowed, forced on at
    sizes small enough for interpret mode."""
    monkeypatch.setenv("WAVEFORM_TPU_STAGE1_SPLIT", "3")
    x = (0.5 * rng.standard_normal((2, 2, n))).astype(np.float32)
    x[1, 1] = 0.0
    w64 = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)
    w_hi = w64.astype(np.float32)
    w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
    mag, nz = rfft_pair_mag_kernel(
        jnp.asarray(x), window=(jnp.asarray(w_hi), jnp.asarray(w_lo)),
        interpret=True)
    want = np.abs(np.fft.rfft(x.astype(np.float64) * w64))[..., :n // 2]
    rel = np.abs(np.asarray(mag, np.float64) - want).max() / want.max()
    assert rel < 2.5e-7, rel
    np.testing.assert_array_equal(np.asarray(nz), np.any(x != 0, axis=-1))


def test_real_split3_matches_2factor(rng, monkeypatch):
    """Same windowless input, both stage-1 splits: agreement to the
    shared digit-truncation floor (the splits slice at different points,
    so not bit-exact)."""
    n = 4096
    x = (0.4 * rng.standard_normal((1, 2, n))).astype(np.float32)
    monkeypatch.setenv("WAVEFORM_TPU_STAGE1_SPLIT", "2")
    m2, _ = rfft_pair_mag_kernel(jnp.asarray(x), interpret=True)
    monkeypatch.setenv("WAVEFORM_TPU_STAGE1_SPLIT", "3")
    m3, _ = rfft_pair_mag_kernel(jnp.asarray(x), interpret=True)
    scale = np.asarray(m2).max()
    np.testing.assert_allclose(np.asarray(m3), np.asarray(m2),
                               atol=3e-7 * scale)


def test_real_split3_65536_matches_f64(rng):
    """The headline gap: N=65536 (the reference's large-FFT flag ceiling)
    now runs the VMEM kernel.  One stream, interpret mode."""
    n = 65536
    from waveform_tpu.kernels.exact_pallas import _stage1_split
    assert _stage1_split(n) == 3 and supports(n)
    x = (0.4 * rng.standard_normal((1, 2, n))).astype(np.float32)
    mag, _ = rfft_pair_mag_kernel(jnp.asarray(x), nbins=n // 2,
                                  interpret=True)
    want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :n // 2]
    rel = np.abs(np.asarray(mag, np.float64) - want).max() / want.max()
    assert rel < 2.5e-7, rel


@pytest.mark.parametrize("split", [2, 3])
def test_corrupted_stream_isolated(split, rng, monkeypatch):
    """Per-lane pow2 scales: a garbage (~1e20) stream in a kernel block
    degrades ONLY itself — its blockmates keep full exact-path accuracy
    (the reference's per-source isolation: every WAVSource owns its
    buffers, src/source.cpp:87-102).  Under the old per-BLOCK scale the
    healthy streams' digits all rounded to zero for this tick."""
    n = 4096 if split == 3 else 1024
    x = (0.5 * rng.standard_normal((4, 2, n))).astype(np.float32)
    x[2] = (1e20 * rng.standard_normal((2, n))).astype(np.float32)
    monkeypatch.setenv("WAVEFORM_TPU_STAGE1_SPLIT", str(split))
    mag, nz = rfft_pair_mag_kernel(jnp.asarray(x), interpret=True)
    want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :n // 2]
    got = np.asarray(mag, np.float64)
    for s in (0, 1, 3):
        rel = np.abs(got[s] - want[s]).max() / np.abs(want[s]).max()
        assert rel < 2.5e-7, (s, rel)
    # the corrupted stream itself stays finite (the pre-square clamp) and
    # recoverable — no NaN to stick in the EMA
    assert np.isfinite(got[2]).all()
    np.testing.assert_array_equal(np.asarray(nz), np.any(x != 0, axis=-1))


def test_nan_stream_isolated(rng):
    """NaN garbage confines to its own stream: per-stream scales keep
    blockmates' scales finite, and the NaN stream's output is NaN/garbage
    only in its own rows."""
    n = 1024
    x = (0.5 * rng.standard_normal((2, 2, n))).astype(np.float32)
    x[1, 0, 7] = np.nan
    mag, _ = rfft_pair_mag_kernel(jnp.asarray(x), interpret=True)
    want = np.abs(np.fft.rfft(x[0].astype(np.float64)))[..., :n // 2]
    got = np.asarray(mag, np.float64)
    rel = np.abs(got[0] - want).max() / np.abs(want).max()
    assert rel < 2.5e-7, rel


@pytest.mark.parametrize("split", [2, 3])
def test_real_split_int8_digits_bitexact(split, rng):
    """int8 digit planes (int32 MXU accumulation) are the same exact
    integers as the bf16 planes — results must be bit-identical."""
    from waveform_tpu.kernels.exact_pallas import rfft_rows_mag_packed
    n = 4096
    x2 = (0.4 * rng.standard_normal((4, n))).astype(np.float32)
    w = jnp.ones((n,), jnp.float32)
    wz = jnp.zeros((n,), jnp.float32)
    mb, nzb = rfft_rows_mag_packed(jnp.asarray(x2), w, wz, interpret=True,
                                   split=split, ddt="bf16")
    mi, nzi = rfft_rows_mag_packed(jnp.asarray(x2), w, wz, interpret=True,
                                   split=split, ddt="int8")
    np.testing.assert_array_equal(np.asarray(mb), np.asarray(mi))
    np.testing.assert_array_equal(np.asarray(nzb), np.asarray(nzi))


def test_f32_twiddle_tier_accuracy(rng, monkeypatch):
    """Twiddle tiers: the DEFAULT single-rounding tier holds ~1.5e-7
    relative on raw magnitudes (measured end-to-end indistinguishable
    from the compensated tier, and 12-20% faster on v5e — see
    docs/performance.md); WAVEFORM_TPU_KERNEL_TWIDDLE=df restores the
    fully compensated Dekker chain (~1e-9 relative)."""
    monkeypatch.setenv("WAVEFORM_TPU_KERNEL_TWIDDLE", "f32")
    n = 1024
    x = (0.5 * rng.standard_normal((4, 2, n))).astype(np.float32)
    mag, nz = rfft_pair_mag_kernel(jnp.asarray(x), interpret=True)
    want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :n // 2]
    rel = np.abs(np.asarray(mag, np.float64) - want).max() / want.max()
    assert rel < 1e-6, rel          # the relaxed tier's own bound
    np.testing.assert_array_equal(np.asarray(nz), np.any(x != 0, axis=-1))

    # default == f32 tier (bit-identical to the env-forced run)
    monkeypatch.delenv("WAVEFORM_TPU_KERNEL_TWIDDLE")
    mag_def, _ = rfft_pair_mag_kernel(jnp.asarray(x), interpret=True)
    np.testing.assert_array_equal(np.asarray(mag_def), np.asarray(mag))

    # the compensated tier stays selectable and tighter
    monkeypatch.setenv("WAVEFORM_TPU_KERNEL_TWIDDLE", "df")
    mag_df, _ = rfft_pair_mag_kernel(jnp.asarray(x), interpret=True)
    rel_df = np.abs(np.asarray(mag_df, np.float64) - want).max() / want.max()
    assert rel_df < 2.5e-7, rel_df
