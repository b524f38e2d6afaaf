"""Accuracy certification of the digit-sliced exact FFT.

The analog of FFTW's accuracy_test against its arbitrary-precision mp FFT
(/root/reference/deps/fftw-3.3.11/libbench2/verify-lib.c:464-477): every
check here compares per-bin against float64 numpy, at the strict per-bin
dB metric the BASELINE <1e-4 target uses — including deep Rayleigh nulls,
where plain f32 GEMM/XLA FFTs fail by 10-100x.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from waveform_tpu import AudioInfo, Settings, resolve
from waveform_tpu.core.enums import FFTWindow, TSmoothingMode
from waveform_tpu.dsp import oracle
from waveform_tpu.dsp.spectrum import (
    display_decibels,
    init_state,
    make_spectrum_step,
)
from waveform_tpu.kernels import exactfft


def _db_err(got, want):
    return 20 * np.abs(np.log10(np.maximum(got, 1e-300)
                                / np.maximum(want, 1e-300)))


@pytest.mark.parametrize("n", [128, 1024, 4096, 16384])
def test_noise_per_bin_db_error(rng, n):
    """Max per-bin dB error vs float64 stays < 6e-5 on dense noise
    (the MAX_T=3 term budget's floor; the north-star gate is 1e-4)."""
    x = (0.5 * rng.standard_normal((2, 2, n))).astype(np.float32)
    want = np.abs(np.fft.fft(x.astype(np.float64), axis=-1)[..., :n // 2])
    got = np.asarray(jax.jit(
        lambda a: exactfft.rfft_mag_exact(a, n // 2))(x))
    assert _db_err(got, want).max() < 6e-5


def test_impulse_and_linearity(rng):
    """FFTW-style property checks on the exact path."""
    n = 512
    imp = np.zeros((1, 2, n), np.float32)
    imp[0, :, 3] = 1.0
    got = np.asarray(jax.jit(
        lambda a: exactfft.rfft_mag_exact(a, n // 2))(imp))
    np.testing.assert_allclose(got, 1.0, rtol=1e-6)

    x = rng.standard_normal((1, 2, n)).astype(np.float32)
    y = rng.standard_normal((1, 2, n)).astype(np.float32)
    f = jax.jit(lambda a: exactfft.rfft_mag_exact(a, n // 2))
    lhs = np.asarray(f(2.0 * x + 3.0 * y))
    want = np.abs(np.fft.fft((2.0 * x + 3.0 * y).astype(np.float64),
                             axis=-1)[..., :n // 2])
    assert _db_err(lhs, want).max() < 6e-5


def test_odd_channel_count(rng):
    """C=3 pairs two channels and runs the last solo — all exact."""
    n = 1024
    x = (0.3 * rng.standard_normal((2, 3, n))).astype(np.float32)
    want = np.abs(np.fft.fft(x.astype(np.float64), axis=-1)[..., :n // 2])
    got = np.asarray(jax.jit(
        lambda a: exactfft.rfft_mag_exact(a, n // 2))(x))
    assert _db_err(got, want).max() < 6e-5


def test_df32_windowing(rng):
    """The double-float Hann multiply keeps window error out of the nulls."""
    n = 4096
    w64 = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)
    w_hi = w64.astype(np.float32)
    w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
    x = (0.5 * rng.standard_normal((1, 2, n))).astype(np.float32)
    want = np.abs(np.fft.fft(x.astype(np.float64) * w64,
                             axis=-1)[..., :n // 2])
    got = np.asarray(jax.jit(lambda a: exactfft.rfft_mag_exact(
        a, n // 2, window=(jnp.asarray(w_hi), jnp.asarray(w_lo))))(x))
    assert _db_err(got, want).max() < 6e-5


def test_full_pipeline_meets_north_star(rng):
    """make_spectrum_step(fft_backend='exact') vs the float64 oracle on
    visible bins: the BASELINE <1e-4 dB target with 10x margin."""
    n = 4096
    sr = 48000
    cfg = resolve(Settings(fft_size=n, window=FFTWindow.HANN,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(sr, 2))
    x = (0.5 * rng.standard_normal((2, n))).astype(np.float64)
    want, _ = oracle.spectrum_frame(x, None, cfg, dt=1 / 60)

    step = jax.jit(make_spectrum_step(cfg, fft_backend="exact"))
    st = step(jnp.asarray(x[None], jnp.float32), init_state(cfg, 1),
              jnp.float32(1 / 60), jnp.ones(1, bool),
              jnp.zeros(1, jnp.float32))
    got = np.asarray(display_decibels(cfg, st))[0]
    vis = want > -120.0
    assert vis.any()
    assert np.abs(got[vis] - want[vis]).max() < 1e-5


def test_digit_roundtrip_exactness(rng):
    """Slicing + digit weights reconstruct the df32 value: ~2^-34 at 5
    slices, and within the per-geometry bound at the default N_SLICES
    (digit k has granularity 2^-(FIRST_SHIFT + DIGIT_BITS*k), so the
    residual after the last digit is at most half its granularity)."""
    x64 = rng.uniform(-1000, 1000, 4096)
    hi = x64.astype(np.float32)
    lo = (x64 - hi.astype(np.float64)).astype(np.float32)

    def recon_err(n_slices):
        def f(hi, lo):
            s = exactfft._pow2_scale(hi)
            digits = exactfft._slice_df(hi, lo, 1.0 / s, n_slices)
            return s, digits

        s, digits = jax.jit(f)(jnp.asarray(hi), jnp.asarray(lo))
        sv = float(np.asarray(s).ravel()[0])   # per-block scale, keepdims
        recon = sum(np.asarray(d).astype(np.float64)
                    * exactfft._digit_weight(k)
                    for k, d in enumerate(digits)) * sv
        return np.abs(recon - x64).max() / sv

    assert recon_err(5) < 2.0 ** -33
    last = exactfft.FIRST_SHIFT + exactfft.DIGIT_BITS * (exactfft.N_SLICES - 1)
    assert recon_err(exactfft.N_SLICES) <= 2.0 ** -(last + 1)


def test_maxt_zero_endpoint(monkeypatch, rng):
    """The MAX_T ablation knob's lower endpoint is low-precision, not
    wrong: a single weight class must not double-count (was 4x)."""
    import waveform_tpu.kernels.exactfft as ex
    monkeypatch.setattr(ex, "MAX_T", 0)
    n = 256
    x = rng.standard_normal(n).astype(np.float32)
    (rh, rl), (ih, il) = ex.cfft_exact(jnp.asarray(x), jnp.zeros(n, jnp.float32))
    want = np.fft.fft(x.astype(np.float64))
    got = np.asarray(rh, np.float64) + 1j * np.asarray(ih, np.float64)
    rel = np.abs(got - want).max() / np.abs(want).max()
    # single 7-bit digit pair => ~2^-12 per-product truncation, a few
    # percent end-to-end; the regression was a 4x (300%) wrong value
    assert rel < 0.2, rel


def test_real_split_xla_reference_matches(rng, monkeypatch):
    """The real-split XLA lowering (the production kernel's math rendered
    in XLA, WAVEFORM_TPU_EXACT_PACKED=never) matches f64 and the packed
    default for stereo, mono, and odd channel counts — both stage-2
    variants (folded constants at small N, explicit twiddle at 64k-class
    factorizations is covered by the plan split in _real_split_plan)."""
    import waveform_tpu.kernels.exactfft as ex
    n = 1024
    w64 = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / n)
    w_hi = w64.astype(np.float32)
    w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
    win = (jnp.asarray(w_hi), jnp.asarray(w_lo))
    for C in (2, 1, 3):
        x = (0.5 * rng.standard_normal((2, C, n))).astype(np.float32)
        monkeypatch.setenv("WAVEFORM_TPU_EXACT_PACKED", "never")
        mag_rs = ex.rfft_mag_exact(jnp.asarray(x), window=win)
        monkeypatch.setenv("WAVEFORM_TPU_EXACT_PACKED", "always")
        mag_pk = ex.rfft_mag_exact(jnp.asarray(x), window=win)
        want = np.abs(np.fft.rfft(x.astype(np.float64) * w64))[..., :n // 2]
        for name, mag in (("real-split", mag_rs), ("packed", mag_pk)):
            rel = (np.abs(np.asarray(mag, np.float64) - want).max()
                   / want.max())
            assert rel < 2.5e-7, (name, C, rel)


def test_real_split_odd_n2_falls_back_to_packed(rng, monkeypatch):
    """fft sizes whose N2 factor is odd (336 -> 16x21) have no clean
    kept-half column split; EXACT_PACKED=never must fall back to the
    packed path instead of crashing (was: reshape ValueError)."""
    import waveform_tpu.kernels.exactfft as ex
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_PACKED", "never")
    x = (0.5 * rng.standard_normal((2, 2, 336))).astype(np.float32)
    mag = ex.rfft_mag_exact(jnp.asarray(x))
    want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :168]
    rel = np.abs(np.asarray(mag, np.float64) - want).max() / want.max()
    assert rel < 2.5e-7, rel


def test_mono_kernel_path_honors_interpret_env(rng, monkeypatch):
    """The odd-channel leftover routes through cfft_exact's kernel branch,
    which must honor WAVEFORM_TPU_EXACT_INTERPRET like the pair path does
    (was: mono configs crashed on the CPU test mesh under the sharded
    engine's forced-kernel mode while stereo worked)."""
    import waveform_tpu.kernels.exactfft as ex
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "always")
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_INTERPRET", "1")
    x = (0.5 * rng.standard_normal((2, 1, 1024))).astype(np.float32)
    mag = ex.rfft_mag_exact(jnp.asarray(x))
    want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :512]
    rel = np.abs(np.asarray(mag, np.float64) - want).max() / want.max()
    assert rel < 2.5e-7, rel


def test_mono_kernel_batch_pairing(rng, monkeypatch):
    """Mono rides the PAIR kernel by pairing the batch axis (two streams
    stand in for the channel pair); an odd stream count pads one zero row
    that must not leak into the results, and the nz predicate must follow
    the re-pairing."""
    import waveform_tpu.kernels.exactfft as ex
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "always")
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_INTERPRET", "1")
    n = 1024
    for s in (3, 4, 1):
        x = (0.5 * rng.standard_normal((s, 1, n))).astype(np.float32)
        x[0] = 0.0  # silent stream: nz must be False exactly there
        mag, nz = ex.rfft_mag_exact(jnp.asarray(x), with_nz=True)
        assert mag.shape == (s, 1, n // 2) and nz.shape == (s, 1)
        want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :n // 2]
        rel = np.abs(np.asarray(mag, np.float64) - want).max() / max(
            want.max(), 1e-30)
        assert rel < 2.5e-7, (s, rel)
        np.testing.assert_array_equal(
            np.asarray(nz), np.any(x != 0.0, axis=-1))


def test_odd_channel_leftover_uses_pair_kernel(rng, monkeypatch):
    """C=3: the first two channels pair normally; the leftover third
    channel batch-pairs across streams through the same kernel."""
    import waveform_tpu.kernels.exactfft as ex
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "always")
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_INTERPRET", "1")
    n = 1024
    x = (0.5 * rng.standard_normal((2, 3, n))).astype(np.float32)
    mag = ex.rfft_mag_exact(jnp.asarray(x))
    want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :n // 2]
    rel = np.abs(np.asarray(mag, np.float64) - want).max() / want.max()
    assert rel < 2.5e-7, rel


@pytest.mark.parametrize("n", [800, 4112, 16496])
def test_deep_contraction_sizes(n, rng):
    """The reference accepts ANY multiple-of-16 fft_size (128-65536,
    src/source.cpp:562-565), including sizes whose best factor split
    leaves a large near-prime N2 (4112 = 16x257, 16496 = 16x1031).  The
    class-stacked digit contraction would overflow the exact-f32
    2^24 bound there, so _digit_gemm must cap the stacking (and segment
    the contraction axis itself at 16496, where even ONE digit pair is
    too deep) instead of raising.  800 pins the default auto fft size
    (48000/60 & ~15) on the same path."""
    x = (0.5 * rng.standard_normal((1, 2, n))).astype(np.float32)
    mag = exactfft.rfft_mag_exact(jnp.asarray(x))
    want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :n // 2]
    rel = np.abs(np.asarray(mag, np.float64) - want).max() / want.max()
    assert rel < 2.5e-7, rel


def test_garbage_amplitude_stays_finite():
    """Corrupted capture buffers (absurd float amplitudes) must yield
    huge-but-FINITE magnitudes, not NaN: NaN is sticky through the EMA,
    while finite garbage decays once sane audio returns.  The reference's
    scalar magnitude is hypot() (overflow-safe); its AVX2 fmadd path is
    not — this pins the safe behavior on the exact paths."""
    import numpy as np

    import jax.numpy as jnp
    from waveform_tpu.kernels.exactfft import (
        rfft_mag_exact,
        rfft_pair_mag_exact,
    )

    x = np.zeros((2, 2, 1024), np.float32)
    x[0, 0, 10] = 1e20        # squares would overflow f32 (1e40)
    x[0, 1, 3] = -5e19
    x[1, 0, 5] = 0.5          # a sane stream in the same batch
    for fn in (rfft_pair_mag_exact, rfft_mag_exact):
        m = np.asarray(fn(jnp.asarray(x)))
        assert np.isfinite(m).all(), fn.__name__
        assert m[0].max() > 1e18, fn.__name__     # garbage is LOUD
        # the sane stream is unaffected: its impulse's flat spectrum
        # stays exactly 0.5 per bin — with a BATCH-GLOBAL digit scale the
        # hot stream would quantize it to all-zero (the digit range sits
        # ~27 bits below the scale); the scale is per stream
        np.testing.assert_allclose(m[1, 0], 0.5, atol=1e-5,
                                   err_msg=fn.__name__)
