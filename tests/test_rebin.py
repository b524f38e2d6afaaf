"""Golden tests for the rebin layer: gather-LUT JAX stage vs oracle loops.

Edge semantics (kernel taps clamped/dropped at bin-array bounds, bar-band
remainders, Gaussian edge renormalization) are the behavior-defining,
off-by-one-prone parts (SURVEY.md §7) — exercised here over small N.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from waveform_tpu import (
    AudioInfo,
    DisplayMode,
    FilterMode,
    InterpMode,
    Settings,
    resolve,
)
from waveform_tpu.dsp import oracle
from waveform_tpu.rebin.apply import make_rebin_fn
from waveform_tpu.rebin.filter import apply_gauss_np, build_gauss_tables
from waveform_tpu.rebin.interp import build_interp_tables


def cfg_for(**kw):
    audio = kw.pop("audio", AudioInfo(48000, 2))
    return resolve(Settings(**kw), audio)


@pytest.mark.parametrize("interp", list(InterpMode))
@pytest.mark.parametrize("log_scale", [True, False])
def test_curve_interp_vs_oracle(interp, log_scale, rng):
    cfg = cfg_for(fft_size=512, width=200, interp_mode=interp,
                  log_scale=log_scale, filter_mode=FilterMode.NONE)
    db = rng.standard_normal((3, 1, 256)) * 20.0 - 60.0
    rebin = make_rebin_fn(cfg, apply_pixel_map=False)
    got = np.asarray(rebin(jnp.asarray(db, jnp.float32)))

    idx = oracle.interp_indices(cfg, cfg.width)
    for s in range(3):
        want = oracle.apply_interp_curve(db[s, 0], idx, interp)
        np.testing.assert_allclose(got[s, 0], want, atol=2e-4)


@pytest.mark.parametrize("interp", list(InterpMode))
def test_bars_vs_oracle(interp, rng):
    cfg = cfg_for(fft_size=1024, width=300, display_mode=DisplayMode.BAR,
                  interp_mode=interp, bar_width=20, bar_gap=5,
                  filter_mode=FilterMode.NONE)
    assert cfg.num_bars == 12
    db = rng.standard_normal((2, 1, 512)) * 20.0 - 60.0
    rebin = make_rebin_fn(cfg, apply_pixel_map=False)
    got = np.asarray(rebin(jnp.asarray(db, jnp.float32)))
    assert got.shape == (2, 1, 12)

    edges = oracle.interp_indices(cfg, cfg.num_bars + 1)
    widths = oracle.band_widths(edges, cfg.num_bars)
    for s in range(2):
        want = oracle.apply_interp_bars(db[s, 0], edges, widths, interp)
        np.testing.assert_allclose(got[s, 0], want, atol=2e-4)


@pytest.mark.parametrize("sigma", [0.3, 1.5, 7.0])
def test_gauss_filter_vs_oracle(sigma, rng):
    n = 97
    x = rng.standard_normal((4, n)) * 10.0
    tables = build_gauss_tables(sigma, n, dtype=np.float64)
    want = np.stack([oracle.apply_gauss(x[i], sigma) for i in range(4)])
    got = apply_gauss_np(x, tables)
    np.testing.assert_allclose(got, want, rtol=1e-10)


def test_full_chain_with_gauss_and_mirror(rng):
    cfg = cfg_for(fft_size=512, width=160, interp_mode=InterpMode.LANCZOS,
                  filter_mode=FilterMode.GAUSS, filter_radius=2.0,
                  mirror_freq_axis=True)
    db = rng.standard_normal((2, 1, 256)) * 15.0 - 50.0
    rebin = make_rebin_fn(cfg)
    cpos = float(cfg.height)
    got = np.asarray(rebin(jnp.asarray(db, jnp.float32), 0.0, cpos))

    idx = oracle.interp_indices(cfg, cfg.width)
    for s in range(2):
        v = oracle.apply_interp_curve(db[s, 0], idx, InterpMode.LANCZOS)
        v = oracle.apply_gauss(v, 2.0)
        v = oracle.pixel_map(v, cfg.ceiling, cfg.floor, 0.0, cpos)
        v = oracle.mirror_axis(v)
        np.testing.assert_allclose(got[s, 0], v, atol=5e-3)


def test_interp_tables_edges():
    """Out-of-range taps carry zero weight (kernel_convolve zero-padding)."""
    cfg = cfg_for(fft_size=128, width=64, interp_mode=InterpMode.LANCZOS,
                  cutoff_low=0, cutoff_high=24000)
    t = build_interp_tables(cfg)
    nbins = 64
    assert t.taps.min() >= 0 and t.taps.max() < nbins
    # lowest pixel maps near bin 1; its leftmost lanczos taps (bins <0) are
    # dropped -> some zero weights in the first row
    assert (t.weights[0] == 0.0).any()
    # interior rows keep all 8 weights (possibly tiny but nonzero)
    mid = t.weights[t.weights.shape[0] // 2]
    assert (mid != 0.0).all()


def test_point_bar_truncation_semantics(rng):
    """Point-mode bars index (size_t)edge + j: truncation, not rounding
    (src/source.cpp:1525-1532)."""
    cfg = cfg_for(fft_size=256, width=60, display_mode=DisplayMode.BAR,
                  interp_mode=InterpMode.POINT, bar_width=9, bar_gap=1)
    db = rng.standard_normal((1, 1, 128)) - 60.0
    rebin = make_rebin_fn(cfg, apply_pixel_map=False)
    got = np.asarray(rebin(jnp.asarray(db, jnp.float32)))[0, 0]
    edges = oracle.interp_indices(cfg, cfg.num_bars + 1)
    widths = oracle.band_widths(edges, cfg.num_bars)
    want = oracle.apply_interp_bars(db[0, 0], edges, widths, InterpMode.POINT)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_band_widths_reference_truncation():
    """The reference truncates the float difference, not each edge index
    ((int)(idx[i+1]-idx[i]), src/source.cpp:871)."""
    idx = np.array([1.9, 3.1, 4.05, 7.9])
    w = oracle.band_widths(idx, 3)
    # diffs: 1.2 -> 1, 0.95 -> max(0,1)=1, 3.85 -> 3
    np.testing.assert_array_equal(w, [1, 1, 3])
    # per-index truncation would give [3-1, 4-3, 7-4] = [2, 1, 3] — wrong


def test_dense_interp_matches_gather(monkeypatch):
    """WAVEFORM_TPU_REBIN=dense routes the interp stage through one
    [nbins, P] matmul (the MXU-idiomatic form of the per-pixel tap
    gather); outputs must match the gather+einsum path to f32 ulp
    across display modes, interp kernels, and mirroring."""
    import numpy as np

    from waveform_tpu import (
        AudioInfo,
        DisplayMode,
        InterpMode,
        Settings,
        resolve,
    )
    from waveform_tpu.rebin.apply import make_rebin_fn

    rng = np.random.default_rng(7)
    cases = [
        dict(fft_size=1024, width=300, interp_mode=InterpMode.LANCZOS),
        dict(fft_size=2048, width=257, interp_mode=InterpMode.CATROM,
             mirror_freq_axis=True),
        dict(fft_size=512, width=200, display_mode=DisplayMode.BAR,
             bar_width=8, bar_gap=2, interp_mode=InterpMode.LANCZOS),
        dict(fft_size=1024, width=320, filter_radius=2.5,
             interp_mode=InterpMode.LANCZOS),
    ]
    for kw in cases:
        cfg = resolve(Settings(**kw), AudioInfo(48000, 2))
        db = (-60 + 50 * rng.standard_normal(
            (3, cfg.display_channels, cfg.num_bins))).astype(np.float32)
        monkeypatch.delenv("WAVEFORM_TPU_REBIN", raising=False)
        want = np.asarray(make_rebin_fn(cfg, apply_pixel_map=False)(db))
        monkeypatch.setenv("WAVEFORM_TPU_REBIN", "dense")
        got = np.asarray(make_rebin_fn(cfg, apply_pixel_map=False)(db))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=0,
                                   err_msg=str(kw))
