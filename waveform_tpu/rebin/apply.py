"""JAX application of the rebin tables: the render-time resampling stage.

Composes, per frame and per display channel:
interp gather (Lanczos/Catmull-Rom/point) → optional bar band averaging →
optional Gaussian smoothing → dB→pixel mapping → optional mirroring —
the batched equivalent of /root/reference/src/source.cpp:1380-1424 (curve)
and :1505-1564 (bars).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import ResolvedConfig
from ..core.enums import FilterMode
from .filter import build_gauss_tables
from .interp import build_interp_tables, mirror_indices


def _interp_matrix(taps: np.ndarray, weights: np.ndarray,
                   nbins: int) -> np.ndarray:
    """The interp stage as a dense [nbins, P] matrix: column p carries
    weight[p, t] at row taps[p, t] (duplicate taps from edge clamping
    accumulate, matching the gather+einsum sum)."""
    P, T = taps.shape
    m = np.zeros((nbins, P), np.float32)
    np.add.at(m, (taps, np.broadcast_to(np.arange(P)[:, None], (P, T))),
              weights.astype(np.float32))
    return m


def make_rebin_fn(cfg: ResolvedConfig, *, apply_pixel_map: bool = True,
                  bin_perm: np.ndarray | None = None):
    """Build ``rebin(db [..., nbins]) -> [..., P]`` for the resolved config.

    ``top``/``bottom`` are the pixel-map endpoints; curve mode uses
    ``(0, cpos - channel_offset)`` and bars ``(border_top, border_bottom)``
    (src/source.cpp:1408-1417, 1548-1557) — the caller supplies them since
    they depend on render geometry. With ``apply_pixel_map=False`` the output
    stays in dBFS.

    ``bin_perm`` declares the INPUT's bin layout: position p of ``db``
    holds natural bin ``bin_perm[p]`` (the serving engine's block-order
    state, dsp/spectrum.kernel_bin_perm).  The interp CONSTANTS permute
    to match — dense-matrix rows reorder, gather taps re-index — so a
    block-order frame rebins with zero extra per-tick work; output pixel
    order is unaffected.
    """
    tables = build_interp_tables(cfg)
    nat_taps = tables.taps.astype(np.int32)
    if bin_perm is not None:
        # taps address natural bins; the data stores bin b at position
        # argsort(bin_perm)[b]
        pos_of_bin = np.argsort(np.asarray(bin_perm)).astype(np.int32)
        nat_taps = pos_of_bin[nat_taps]
    taps = jnp.asarray(nat_taps)                             # [P, T]
    weights = jnp.asarray(tables.weights)                    # [P, T]
    band = (None if tables.band_matrix is None
            else jnp.asarray(tables.band_matrix))            # [B, P]
    # WAVEFORM_TPU_REBIN=dense routes the interp stage through one
    # [nbins, P] f32 matmul on the MXU instead of a VPU gather+einsum —
    # the TPU-idiomatic form of apply_interp_filter_fma3 (a per-pixel
    # 8-tap gather IS a sparse matrix; filter_fma3.cpp:77-101).  The 2040
    # zero rows per column add exactly 0.0 in f32, so only the 8 real
    # taps reassociate — same ulp class as the einsum.  precision=HIGHEST
    # keeps the f32 mantissa on the MXU's bf16 passes.
    #
    # MEASURED on v5e (r4, full tick at N=4096/S=256): dense 0.351 vs
    # gather 0.386 ms/tick (+10% end-to-end; outputs within 1.5e-5 dB) —
    # so dense is the TPU default up to 8192 input bins, where the
    # materialized [nbins, P] matrix stays a few MB (at N=65536 it would
    # be a 105 MB constant re-read every tick for 8 real taps/pixel —
    # the gather keeps that sparse).  CPU keeps the gather (no MXU).
    # rows = the config's bin-axis width (waveform mode repurposes
    # fft_size as its pixel-buffer width; spectrum rebins num_bins)
    from ..core.enums import DisplayMode
    nbins_in = (cfg.fft_size
                if cfg.display_mode == DisplayMode.WAVEFORM
                else cfg.num_bins)
    mode = os.environ.get("WAVEFORM_TPU_REBIN", "auto")
    if mode not in ("dense", "gather"):
        try:
            on_tpu = jax.default_backend() == "tpu"
        except Exception:   # backend init may fail mid-import
            on_tpu = False
        mode = "dense" if on_tpu and nbins_in <= 8192 else "gather"
    dense = mode == "dense"
    if dense:
        # nat_taps already carries any bin_perm re-index, so the matrix
        # rows land in the input's storage order directly
        imat = jnp.asarray(_interp_matrix(
            nat_taps, tables.weights, nbins_in))

    n_out = tables.num_outputs
    use_gauss = cfg.filter_mode == FilterMode.GAUSS and not cfg.meter_mode
    if use_gauss:
        gt = build_gauss_tables(cfg.settings.filter_radius, n_out)
        gw = jnp.asarray(gt.weights)
        grenorm = jnp.asarray(gt.renorm)
        pad = (len(gt.weights) - 1) // 2

    if cfg.mirror_freq_axis:
        mirror = jnp.asarray(mirror_indices(n_out))

    dbrange = float(cfg.ceiling - cfg.floor)

    def rebin(db: jnp.ndarray, top: jnp.ndarray | float = 0.0,
              bottom: jnp.ndarray | float = 0.0) -> jnp.ndarray:
        if dense:
            # interp as one MXU matmul (see the WAVEFORM_TPU_REBIN note)
            vals = jnp.matmul(db, imat,
                              precision=jax.lax.Precision.HIGHEST)
        else:
            # interp: gather taps along the bin axis, reduce with the LUT
            gathered = jnp.take(db, taps, axis=-1)           # [..., P, T]
            vals = jnp.einsum("...pt,pt->...p", gathered, weights)
        if band is not None:
            vals = jnp.einsum("...p,bp->...b", vals, band)
        if use_gauss:
            # zero-padded conv divided by the per-pixel valid-weight sum is
            # exactly the reference's edge renormalization (filter.hpp:133-158)
            padded = jnp.pad(vals, [(0, 0)] * (vals.ndim - 1) + [(pad, pad)])
            smoothed = jnp.zeros_like(vals)
            for j in range(len(gt.weights)):
                smoothed = smoothed + padded[..., j:j + vals.shape[-1]] * gw[j]
            vals = smoothed / grenorm
        if apply_pixel_map:
            t = jnp.clip(cfg.ceiling - vals, 0.0, dbrange) / dbrange
            vals = top + (bottom - top) * t
        if cfg.mirror_freq_axis:
            vals = jnp.take(vals, mirror, axis=-1)
        return vals

    return rebin
