"""Batched TPU spectrum pipeline.

The TPU-native re-design of the reference's per-source, per-ISA virtual
``tick_spectrum`` (/root/reference/src/source_generic.cpp:26-180,
src/source_avx2.cpp:24-209): instead of one SIMD lane-width per OBS source,
one pure function over a ``[S, C, N]`` batch (S streams, C capture channels,
N fft_size) jit-compiled per :class:`ResolvedConfig`.  Runtime CPUID dispatch
disappears; XLA owns codegen.  All tables the reference precomputes in
``update()`` (window coefficients, slope/roll-off modifiers) are baked into
the traced graph as constants.

State (EMA buffers, the ``m_decibels`` work buffers, the silence latch) is
threaded functionally.  ``decibels`` mirrors the reference's ``m_decibels``
array exactly, including its mixed-domain quirk: in mono downmix the fold
writes dBFS into channel 0 while channel 1 retains the pre-fold linear
magnitude (src/source_generic.cpp:150-153 only writes channel 0).

Silence/timeout semantics are replicated exactly, including channel-ordering
(a non-silent channel 0 clears the silence latch before channel 1 is
examined) and the freeze-the-old-frame behavior when every channel is silent
and below the floor gate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..core.config import DB_MIN, ResolvedConfig
from ..core.enums import FFTWindow, TSmoothingMode
from .oracle import TV_EMA_DENOM, rolloff_modifiers, slope_modifiers
from .windows import window_coefficients, window_sum


@struct.dataclass
class SpectrumState:
    """Per-stream carried state (the functional ``m_*`` members).

    The bin axis rides in whatever order the producing step was built
    with (make_spectrum_step's ``bin_order``): natural frequency order by
    default, or the Pallas kernel's block layout on the zero-relayout
    serving path — engines own the boundary conversions (readback,
    checkpoint canonicalization) via :func:`kernel_bin_perm`."""

    tsmooth: jnp.ndarray      # [S, C, nbins] f32 — EMA magnitudes
    decibels: jnp.ndarray     # [S, O, nbins] f32 — the m_decibels buffers
    last_silent: jnp.ndarray  # [S] bool


def init_state(cfg: ResolvedConfig, num_streams: int) -> SpectrumState:
    nbins = cfg.fft_size // 2
    C = max(cfg.capture_channels, 1)
    O = max(cfg.output_channels, C)
    return SpectrumState(
        tsmooth=jnp.zeros((num_streams, C, nbins), jnp.float32),
        decibels=jnp.full((num_streams, O, nbins), DB_MIN, jnp.float32),
        last_silent=jnp.zeros((num_streams,), bool),
    )


def display_decibels(cfg: ResolvedConfig, state: SpectrumState) -> jnp.ndarray:
    """The dB channels the renderer consumes: [S, display_channels, nbins]."""
    return state.decibels[:, :cfg.display_channels]


# df32 splits of 20*log10(2) and 20/ln(10): the exponent term can reach
# ±128 * 6.02 dB, so a plain f32 constant alone injects up to 4.6e-5 dB
_C_E = np.float64(20.0 * np.log10(2.0))
_C_E_HI = np.float32(_C_E)
_C_E_LO = np.float32(_C_E - np.float64(_C_E_HI))
_C_M = np.float64(20.0 / np.log(10.0))
_C_M_HI = np.float32(_C_M)
_C_M_LO = np.float32(_C_M - np.float64(_C_M_HI))


def _db_from_positive(mag: jnp.ndarray) -> jnp.ndarray:
    """20·log10(mag) to ~1e-6 dB absolute for mag > 0.

    XLA:TPU's f32 ``log10`` is ~1e-3 dB off (measured on v5e) — far above
    the <1e-4 dB north star — so the decibel conversion owns its own
    numerics: exact frexp range reduction, an atanh-series ln on
    [sqrt(.5), sqrt(2)) (|z| <= 0.1716, truncation < 1e-8), and a
    double-float constant recombination.
    """
    from ..kernels.exactfft import two_prod, two_sum
    f, e = jnp.frexp(mag)                      # mag = f * 2^e, f in [.5, 1)
    small = f < jnp.float32(0.7071067811865476)
    f = jnp.where(small, f * 2.0, f)
    e = (e - small.astype(e.dtype)).astype(jnp.float32)
    z = (f - 1.0) / (f + 1.0)                  # f-1 exact by Sterbenz
    w = z * z
    poly = 1.0 + w * (jnp.float32(1 / 3) + w * (jnp.float32(1 / 5)
                      + w * (jnp.float32(1 / 7) + w * jnp.float32(1 / 9))))
    lnf = 2.0 * z * poly
    p, pe = two_prod(e, jnp.float32(_C_E_HI))
    q, qe = two_prod(lnf, jnp.float32(_C_M_HI))
    hi, err = two_sum(p, q)
    return hi + (err + pe + qe + e * _C_E_LO + lnf * _C_M_LO)


def dbfs(mag: jnp.ndarray) -> jnp.ndarray:
    """20·log10(mag) with DB_MIN for mag<=0 (src/source.hpp:293-299)."""
    safe = jnp.where(mag > 0.0, mag, 1.0)
    return jnp.where(mag > 0.0, _db_from_positive(safe), DB_MIN)


def gravity_coefficient(cfg: ResolvedConfig, dt: jnp.ndarray) -> jnp.ndarray:
    """EMA retain factor, traced over dt for the time-varying mode
    (src/source.hpp:301-312)."""
    if cfg.tsmoothing == TSmoothingMode.NONE or cfg.gravity <= 0.0:
        return jnp.float32(0.0)
    if cfg.tsmoothing == TSmoothingMode.TVEXPONENTIAL:
        hi = TV_EMA_DENOM * 5.0
        return jnp.exp(-dt / (cfg.gravity * hi)).astype(jnp.float32)
    return jnp.float32(cfg.gravity)


def resolve_fft_backend(fft_backend: str = "auto") -> str:
    """Resolve "auto" to a concrete backend name — the single source of
    truth consulted by both the magnitude pipeline and the shard_map
    routing decision (they must agree, or a sharded engine could trace an
    unpartitionable pallas_call / wrap shard_map around the XLA path)."""
    if fft_backend == "auto":
        import os
        fft_backend = os.environ.get(
            "WAVEFORM_TPU_FFT_BACKEND",
            "exact" if jax.default_backend() == "tpu" else "xla")
    return fft_backend


def _magnitude_pipeline(cfg: ResolvedConfig, samples: jnp.ndarray,
                        rfft_fn, fft_backend: str = "auto",
                        with_nz: bool = False,
                        allow_exact_kernel: bool = True,
                        bin_order: str = "natural"):
    """window → rFFT → |z|·2/Σw → slope (src/source_generic.cpp:97-122).

    ``fft_backend``: "exact" runs the digit-sliced integer-GEMM FFT
    (kernels/exactfft.py — exact products and accumulation on the MXU,
    ~1e-6 dB per-bin error vs the float64 oracle, the FFTW
    accuracy-vs-mp-reference analog); "matmul" the plain GEMM-native
    4-step FFT at "highest" matmul precision (~1e-4..1e-3 dB at deep
    Rayleigh nulls); "xla" jnp.fft.rfft; "auto" picks exact on TPU (the
    north-star <1e-4 dB target binds there), xla elsewhere.  An explicit
    ``rfft_fn`` overrides.

    ``bin_order="block"`` keeps the bin axis in the Pallas kernel's
    native layout (kernels/exact_pallas.block_bin_of_pos) — ZERO
    relayout between the kernel and the EMA/dB consumer on the serving
    hot path; non-kernel backends emit the same order via a gather so
    the contract holds regardless of which lowering ran.
    """
    nbins = cfg.fft_size // 2
    fft_backend = resolve_fft_backend(fft_backend)

    if rfft_fn is None and fft_backend == "exact":
        # the window multiply itself costs ~3e-4 dB at deep nulls in f32,
        # so the exact path applies it in double-float inside the kernel
        from ..kernels.exactfft import rfft_mag_exact
        window = None
        if cfg.window != FFTWindow.NONE:
            w64 = window_coefficients(cfg.window, cfg.fft_size,
                                      cfg.sine_exponent, dtype=np.float64)
            w_hi = w64.astype(np.float32)
            w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
            window = (jnp.asarray(w_hi), jnp.asarray(w_lo))
        nz = None
        if with_nz:
            mag, nz = rfft_mag_exact(samples, nbins, window=window,
                                     with_nz=True,
                                     allow_kernel=allow_exact_kernel,
                                     bin_order=bin_order)
        else:
            mag = rfft_mag_exact(samples, nbins, window=window,
                                 allow_kernel=allow_exact_kernel,
                                 bin_order=bin_order)
        return _mag_tail(cfg, nbins, mag, nz, with_nz, bin_order)

    x = samples
    if cfg.window != FFTWindow.NONE:
        coeffs = jnp.asarray(
            window_coefficients(cfg.window, cfg.fft_size, cfg.sine_exponent,
                                dtype=np.float32))
        x = x * coeffs

    if rfft_fn is not None:
        z = rfft_fn(x)[..., :nbins]  # drop Nyquist, as the reference does
        mag = jnp.abs(z).astype(jnp.float32)
    else:
        if fft_backend == "matmul":
            from ..kernels.matfft import rfft_mag
            mag = rfft_mag(x, nbins)
        elif fft_backend == "xla":
            mag = jnp.abs(jnp.fft.rfft(x))[..., :nbins].astype(jnp.float32)
        else:
            raise ValueError(f"unknown fft_backend {fft_backend!r}; "
                             "expected 'auto', 'exact', 'matmul', or 'xla'")

    if bin_order == "block":
        from ..kernels.exactfft import _to_block_order
        mag = _to_block_order(mag, cfg.fft_size)
    return _mag_tail(cfg, nbins, mag, None, with_nz, bin_order)


def _mag_tail(cfg, nbins, mag, nz, with_nz, bin_order: str = "natural"):
    """Shared normalization + slope tail (ONE copy for every backend, so
    the exact and XLA/matmul paths can never desynchronize here).  Under
    block bin order the per-bin slope CONSTANTS permute instead of the
    data (kernel_bin_perm's whole point)."""
    mag_coeff = 2.0 / window_sum(cfg.window, cfg.fft_size,
                                 cfg.sine_exponent)
    mag = mag * jnp.float32(mag_coeff)
    if cfg.slope > 0.0:
        mods = slope_modifiers(nbins, cfg.slope).astype(np.float32)
        if bin_order == "block":
            from ..kernels.exact_pallas import block_bin_of_pos
            mods = mods[block_bin_of_pos(cfg.fft_size)]
        mag = mag * jnp.asarray(mods)
    return (mag, nz) if with_nz else mag


def _exact_kernel_active(cfg: ResolvedConfig, rfft_fn, fft_backend) -> bool:
    """True when the magnitude pipeline would route through the Pallas
    exact kernel (trace-time decision; the size/policy gate itself lives
    in exact_pallas.kernel_would_run — single source of truth)."""
    if rfft_fn is not None:
        return False
    if resolve_fft_backend(fft_backend) != "exact":
        return False
    from ..kernels.exact_pallas import kernel_would_run
    return kernel_would_run(cfg.fft_size)


def kernel_bin_perm(cfg: ResolvedConfig, rfft_fn=None,
                    fft_backend: str = "auto",
                    allow_exact_kernel: bool = True,
                    stream_shard=None) -> np.ndarray | None:
    """The bin permutation a block-order spectrum step carries, or None.

    Returns ``bin_of_pos`` (natural bin index at each stored position,
    kernels/exact_pallas.block_bin_of_pos) exactly when a step built with
    these arguments routes magnitudes through the Pallas exact kernel —
    the layout under which the kernel's output IS the EMA/dB state layout
    and no per-tick relayout exists.  Engines resolve this ONCE, next to
    their make_spectrum_step call, and hand it to every other bin-axis
    consumer they own (rebin tables, renderer, host readback, checkpoint
    canonicalization) so data layout and constant layout can never
    desynchronize.  None means natural order (CPU paths, explicit
    rfft_fn, non-exact backends, unsupported sizes).
    """
    if not _exact_kernel_active(cfg, rfft_fn, fft_backend):
        return None
    if not (allow_exact_kernel or stream_shard is not None):
        return None
    from ..kernels.exact_pallas import block_bin_of_pos
    return block_bin_of_pos(cfg.fft_size)


def make_spectrum_step(cfg: ResolvedConfig, rfft_fn=None,
                       fft_backend: str = "auto",
                       allow_exact_kernel: bool = True,
                       stream_shard=None,
                       bin_order: str = "natural"):
    """Build the jit-able spectrum step for a resolved config.

    Returns ``step(samples, state, dt, active, input_rms) -> SpectrumState``:

    * ``samples``   [S, C, N] f32 — assembled frames (runtime guarantees N
      samples per stream; prefill covers startup, src/source.cpp:1243-1248)
    * ``dt``        scalar f32 — seconds since last tick
    * ``active``    [S] bool — show && capture-fresh (500 ms timeout gate,
      src/source_generic.cpp:36-48)
    * ``input_rms`` [S] f32 — volume-normalization RMS (0 if unused)

    ``display_decibels(cfg, state)`` of the result is the frame output.

    ``stream_shard`` = (Mesh, stream_axis_name) wraps the magnitude
    pipeline in a stream-axis shard_map when the Pallas exact kernel is
    active, making every kernel call shard-local; note it TAKES
    PRECEDENCE over ``allow_exact_kernel=False``, which only governs the
    non-shard_map fallback (sharded engines pass both: kernel inside
    shard_map, XLA lowering otherwise).

    ``bin_order="block"`` carries the whole state (EMA trail, dB buffer)
    in the Pallas kernel's bin layout so the kernel output feeds the tail
    with NO relayout; per-bin constants (slope, rolloff) permute instead.
    Position 0 is bin 0 under either order (block_bin_of_pos[0] == 0), so
    the reference's bins>=1 normalization/rolloff slices stay positional.
    Engines resolve the matching permutation via :func:`kernel_bin_perm`
    for their rebin/render/readback sides.
    """
    nbins = cfg.fft_size // 2
    C = max(cfg.capture_channels, 1)
    O = max(cfg.output_channels, C)
    D = cfg.display_channels
    floor_gate = jnp.float32(cfg.floor - 10)

    if cfg.rolloff_q > 0.0 and cfg.rolloff_rate > 0.0:
        roll = rolloff_modifiers(
            cfg.fft_size, cfg.audio.samples_per_sec, cfg.cutoff_low,
            cfg.cutoff_high, cfg.rolloff_q,
            cfg.rolloff_rate).astype(np.float32)
        if bin_order == "block":
            from ..kernels.exact_pallas import block_bin_of_pos
            roll = roll[block_bin_of_pos(cfg.fft_size)]
        rolloff = jnp.asarray(roll)
    else:
        rolloff = None

    def step(samples: jnp.ndarray, state: SpectrumState, dt: jnp.ndarray,
             active: jnp.ndarray, input_rms: jnp.ndarray,
             valid: jnp.ndarray | None = None,
             run: jnp.ndarray | None = None) -> SpectrumState:
        samples = samples.astype(jnp.float32)
        if valid is None:
            valid = jnp.ones(samples.shape[:2], bool)   # [S, C]
        g = gravity_coefficient(cfg, dt)
        g2 = 1.0 - g

        # --- full math path for every stream/channel (masked later) ---
        if stream_shard is not None and _exact_kernel_active(
                cfg, rfft_fn, fft_backend):
            # mesh-sharded serving: the Pallas kernel has no SPMD
            # partitioning rule, but the magnitude pipeline is purely
            # per-stream, so shard_map over the stream axis makes every
            # kernel call shard-local — pods keep the all-in-VMEM fast
            # path with zero collectives (the pixel axis, if any, just
            # replicates this stage, exactly as the XLA path would
            # before the rebin's tensor-parallel split)
            from jax import shard_map
            from jax.sharding import PartitionSpec
            mesh, axis = stream_shard
            spec = PartitionSpec(axis)
            mag, nz_k = shard_map(
                lambda s: _magnitude_pipeline(cfg, s, rfft_fn, fft_backend,
                                              with_nz=True,
                                              bin_order=bin_order),
                mesh=mesh, in_specs=spec, out_specs=(spec, spec),
                check_vma=False)(samples)
        else:
            mag, nz_k = _magnitude_pipeline(
                cfg, samples, rfft_fn, fft_backend, with_nz=True,
                allow_exact_kernel=allow_exact_kernel,
                bin_order=bin_order)  # [S, C, nbins]

        if cfg.tsmoothing != TSmoothingMode.NONE:
            old = state.tsmooth
            if cfg.fast_peaks:
                old = jnp.maximum(mag, old)
            mag_s = g * old + g2 * mag
        else:
            mag_s = mag

        # --- silence gating (src/source_generic.cpp:63-95), vectorized ---
        # channels whose ring lacked data are skipped entirely: they neither
        # scan (can't clear the latch) nor count toward it (the reference
        # `continue`s before the silence scan, source_generic.cpp:60-61)
        # `nz_k` comes from the exact Pallas kernel when active (the kernel
        # reads every raw sample anyway, so the predicate is free — see
        # exact_pallas._kernel_real_mag); otherwise re-scan the window here.
        # note: an incremental trailing-zero tracker on the device ring
        # (O(S·C) compare instead of this window rescan) measured SLOWER on
        # v5e — 656 vs 623 µs/tick at [256,2,4096] — because XLA fuses this
        # reduction into the window-multiply read the FFT makes anyway,
        # while a tracker pays a real extra pass over each fresh chunk
        if nz_k is None:
            nz_k = jnp.any(samples != 0.0, axis=-1)      # [S, C] has input
        nz = nz_k & valid
        # latch value as seen by channel c: earlier channels may clear it
        ls0 = state.last_silent
        ls_seen_list = [ls0]
        for c in range(1, C):
            ls_seen_list.append(ls_seen_list[-1] & ~nz[:, c - 1])
        ls_seen = jnp.stack(ls_seen_list, axis=1)        # [S, C]

        # outsilent: display-channel dB all <= floor-10 (channel 0 in mono)
        disp_ch = [c if cfg.stereo else 0 for c in range(C)]
        out_silent = jnp.stack(
            [jnp.all(state.decibels[:, disp_ch[c]] <= floor_gate, axis=-1)
             for c in range(C)], axis=1)                  # [S, C]

        silent = ~nz
        if not cfg.stereo and C > 1:
            # sequential-channel parity: the reference scans m_decibels[0]
            # MID-tick (source_generic.cpp:82 with ch=0 in mono), so once
            # an earlier channel processes, the buffer holds fresh LINEAR
            # magnitudes (>= 0, always above the negative floor-10 gate)
            # and a later silent channel can never read outsilent — it
            # runs and its EMA decays instead of freezing stale values
            os0 = out_silent[:, 0]
            os_list = [os0]
            proc_before = valid[:, 0] & ~(silent[:, 0]
                                          & (ls_seen[:, 0] | os0))
            for c in range(1, C):
                osc = out_silent[:, c] & ~proc_before
                os_list.append(osc)
                proc_before = proc_before | (
                    valid[:, c] & ~(silent[:, c] & (ls_seen[:, c] | osc)))
            out_silent = jnp.stack(os_list, axis=1)
        skip = ~valid | (silent & (ls_seen | out_silent))  # keeps old state
        counted = valid & silent & ~ls_seen & out_silent   # adds to latch count
        latch_survives = ls0 & jnp.all(~nz, axis=1)
        latch_set = jnp.all(counted, axis=1)
        new_last_silent = latch_survives | latch_set     # [S]

        pm = (~skip)[:, :, None]
        new_tsmooth = jnp.where(pm, mag_s, state.tsmooth)
        # skipped channels keep their old m_decibels value verbatim
        work = jnp.where(pm, mag_s, state.decibels[:, :C])  # [S, C, nbins]

        # --- duplicate mono capture for stereo output (src:141-142) ---
        if O > C:
            work = jnp.concatenate([work, work[:, :1]], axis=1)  # [S, O, nbins]

        # --- channel fold (src/source_generic.cpp:144-159) ---
        if cfg.stereo:
            folded = dbfs(work)
        elif C == 2:
            d0 = dbfs((work[:, :1] + work[:, 1:2]) * 0.5)
            folded = jnp.concatenate([d0, work[:, 1:]], axis=1)
        else:
            folded = dbfs(work)

        # --- volume normalization, display channels, bins>=1 (src:161-167) ---
        if cfg.normalize_volume:
            comp = jnp.minimum(cfg.volume_target - dbfs(input_rms), cfg.max_gain)
            folded = folded.at[:, :D, 1:].add(comp[:, None, None])

        # --- roll-off, display channels, bins>=1 (src:169-179) ---
        if rolloff is not None:
            folded = folded.at[:, :D, 1:].set(
                jnp.maximum(folded[:, :D, 1:] - rolloff[1:], DB_MIN))

        # streams that latched silent keep their previous frame verbatim
        frozen = new_last_silent[:, None, None]
        new_db = jnp.where(frozen, state.decibels, folded)

        # --- timeout / hidden: decay to DB_MIN unless already latched ---
        # (src/source_generic.cpp:36-48); only display channels are cleared
        timed_out = ~active
        to_fresh = (timed_out & ~state.last_silent)[:, None, None]
        to_bc = timed_out[:, None, None]
        new_tsmooth = jnp.where(to_fresh, 0.0,
                                jnp.where(to_bc, state.tsmooth, new_tsmooth))
        cleared = state.decibels.at[:, :D].set(DB_MIN)
        new_db = jnp.where(to_fresh, cleared,
                           jnp.where(to_bc, state.decibels, new_db))
        new_last_silent = jnp.where(timed_out, True, new_last_silent)

        if run is not None:
            # streams whose tick never ran (capture lost, retry pending)
            # freeze verbatim (src/source.cpp:1333-1336 early return)
            rb = run[:, None, None]
            new_tsmooth = jnp.where(rb, new_tsmooth, state.tsmooth)
            new_db = jnp.where(rb, new_db, state.decibels)
            new_last_silent = jnp.where(run, new_last_silent, state.last_silent)

        return SpectrumState(tsmooth=new_tsmooth, decibels=new_db,
                             last_silent=new_last_silent)

    return step
