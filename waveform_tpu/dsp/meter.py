"""Batched level-meter mode.

The reference repurposes ``m_decibels`` as a raw sample ring of
``sr·meter_ms/1000`` samples and reduces it to one RMS or peak level per
channel with asymmetric EMA smoothing
(/root/reference/src/source_generic.cpp:182-269; AVX form
src/source_avx.cpp:202-303).  Here the per-stream sample windows live in one
``[S, C, M]`` array (host-updated ring, see runtime/engine.py) and the whole
reduction + smoothing + dBFS runs as one batched device step.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.config import DB_MIN, ResolvedConfig
from ..core.enums import TSmoothingMode
from .spectrum import dbfs, gravity_coefficient


@struct.dataclass
class MeterState:
    meter_buf: jnp.ndarray    # [S, C] f32 — EMA accumulator (linear)
    meter_val: jnp.ndarray    # [S, C] f32 — output level (dBFS)
    last_silent: jnp.ndarray  # [S] bool


def init_meter_state(cfg: ResolvedConfig, num_streams: int) -> MeterState:
    C = max(cfg.capture_channels, 1)
    return MeterState(
        meter_buf=jnp.full((num_streams, C), DB_MIN, jnp.float32),
        meter_val=jnp.full((num_streams, C), DB_MIN, jnp.float32),
        last_silent=jnp.zeros((num_streams,), bool),
    )


def make_meter_step(cfg: ResolvedConfig):
    """Build ``step(window, state, dt, fresh, show) -> MeterState``.

    * ``window`` [S, C, M] f32 — the meter sample rings (order-independent:
      RMS and peak are permutation-invariant, so the host never needs to
      rotate the ring into time order)
    * ``fresh``  [S] bool — capture younger than the 500 ms timeout
    * ``show``   [S] bool — source visible

    Timeout semantics (src/source_generic.cpp:184-199): the *host* zeroes the
    ring for streams where ``~fresh & ~last_silent`` (the reference memsets
    m_decibels); this step handles the level/latch updates for all gates.
    """
    M = cfg.fft_size  # ring length in samples (repurposed, src/source.cpp:1121)
    floor_gate = float(cfg.floor - 10)
    use_ema = cfg.tsmoothing != TSmoothingMode.NONE

    def step(window: jnp.ndarray, state: MeterState, dt: jnp.ndarray,
             fresh: jnp.ndarray, show: jnp.ndarray,
             run: jnp.ndarray | None = None) -> MeterState:
        if cfg.meter_rms:
            out = jnp.sqrt(jnp.sum(window * window, axis=-1) / M)
        else:
            out = jnp.max(jnp.abs(window), axis=-1)

        if use_ema:
            g = gravity_coefficient(cfg, dt)
            blended = g * state.meter_buf + (1.0 - g) * out
            if cfg.fast_peaks:
                # rising values bypass the EMA (src/source_generic.cpp:256-257)
                out = jnp.where(out > state.meter_buf, out, blended)
            else:
                out = blended
        new_buf = out
        new_val = dbfs(out)
        new_silent = jnp.sum(new_val < floor_gate, axis=-1) >= max(
            cfg.capture_channels, 1)

        # gates: timeout (~fresh) or hidden (~show) → zero levels + latch
        gated = ~(fresh & show)
        keep = (~fresh) & state.last_silent      # early return: frozen
        zeroed_buf = jnp.zeros_like(new_buf)
        db_min_val = jnp.full_like(new_val, DB_MIN)

        buf = jnp.where(keep[:, None], state.meter_buf,
                        jnp.where(gated[:, None], zeroed_buf, new_buf))
        val = jnp.where(keep[:, None], state.meter_val,
                        jnp.where(gated[:, None], db_min_val, new_val))
        silent = jnp.where(keep, state.last_silent,
                           jnp.where(gated, True, new_silent))
        if run is not None:
            # streams whose host tick never ran freeze verbatim (the
            # reference's early return; folded in here so the engine needs
            # no eager where-merge dispatches)
            buf = jnp.where(run[:, None], buf, state.meter_buf)
            val = jnp.where(run[:, None], val, state.meter_val)
            silent = jnp.where(run, silent, state.last_silent)
        return MeterState(meter_buf=buf, meter_val=val, last_silent=silent)

    return step
