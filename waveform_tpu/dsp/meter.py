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
from .devring import DeviceRing
from .spectrum import dbfs, gravity_coefficient


@struct.dataclass
class MeterState:
    meter_buf: jnp.ndarray    # [S, C] f32 — EMA accumulator (linear)
    meter_val: jnp.ndarray    # [S, C] f32 — output level (dBFS)
    last_silent: jnp.ndarray  # [S] bool


def init_meter_state(cfg: ResolvedConfig, num_streams: int) -> MeterState:
    C = max(cfg.capture_channels, 1)
    return MeterState(
        # the EMA accumulator is LINEAR and starts at zero
        # (src/source.hpp:128 `m_meter_buf[2] = {0.0f, 0.0f}`); only the
        # dBFS output starts at the floor
        meter_buf=jnp.zeros((num_streams, C), jnp.float32),
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


def make_meter_serving_step(cfg: ResolvedConfig):
    """Device-resident serving variant: every gate INCLUDING the timeout
    ring-zeroing runs on device, so a tick is one dispatch with no host
    state (the serving engine's device ring replaces the host window).

    Builds ``step(ring, state, dt, fresh, show) -> (ring, state)``
    matching the reference tick_meter exactly (src/source_generic.cpp:
    182-269):

    * timeout + already latched → early return: everything frozen
    * timeout + not latched     → sample ring zeroed, levels zeroed,
      value DB_MIN, silence latched (the m_decibels memset, :184-199)
    * hidden (fresh, !show)     → levels zeroed/latched but the ring KEEPS
      its drained samples (:225-232 — the drain runs before the show gate)
    * live                      → RMS/peak over the ring, asymmetric-fast-
      peak EMA, dBFS, latch when every channel is under floor−10 dB

    One accepted divergence, inherited from serving's push-then-step
    order: samples still queued at the timeout instant are pushed and then
    zeroed with the ring, where the reference leaves them in the host ring
    for the post-recovery drain.  Bounded by one hop budget of audio and
    only reachable when capture dies with a non-empty queue.
    """
    M = cfg.fft_size  # ring length in samples (repurposed, src/source.cpp:1121)
    floor_gate = float(cfg.floor - 10)
    use_ema = cfg.tsmoothing != TSmoothingMode.NONE
    C = max(cfg.capture_channels, 1)

    def step(ring: DeviceRing, state: MeterState, dt: jnp.ndarray,
             fresh: jnp.ndarray, show: jnp.ndarray
             ) -> tuple[DeviceRing, MeterState]:
        window = ring.buf  # [S, C, M]
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
        new_val = dbfs(out)
        new_silent = jnp.sum(new_val < floor_gate, axis=-1) >= C

        timeout = ~fresh
        frozen = timeout & state.last_silent   # early return (:187-188)
        gated = timeout | ~show                # zero levels + latch
        zero_ring = timeout & ~state.last_silent  # first timeout tick only

        buf = jnp.where(frozen[:, None], state.meter_buf,
                        jnp.where(gated[:, None], 0.0, out))
        val = jnp.where(frozen[:, None], state.meter_val,
                        jnp.where(gated[:, None], DB_MIN, new_val))
        silent = jnp.where(frozen, state.last_silent,
                           gated | new_silent)
        rbuf = jnp.where(zero_ring[:, None, None], 0.0, ring.buf)
        return (DeviceRing(buf=rbuf),
                MeterState(meter_buf=buf, meter_val=val, last_silent=silent))

    return step
