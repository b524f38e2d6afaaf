"""Device-resident batched level-meter serving.

The meter analog of :class:`~waveform_tpu.runtime.serving.ServingEngine`:
S meter streams tick in ONE device dispatch.  The reference's meter tick
(/root/reference/src/source_generic.cpp:182-269) drains each source's ring
into an M-sample host window and reduces it to RMS/peak per channel;
``WaveformEngine._tick_meter`` reproduced that with O(S) per-stream Python
ring drains under per-stream locks.  Here the meter windows live on device
as the same ``[S, C, M]`` ring the spectrum engine uses — RMS and peak are
permutation-invariant, so the lane-shift ring push IS the meter window
update; no rotation, no host window at all — and the whole
reduce → asymmetric-EMA → dBFS → gate pipeline is one jitted step
(dsp/meter.py::make_meter_serving_step).

Everything host-side — packet queues, A/V sync, the native C++ assembler,
the packed single-upload tick, double-buffer fences, microbatching, bulk
scan — is inherited unchanged.  The only differences:

* packed meta columns are (counts, fresh, show) instead of
  (counts, show&&fresh, rms): the reference gates timeout and hide
  DIFFERENTLY (timeout zeroes the sample ring, hide only the levels,
  src/source_generic.cpp:184-232), so the step needs both bits
* no RMS-squares block (volume normalization is a spectrum-only gain,
  src/source_generic.cpp:161-167) — meter rows are ~1/3 narrower at C=2
* output per tick is the meter levels ``[S, 1, C]`` dBFS (the shape
  WaveformEngine returns), not rebinned pixels
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import ResolvedConfig
from ..dsp.devring import init_ring, push
from ..dsp.meter import init_meter_state, make_meter_serving_step
from .serving import ServingEngine


class MeterServingEngine(ServingEngine):
    """Batched device-resident meter serving for S streams."""

    _split_meta = True

    def _check_mode(self, cfg: ResolvedConfig) -> None:
        if not cfg.meter_mode:
            raise ValueError("MeterServingEngine handles meter mode; use "
                             "ServingEngine for spectrum mode")

    def _wants_rms(self, cfg: ResolvedConfig) -> bool:
        return False   # normalization gain never applies to meter output

    def _init_device_state(self) -> None:
        cfg = self.cfg
        # the meter window ring: fft_size is repurposed as the meter
        # length in samples (sr*meter_ms/1000, src/source.cpp:1121)
        self.ring = init_ring(self.S, self.C, cfg.fft_size)
        self.state = init_meter_state(cfg, self.S)
        self.rms_ring = None

    def _display_values(self, state):
        return state.meter_val[:, None, :]

    def _build_device_programs(self) -> None:
        cfg = self.cfg
        step = make_meter_serving_step(cfg)
        C, H = self.C, self.H

        def packed_tick(flat, ring, state, dt, rms_ring=None, ucount=None):
            """One meter tick on the packed upload: push the new samples
            into the device window ring, then reduce + gate on device.
            ``ucount`` selects the scalar lane-shift push exactly as in
            the spectrum engine (dsp/devring.py)."""
            s = flat.shape[0]
            new = flat[:, :C * H].reshape(s, C, H)
            counts = (flat[:, -3].astype(jnp.int32) if ucount is None
                      else ucount)
            fresh = flat[:, -2] > 0.5
            show = flat[:, -1] > 0.5
            ring = push(ring, new, counts)
            ring, state = step(ring, state, dt, fresh, show)
            out = self._constrain_pixels(self._display_values(state))
            return out, ring, state, rms_ring

        self._tick_packed = self._jit_tick_packed(packed_tick)
        self._tick_packed_u = self._jit_tick_packed_u(packed_tick)
        self._packed_tick_fn = packed_tick   # cohort binding (multi.py)

        def scan_ticks(new_T, counts_T, ring, state, dt, active_T, rms,
                       rms_ring=None):
            """T meter ticks in one dispatch (bulk mode).  The combined
            ``active`` gate stands in for both fresh and show — bulk
            callers have no live capture clock, so an inactive bulk tick
            behaves as a timeout (ring zeroed once, then latched)."""
            def body(carry, xs):
                ring, state, rms_ring = carry
                new, counts, active = xs
                ring = push(ring, new, counts)
                ring, st = step(ring, state, dt, active,
                                jnp.ones_like(active))
                return ((ring, st, rms_ring),
                        self._constrain_pixels(self._display_values(st)))
            (ring, state, rms_ring), outs = jax.lax.scan(
                body, (ring, state, rms_ring), (new_T, counts_T, active_T))
            return outs, ring, state, rms_ring

        self._scan_ticks = self._jit_scan(scan_ticks)

    @property
    def meter_values(self):
        """Latest device meter levels [S, C] dBFS."""
        return self.state.meter_val
