"""Device-resident audio window ring.

The reference assembles every FFT window on the host by popping/peeking a
CPU ring (/root/reference/src/source_generic.cpp:50-61) — cheap over PCIe,
ruinous at 256 streams × 60 fps if every window crosses the host↔device
link (a 4096-pt window re-uploads 5× more bytes than the audio that actually
arrived: windows overlap, hop ≈ sr/fps).

TPU-native redesign: the rolling window lives on device as ``[S, C, L]``;
the host pushes only the *new* samples each tick (padded to a static hop
budget ``H``) plus per-stream counts, and the device advances each stream's
window with a vmapped dynamic slice.  Host→device traffic drops from
S·C·L·4 B to S·C·hop·4 B per tick (≈5× less at 60 fps/48 kHz/4096-pt) and
the window never leaves HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DeviceRing:
    """Rolling sample windows: ``view3[s, c, -1]`` is the newest synced
    sample.

    Two storage layouts share one type:

    * ``channels == 0`` (default): ``buf`` is the natural ``[S, C, L]``.
    * ``channels == C > 0``: ``buf`` is the FLAT ``[S*C, L]`` row-major
      flatten of the same data.  Why: XLA's layout assignment tiles a
      ``[S, 2, L]`` f32 as T(2,128) (the size-2 sublane axis), while the
      exact Pallas kernel wants T(8,128) blocks — so every tick paid a
      full-ring relayout copy between the push and the kernel, and the
      push fusion itself ran at 2-sublane granularity.  The 2-D form
      tiles T(8,128) end to end: measured on v5e at N=4096/S=256 the
      push fusion fell 21.4 → 5.5 µs/tick and the relayout 16.8 → 11.1
      (device-true 199 → 172.6 µs full tick, −13%).
    """

    buf: jnp.ndarray  # [S, C, L] f32, or [S*C, L] when channels > 0
    channels: int = struct.field(pytree_node=False, default=0)

    @property
    def view3(self) -> jnp.ndarray:
        """The canonical [S, C, L] view (free bitcast of the flat form)."""
        if self.channels:
            r, L = self.buf.shape
            return self.buf.reshape(r // self.channels, self.channels, L)
        return self.buf


def init_ring(num_streams: int, channels: int, window: int,
              flat: bool = False) -> DeviceRing:
    if flat:
        return DeviceRing(buf=jnp.zeros((num_streams * channels, window),
                                        jnp.float32), channels=channels)
    return DeviceRing(buf=jnp.zeros((num_streams, channels, window),
                                    jnp.float32))


def push(ring: DeviceRing, new: jnp.ndarray, counts: jnp.ndarray) -> DeviceRing:
    """Advance each stream's window by ``counts[s]`` samples.

    * ``new``    [S, C, H] f32 — fresh samples, left-aligned, zero-padded
    * ``counts`` [S] int32 — valid samples per stream, 0..H — or a scalar
      int32 advancing every stream uniformly

    window'[s] = (window[s] ++ new[s])[counts[s] : counts[s]+L]

    The scalar form is the hot path: one scalar-offset ``dynamic_slice`` of
    the whole batch, which Mosaic lowers to a contiguous lane shift
    (~7 µs/tick at [256, 2, 4096] on v5e).  The per-stream form lowers to a
    batched gather over the full window — measured 0.3–1.0 ms/tick on the
    same shape — so callers that know their streams are in lockstep (the
    steady serving state: every ring synced to the same clock) should pass
    the scalar.  ``runtime/serving.py`` compiles both programs and picks
    per tick on the host, the XLA analog of FFTW selecting a specialized
    plan when the problem has uniform stride (deps/fftw-3.3.11/kernel/
    planner.c search over solver variants).

    Flat rings (``ring.channels > 0``, see :class:`DeviceRing`) accept the
    same ``new``/``counts`` shapes: ``new`` flattens row-major onto the
    [S*C, H] rows and per-stream counts repeat onto each stream's C rows.
    """
    if ring.channels and new.ndim == 3:
        new = new.reshape(ring.buf.shape[0], new.shape[-1])
    full = jnp.concatenate([ring.buf, new.astype(jnp.float32)], axis=-1)
    L = ring.buf.shape[-1]

    if jnp.ndim(counts) == 0:
        return DeviceRing(
            buf=jax.lax.dynamic_slice_in_dim(full, counts, L, axis=-1),
            channels=ring.channels)

    if ring.channels and counts.shape[0] * ring.channels == full.shape[0]:
        counts = jnp.repeat(counts, ring.channels)

    def advance(stream_full, count):
        return jax.lax.dynamic_slice_in_dim(stream_full, count, L, axis=-1)

    return DeviceRing(buf=jax.vmap(advance)(full, counts),
                      channels=ring.channels)
