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
    """Rolling sample windows: buf[s, c, -1] is the newest synced sample."""

    buf: jnp.ndarray  # [S, C, L] f32


def init_ring(num_streams: int, channels: int, window: int) -> DeviceRing:
    return DeviceRing(buf=jnp.zeros((num_streams, channels, window),
                                    jnp.float32))


def push(ring: DeviceRing, new: jnp.ndarray, counts: jnp.ndarray) -> DeviceRing:
    """Advance each stream's window by ``counts[s]`` samples.

    * ``new``    [S, C, H] f32 — fresh samples, left-aligned, zero-padded
    * ``counts`` [S] int32 — valid samples per stream, 0..H

    window'[s] = (window[s] ++ new[s])[counts[s] : counts[s]+L]
    """
    S, C, L = ring.buf.shape
    full = jnp.concatenate([ring.buf, new.astype(jnp.float32)], axis=-1)

    def advance(stream_full, count):
        return jax.lax.dynamic_slice_in_dim(stream_full, count, L, axis=-1)

    return DeviceRing(buf=jax.vmap(advance)(full, counts))
