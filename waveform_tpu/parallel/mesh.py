"""Device-mesh parallelism for multi-chip stream serving.

The reference's only distributed machinery is FFTW's MPI layer (1-D block
distribution + Alltoall transposes, /root/reference/deps/fftw-3.3.11/mpi/);
the plugin itself is single-process (SURVEY.md §2c).  The TPU-native answer
is a ``jax.sharding.Mesh`` over ICI with XLA-inserted collectives:

* **stream axis (data parallel)** — the primary scale axis: concurrent audio
  streams shard across chips with zero collectives (embarrassingly parallel,
  the analog of FFTW's "howmany" vector loops fanning across threads).
* **pixel axis (tensor parallel)** — the rebin stage's output pixels shard
  across a second mesh axis: each chip gathers the (replicated-after-FFT)
  bins it needs for its pixel block; XLA turns the sharding constraints into
  the minimal all-gather, the analog of FFTW-MPI's distributed transpose.

Intra-FFT sequence sharding (splitting one transform's butterfly stages
across chips) is out of scope at 64k points — one chip holds the largest
supported window trivially (SURVEY.md §5 long-context).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

STREAM_AXIS = "stream"
PIXEL_AXIS = "pixel"


def make_mesh(devices=None, pixel_parallel: int = 1) -> Mesh:
    """Mesh over (stream, pixel). ``pixel_parallel`` chips cooperate on one
    frame's rebin; the rest scale streams."""
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if n % pixel_parallel != 0:
        raise ValueError(f"{n} devices not divisible by pixel_parallel="
                         f"{pixel_parallel}")
    arr = np.asarray(devices).reshape(n // pixel_parallel, pixel_parallel)
    return Mesh(arr, (STREAM_AXIS, PIXEL_AXIS))


def stream_sharding(mesh: Mesh) -> NamedSharding:
    """[S, ...] arrays: shard the stream axis, replicate the rest."""
    return NamedSharding(mesh, P(STREAM_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_state(mesh: Mesh, state):
    """Place a SpectrumState/MeterState pytree with streams sharded."""
    sh = stream_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), state)


def pixel_constraint(mesh: Mesh, x):
    """Constrain a [..., P]-shaped rebin output to (stream, ..., pixel)."""
    spec = [STREAM_AXIS] + [None] * (x.ndim - 2) + [PIXEL_AXIS]
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))


def stream_axis_size(mesh: Mesh) -> int:
    return mesh.shape[STREAM_AXIS]


def padded_streams(mesh: Mesh, num_streams: int) -> int:
    """Smallest stream count >= num_streams divisible across the mesh.

    XLA shardings require even splits; uneven user stream counts round up
    with inactive padding streams — the analog of FFTW-MPI's 1-D block
    distribution where the last rank holds a partial block
    (/root/reference/deps/fftw-3.3.11/mpi/block.c)."""
    n = stream_axis_size(mesh)
    return -(-num_streams // n) * n


def pad_stream_dim(x: np.ndarray, total: int) -> np.ndarray:
    """Zero-pad a host [S, ...] array to ``total`` streams along axis 0."""
    if x.shape[0] == total:
        return x
    pad = [(0, total - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)
