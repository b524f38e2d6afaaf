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
    """Place a SpectrumState/MeterState pytree with streams sharded.

    Multi-process pods place each leaf from process-local rows (host init
    values are identical on every process, so each contributes its slice);
    single-process placement is a plain sharded device_put."""
    sh = stream_sharding(mesh)
    if jax.process_count() > 1:
        def place(x):
            x = np.asarray(x)
            lo, hi = local_stream_rows(mesh, x.shape[0])
            return from_process_local(sh, x[lo:hi], x.shape)
        return jax.tree.map(place, state)
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


def local_stream_rows(mesh: Mesh, num_streams: int) -> tuple[int, int]:
    """The [start, stop) global stream rows this PROCESS owns.

    With ``P(STREAM_AXIS)`` sharding, rows map to the mesh's stream axis in
    device order; a multi-host pod assigns each process a contiguous run of
    that axis, so per-host feeders only ingest their own streams — the
    analog of FFTW-MPI ranks each owning one 1-D block
    (/root/reference/deps/fftw-3.3.11/mpi/block.c).  In a single process
    this is simply (0, num_streams)."""
    sh = stream_sharding(mesh)
    spans = set()
    for d, idx in sh.devices_indices_map((num_streams,)).items():
        if d.process_index != jax.process_index():
            continue
        sl = idx[0]
        spans.add((0 if sl.start is None else sl.start,
                   num_streams if sl.stop is None else sl.stop))
    if not spans:
        return (0, 0)
    lo = min(a for a, _ in spans)
    hi = max(b for _, b in spans)
    # the (lo, hi) range representation requires each process to own a
    # CONTIGUOUS run of stream rows; a custom device ordering that
    # interleaves processes would silently mis-slice the local block, so
    # verify coverage instead of assuming it
    covered = 0
    end = lo
    for a, b in sorted(spans):
        if a > end:
            raise ValueError(
                "this process's devices own non-contiguous stream rows "
                f"{sorted(spans)}; order the mesh devices so each "
                "process's rows form one block (the FFTW-MPI 1-D block "
                "layout, mpi/block.c)")
        end = max(end, b)
        covered = end
    assert covered == hi
    return (lo, hi)


def from_process_local(sharding: NamedSharding, local: np.ndarray,
                       global_shape: tuple) -> jax.Array:
    """Assemble a global sharded array from this process's rows.

    Multi-host ingestion path: each host calls this with ONLY its local
    block (shape = global with the stream axis cut to its rows); jax wires
    the per-process shards into one global array without any host ever
    materializing the full batch.  Single-process, it degenerates to a
    plain placement of the full array."""
    return jax.make_array_from_process_local_data(
        sharding, np.ascontiguousarray(local), global_shape)


def pad_stream_dim(x: np.ndarray, total: int) -> np.ndarray:
    """Zero-pad a host [S, ...] array to ``total`` streams along axis 0."""
    if x.shape[0] == total:
        return x
    pad = [(0, total - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)
