"""Multi-chip parallelism: device meshes, shardings, sharded serving."""

from .mesh import (
    PIXEL_AXIS,
    STREAM_AXIS,
    make_mesh,
    pad_stream_dim,
    padded_streams,
    pixel_constraint,
    replicated,
    shard_state,
    stream_axis_size,
    stream_sharding,
)
from .sharded_serving import (
    ShardedMeterServingEngine,
    ShardedServingEngine,
)
from .sharded_waveform import ShardedWaveformEngine

__all__ = [
    "PIXEL_AXIS",
    "STREAM_AXIS",
    "ShardedMeterServingEngine",
    "ShardedServingEngine",
    "ShardedWaveformEngine",
    "make_mesh",
    "pad_stream_dim",
    "padded_streams",
    "pixel_constraint",
    "replicated",
    "shard_state",
    "stream_axis_size",
    "stream_sharding",
]
