"""Multi-chip serving demo on a virtual device mesh.

Runs the mesh-distributed ShardedServingEngine (stream data-parallel x
pixel tensor-parallel) on an 8-device virtual CPU mesh so the multi-chip
path can be exercised on any machine:

    python examples/sharded_demo.py

On a real TPU pod slice, drop the environment overrides below and the
same engine shards over the physical devices (parallel/mesh.py builds the
mesh from jax.devices()).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if "XLA_FLAGS" not in os.environ:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["WAVEFORM_TPU_EXACT_KERNEL"] = "always"
    os.environ["WAVEFORM_TPU_EXACT_INTERPRET"] = "1"

import numpy as np  # noqa: E402
import jax  # noqa: E402

# env vars alone are too late once a sitecustomize has imported jax, so
# mirror JAX_PLATFORMS into the live config — but only when it is set:
# on a real pod with no override this must NOT pin the demo to CPU
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import waveform_tpu as wt  # noqa: E402
from waveform_tpu.parallel.sharded_serving import ShardedServingEngine  # noqa: E402

SR, NS = 48000, 1_000_000_000


def main() -> int:
    print(f"devices: {jax.device_count()} x {jax.devices()[0].platform}")
    cfg = wt.resolve(wt.Settings(fft_size=1024, width=256),
                     wt.AudioInfo(SR, 2))
    # 100 streams shard over 4 mesh rows (padded to 104, the FFTW-MPI
    # partial-last-block analog); rebin pixels split 2-way
    eng = ShardedServingEngine(cfg, num_streams=100, pixel_parallel=2)

    now = NS
    phase = 0
    for _ in range(30):
        t = (np.arange(800) + phase) / SR
        for s in range(100):
            x = np.sin(2 * np.pi * (200.0 + 40.0 * s) * t,
                       dtype=np.float64).astype(np.float32)
            eng.feed(s, np.stack([x, x]), now, now_ns=now)
        phase += 800
        now += 800 * NS // SR
        pixels = eng.tick(now_ns=now)

    print(f"pixels {pixels.shape} sharding "
          f"{getattr(pixels, 'sharding', None)}")
    db = eng.read_decibels()
    for s in (0, 50, 99):
        pk = int(np.argmax(db[s, 0])) * SR / cfg.fft_size
        print(f"stream {s:3d}: peak {pk:7.1f} Hz "
              f"(fed {200.0 + 40.0 * s:7.1f} Hz)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
