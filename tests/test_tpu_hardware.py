"""Real-hardware certification of the shard_map + Mosaic kernel path.

The rest of the suite runs the sharded engine's kernel in interpret mode
on the conftest-forced 8-virtual-CPU mesh (the check.pl-localhost-MPI
analog) — which validates jax semantics but never compiles Mosaic.  This
test spawns a subprocess WITHOUT the forced-CPU environment: on a machine
with a TPU it builds a 1-device TPU mesh, runs ShardedServingEngine with
the Pallas kernel ACTIVE (not interpret) under shard_map, and checks the
output; off-TPU it skips.  The analog of FFTW verifying real MPI plans
instead of only the localhost simulation (deps/fftw-3.3.11/mpi/api.c).
bench.py runs the same certification every benchmark run.
"""

import os
import subprocess
import sys

import pytest

CHILD = r"""
import numpy as np
import jax

if jax.default_backend() != "tpu":
    print("NO_TPU")
    raise SystemExit(0)

from waveform_tpu.utils.wisdom import enable
enable()   # reuse bench's compiled program if present

from jax.sharding import Mesh
from waveform_tpu import AudioInfo, Settings, resolve
from waveform_tpu.kernels.exact_pallas import kernel_would_run
from waveform_tpu.parallel.sharded_serving import ShardedServingEngine

cfg = resolve(Settings(fft_size=4096), AudioInfo(48000, 2))
assert kernel_would_run(cfg.fft_size), "kernel must be active on TPU"
mesh = Mesh(np.array(jax.devices()[:1]).reshape(1, 1), ("stream", "pixel"))
eng = ShardedServingEngine(cfg, 8, mesh=mesh)
hop = 800
pkt = np.full((8, 2, hop), 0.25, np.float32)
now = 1_000_000_000
for _ in range(3):
    eng.feed_batch(pkt, now, now_ns=now)
    now += hop * 1_000_000_000 // 48000
    px = eng.tick(now_ns=now)
jax.block_until_ready(px)
out = np.asarray(px)
assert np.isfinite(out).all() and out.shape[0] == 8
print("TPU_OK")
"""


def test_shard_map_mosaic_on_real_tpu():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", CHILD], env=env, cwd=repo,
                       capture_output=True, text=True, timeout=600)
    out = r.stdout + r.stderr
    if "NO_TPU" in out:
        pytest.skip("no TPU backend on this machine")
    assert r.returncode == 0 and "TPU_OK" in out, out[-2000:]


MATRIX_CHILD = r"""
import numpy as np
import jax

if jax.default_backend() != "tpu":
    print("NO_TPU")
    raise SystemExit(0)

from waveform_tpu.utils.wisdom import enable
enable()   # reuse the tuner/bench's compiled programs where present

import jax.numpy as jnp
from waveform_tpu.kernels.exact_pallas import (
    _block_streams,
    block_bin_of_pos,
    rfft_rows_mag_packed,
    supports,
)

rng = np.random.default_rng(42)
checked = 0
for n in (1024, 4096, 32768):
    S = max(4, min(64, (1 << 22) // n))
    x = (0.5 * rng.standard_normal((S * 2, n))).astype(np.float32)
    w64 = np.hanning(n + 1)[:n].astype(np.float64)
    w_hi = w64.astype(np.float32)
    w_lo = (w64 - w_hi.astype(np.float64)).astype(np.float32)
    want = np.abs(np.fft.rfft(
        x.reshape(S, 2, n).astype(np.float64) * w64))[..., :n // 2]
    for split in (2, 3):
        if not supports(n, split):
            continue
        for ddt in ("bf16", "int8"):
            for twd in ("f32", "df"):
                bs0 = _block_streams(n, split=split, ddt=ddt, want=16)
                m2, nz = rfft_rows_mag_packed(
                    jnp.asarray(x), jnp.asarray(w_hi), jnp.asarray(w_lo),
                    split=split, ddt=ddt, bs=bs0, twiddle=twd)
                got = np.swapaxes(np.asarray(m2), 0, 1)[
                    ..., np.argsort(block_bin_of_pos(n, split))]
                vis = want > want.max() * 1e-6
                rel = np.abs(got - want)[vis].max() / want.max()
                tol = 5e-7 if twd == "df" else 5e-6
                assert rel < tol, (n, split, ddt, twd, rel)
                checked += 1
print(f"TPU_MATRIX_OK {checked}")
"""


def test_kernel_config_matrix_on_real_tpu():
    """Every (size x stage-1 split x digit dtype x twiddle tier) of the
    REAL Mosaic lowering matches the float64 oracle within its tier's
    bound — interpret mode validates semantics; this certifies the
    compiled kernels.  A 44-config sweep over all seven sizes ran clean
    on v5e (r5); CI time bounds this resident copy to three
    representative sizes covering both splits and the small-bs fallback."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, "-c", MATRIX_CHILD], env=env,
                       cwd=repo, capture_output=True, text=True,
                       timeout=1800)
    out = r.stdout + r.stderr
    if "NO_TPU" in out:
        pytest.skip("no TPU backend on this machine")
    assert r.returncode == 0 and "TPU_MATRIX_OK" in out, out[-2000:]
