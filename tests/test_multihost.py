"""Real multi-process validation of the multi-host ingestion path.

Spawns TWO ``jax.distributed``-initialized processes (4 forced CPU devices
each → one 8-device platform split 4/4), has each build the sharded serving
engine and feed only its own stream rows, and checks the reassembled global
output against a single-process engine fed the full batch.  This executes
the ``jax.process_count() > 1`` branches in parallel/mesh.py
(``shard_state``/``local_stream_rows``/``from_process_local``) and
runtime/serving.py (the uniform-count SPMD guard) under pytest with real
processes — the FFTW analog runs its verifiers under real localhost MPI
ranks (/root/reference/deps/fftw-3.3.11/tests/check.pl:24-26,39).
"""

import os
import socket
import subprocess
import sys

import numpy as np

from waveform_tpu import AudioInfo, Settings, TSmoothingMode, resolve
from waveform_tpu.runtime.serving import ServingEngine

SR, S, HOP = 48000, 8, 800
NS = 1_000_000_000


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _cfg():
    return resolve(Settings(fft_size=256, width=128,
                            temporal_smoothing=TSmoothingMode.NONE),
                   AudioInfo(SR, 2))


def test_two_process_sharded_engine_matches_single(tmp_path):
    port = _free_port()
    child = os.path.join(os.path.dirname(__file__), "multihost_child.py")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 4 virtual devices per PROCESS (the parent's conftest forces 8 in this
    # process; the children must not inherit that)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])

    procs = [subprocess.Popen(
        [sys.executable, child, str(i), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = [p.communicate(timeout=570)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"child failed:\n{out[-3000:]}"

    # reassemble the global [S, D, W] pixels from both processes' shards
    def assemble(prefix):
        files = sorted(tmp_path.glob(f"{prefix}_*.npz"))
        assert len(files) == 8    # 8 devices, one shard each
        got = None
        for f in files:
            z = np.load(f)
            data, b = z["data"], z["bounds"]
            if got is None:
                got = np.full((S, data.shape[1], 128), np.nan, np.float32)
            got[b[0, 0]:b[0, 1], b[1, 0]:b[1, 1], b[2, 0]:b[2, 1]] = data
        assert np.isfinite(got).all()  # every tile written exactly once
        return got

    got = assemble("px")

    # single-process reference: same config, full batch, same timestamps
    eng = ServingEngine(_cfg(), S, use_native=False)
    now = NS
    for t in range(3):
        pkt = np.zeros((S, 2, HOP), np.float32)
        for s in range(S):
            r = np.random.default_rng(1000 * t + s)
            pkt[s] = 0.3 * r.standard_normal((2, HOP))
        eng.feed_batch(pkt, now, now_ns=now)
        now += HOP * NS // SR
        eng.tick(now_ns=now)
    want = np.asarray(eng.read_pixels())

    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)

    # bulk path (tick_many via _prep_scan's process-local branch)
    T = 2
    bulk = np.stack([
        np.stack([0.2 * np.random.default_rng(7000 + 10 * t + s)
                  .standard_normal((2, HOP)).astype(np.float32)
                  for s in range(S)]) for t in range(T)])
    want_bulk = np.asarray(eng.tick_many(bulk)[-1])
    np.testing.assert_allclose(assemble("bulk"), want_bulk, rtol=0,
                               atol=1e-4)

    # checkpoint-based re-provision at a new stream count (the multi-host
    # resize flow): surviving rows carry their dB state verbatim, rows
    # beyond len(keep) start fresh — asserted from the children's gathered
    # before/after state (tests/multihost_child.py phase 3)
    z = np.load(tmp_path / "resize.npz")
    db_old, db_new, keep = z["db_old"], z["db_new"], z["keep"]
    for i, j in enumerate(keep):
        np.testing.assert_array_equal(db_new[i], db_old[j])
    from waveform_tpu import DB_MIN
    assert (db_new[len(keep):6] == DB_MIN).all()   # fresh user rows
