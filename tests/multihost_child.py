"""Child process for the real multi-host ingestion test.

Launched (2×) by tests/test_multihost.py: each process initializes
``jax.distributed`` against a shared localhost coordinator with 4 forced
CPU devices, so the pair forms one 8-device / 2-process platform — the
analog of FFTW validating its MPI layer under real localhost ranks
(/root/reference/deps/fftw-3.3.11/tests/check.pl:24-26,39), not a
single-process simulation.

Each process builds the SAME :class:`ShardedServingEngine`, feeds ONLY the
stream rows its devices own (``eng.local_streams``), ticks in lockstep with
fixed timestamps, and writes its addressable pixel shards to ``outdir``.
The parent reassembles the global output and checks it against a
single-process engine — executing every ``jax.process_count() > 1`` branch
in parallel/mesh.py and runtime/serving.py for real.
"""

import os
import sys

import numpy as np


def main() -> None:
    proc_id, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, outdir = sys.argv[3], sys.argv[4]

    # env vars are set by the parent before spawn (the sitecustomize imports
    # jax at interpreter startup); the config.update is what guarantees the
    # backend flip regardless (tests/conftest.py recipe)
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=nprocs, process_id=proc_id)
    assert jax.process_count() == nprocs, jax.process_count()
    assert len(jax.devices()) == 4 * nprocs, len(jax.devices())
    assert len(jax.local_devices()) == 4

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from waveform_tpu import AudioInfo, Settings, resolve
    from waveform_tpu.core.enums import TSmoothingMode
    from waveform_tpu.parallel.sharded_serving import ShardedServingEngine

    SR, S, HOP = 48000, 8, 800
    cfg = resolve(Settings(fft_size=256, width=128,
                           temporal_smoothing=TSmoothingMode.NONE),
                  AudioInfo(SR, 2))
    eng = ShardedServingEngine(cfg, S, pixel_parallel=2, use_native=False)
    lo, hi = eng.local_streams
    assert 0 <= lo < hi <= S            # each process owns a real block
    assert (hi - lo) == S // nprocs

    now = 1_000_000_000
    for t in range(3):
        pkt = np.zeros((S, 2, HOP), np.float32)
        for s in range(lo, hi):         # feed ONLY locally-owned rows
            r = np.random.default_rng(1000 * t + s)
            pkt[s] = 0.3 * r.standard_normal((2, HOP))
        eng.feed_batch(pkt, now, now_ns=now)
        now += HOP * 1_000_000_000 // SR
        eng.tick(now_ns=now)

    px = eng.pixels_sharded
    jax.block_until_ready(px)
    for k, sh in enumerate(px.addressable_shards):
        bounds = np.array(
            [[sl.start or 0, dim if sl.stop is None else sl.stop]
             for sl, dim in zip(sh.index, px.shape)], np.int64)
        np.savez(os.path.join(outdir, f"px_{proc_id}_{k}.npz"),
                 data=np.asarray(sh.data), bounds=bounds)

    # bulk path: tick_many routes [T, S, ...] uploads through _prep_scan's
    # process-local branch (each process ships only its stream columns)
    T = 2
    bulk = np.stack([
        np.stack([0.2 * np.random.default_rng(7000 + 10 * t + s)
                  .standard_normal((2, HOP)).astype(np.float32)
                  for s in range(S)]) for t in range(T)])
    pxs = eng.tick_many(bulk)
    jax.block_until_ready(pxs)
    last = pxs[-1]
    for k, sh in enumerate(last.addressable_shards):
        bounds = np.array(
            [[sl.start or 0, dim if sl.stop is None else sl.stop]
             for sl, dim in zip(sh.index, last.shape)], np.int64)
        np.savez(os.path.join(outdir, f"bulk_{proc_id}_{k}.npz"),
                 data=np.asarray(sh.data), bounds=bounds)
    # --- checkpoint-based re-provision at a NEW stream count -----------
    # The flow ShardedServingEngine.resized() points multi-host pods at:
    # save_state (collective allgather, proc 0 writes) -> build a fresh
    # engine at a different stream count -> load_state(keep=...) migrates
    # surviving rows and re-places across the mesh.  The reference analog
    # is update()'s full teardown/re-register on any topology change
    # (/root/reference/src/source.cpp:1077-1322).
    from jax.experimental import multihost_utils

    from waveform_tpu.utils.checkpoint import to_host

    db_old = to_host(eng.state.decibels)
    ck = os.path.join(outdir, "resize_ck.npz")
    eng.save_state(ck)                      # collective; proc 0 writes
    multihost_utils.sync_global_devices("resize_ck_saved")

    keep = [5, 0, 3]
    eng2 = ShardedServingEngine(cfg, 6, pixel_parallel=2, use_native=False)
    eng2.load_state(ck, keep=keep)          # collective (gathers refs)
    db_new = to_host(eng2.state.decibels)
    if proc_id == 0:
        np.savez(os.path.join(outdir, "resize.npz"),
                 db_old=db_old, db_new=db_new, keep=np.asarray(keep))

    # the re-provisioned engine must actually RUN: one live tick on the
    # migrated state (placement + compiled-program shardings line up)
    for s in range(*eng2.local_streams):
        r = np.random.default_rng(9000 + s)
        pkt1 = 0.3 * r.standard_normal((1, 2, HOP)).astype(np.float32)
        # per-stream feed keeps this simple: one packet per local row
        eng2.feed(s, pkt1[0], now, now_ns=now)
    eng2.tick(now_ns=now + HOP * 1_000_000_000 // SR)
    px2 = eng2.pixels_sharded
    jax.block_until_ready(px2)
    assert all(np.isfinite(np.asarray(sh.data)).all()
               for sh in px2.addressable_shards)

    print(f"child {proc_id}: local rows [{lo}, {hi}), "
          f"{len(px.addressable_shards)} + "
          f"{len(last.addressable_shards)} shards written; "
          f"re-provision 8->6 streams via load_state(keep) ok")


if __name__ == "__main__":
    main()
