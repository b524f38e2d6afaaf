"""Multi-device sharding tests — the analog of FFTW's ``check.pl --mpi``.

FFTW re-runs its whole verifier suite under localhost MPI ranks
(/root/reference/deps/fftw-3.3.11/tests/check.pl:24-39); here the same idea
runs on the conftest-forced 8-virtual-CPU-device mesh: every test constructs
a real ``jax.sharding.Mesh`` and asserts the sharded pipeline is bit-for-bit
semantics-preserving vs the single-device jit of the identical function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from waveform_tpu import AudioInfo, Settings, resolve
from waveform_tpu.core.enums import FFTWindow, InterpMode
from waveform_tpu.dsp.devring import init_ring, push
from waveform_tpu.dsp.meter import init_meter_state, make_meter_step
from waveform_tpu.dsp.spectrum import (
    display_decibels,
    init_state,
    make_spectrum_step,
)
from waveform_tpu.parallel.mesh import (
    PIXEL_AXIS,
    STREAM_AXIS,
    make_mesh,
    pad_stream_dim,
    padded_streams,
    pixel_constraint,
    replicated,
    shard_state,
    stream_sharding,
)
from waveform_tpu.rebin.apply import make_rebin_fn


def _cfg(fft_size=256, width=128, **kw):
    return resolve(
        Settings(fft_size=fft_size, width=width, window=FFTWindow.HANN,
                 interp_mode=InterpMode.LANCZOS, **kw),
        AudioInfo(48000, 2))


def _full_step_fns(cfg):
    step = make_spectrum_step(cfg)
    rebin = make_rebin_fn(cfg, apply_pixel_map=False)

    def full(samples, state, dt, active, rms):
        new = step(samples, state, dt, active, rms)
        return rebin(display_decibels(cfg, new)), new

    return full


def _inputs(rng, cfg, S, scale=0.5):
    samples = (scale * rng.standard_normal(
        (S, 2, cfg.fft_size))).astype(np.float32)
    active = np.ones(S, bool)
    rms = np.zeros(S, np.float32)
    return samples, active, rms


def _run_sharded(mesh, cfg, full, samples, state, active, rms, ticks=1):
    s_sh = stream_sharding(mesh)
    r_sh = replicated(mesh)
    st_sh = jax.tree.map(lambda _: s_sh, state)

    def constrained(samples, state, dt, active, rms):
        px, new = full(samples, state, dt, active, rms)
        return pixel_constraint(mesh, px), new

    jitted = jax.jit(
        constrained,
        in_shardings=(s_sh, st_sh, r_sh, s_sh, s_sh),
        out_shardings=(NamedSharding(mesh, P(STREAM_AXIS, None, PIXEL_AXIS)),
                       st_sh))
    state = shard_state(mesh, state)
    dev = lambda x: jax.device_put(x, s_sh)  # noqa: E731
    px = None
    for t in range(ticks):
        px, state = jitted(dev(samples if t == 0 else samples[:, ::-1]),
                           state, jnp.float32(1 / 60), dev(active), dev(rms))
    return np.asarray(px), state


def _run_single(cfg, full, samples, state, active, rms, ticks=1):
    jitted = jax.jit(full)
    px = None
    for t in range(ticks):
        px, state = jitted(jnp.asarray(samples if t == 0 else samples[:, ::-1]),
                           state, jnp.float32(1 / 60), jnp.asarray(active),
                           jnp.asarray(rms))
    return np.asarray(px), state


@pytest.mark.parametrize("pixel_parallel", [1, 2],
                         ids=["dp8", "dp4xtp2"])
def test_full_step_matches_single_device(rng, pixel_parallel):
    """Sharded spectrum+rebin over DP-only and DP×TP meshes is semantics-
    preserving vs the single-device jit (the check.pl --mpi property)."""
    mesh = make_mesh(pixel_parallel=pixel_parallel)
    cfg = _cfg()
    full = _full_step_fns(cfg)
    S = 16
    samples, active, rms = _inputs(rng, cfg, S)
    state = init_state(cfg, S)

    want, want_state = _run_single(cfg, full, samples, state, active, rms)
    got, got_state = _run_sharded(mesh, cfg, full, samples, state, active, rms)

    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_state.tsmooth),
                               np.asarray(want_state.tsmooth),
                               rtol=0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_state.last_silent),
                                  np.asarray(want_state.last_silent))


def test_multi_tick_state_threading_matches(rng):
    """EMA state chained through 4 sharded ticks stays equivalent — sharding
    must not perturb the carried SpectrumState."""
    mesh = make_mesh(pixel_parallel=2)
    cfg = _cfg()
    full = _full_step_fns(cfg)
    S = 8
    samples, active, rms = _inputs(rng, cfg, S)
    state = init_state(cfg, S)

    want, want_state = _run_single(cfg, full, samples, state, active, rms,
                                   ticks=4)
    got, got_state = _run_sharded(mesh, cfg, full, samples, state, active,
                                  rms, ticks=4)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_state.decibels),
                               np.asarray(want_state.decibels),
                               rtol=0, atol=1e-4)


def test_shard_state_placement_and_roundtrip():
    """shard_state puts every pytree leaf on the stream sharding, and the
    values survive the placement bit-for-bit."""
    mesh = make_mesh()
    cfg = _cfg()
    state = init_state(cfg, 16)
    sharded = shard_state(mesh, state)
    want_sh = stream_sharding(mesh)
    for leaf, orig in zip(jax.tree.leaves(sharded), jax.tree.leaves(state)):
        assert leaf.sharding.is_equivalent_to(want_sh, leaf.ndim), \
            f"leaf {leaf.shape} not stream-sharded: {leaf.sharding}"
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(orig))


def test_pixel_constraint_output_sharding(rng):
    """The rebin output really lands sharded over (stream, pixel): each
    device holds a [S/4, 1, P/2] block, proving the TP axis is live."""
    mesh = make_mesh(pixel_parallel=2)
    cfg = _cfg()
    full = _full_step_fns(cfg)
    S = 8
    samples, active, rms = _inputs(rng, cfg, S)
    state = init_state(cfg, S)
    px, _ = _run_sharded(mesh, cfg, full, samples, state, active, rms)
    # re-run to grab the device buffers (not just the gathered host copy)
    s_sh = stream_sharding(mesh)

    def constrained(samples):
        st = shard_state(mesh, init_state(cfg, S))
        p, _ = full(samples, st, jnp.float32(1 / 60),
                    jnp.ones(S, bool), jnp.zeros(S, np.float32))
        return pixel_constraint(mesh, p)

    out = jax.jit(constrained, in_shardings=s_sh,
                  out_shardings=NamedSharding(
                      mesh, P(STREAM_AXIS, None, PIXEL_AXIS)))(
        jax.device_put(samples, s_sh))
    W = cfg.width
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(S // 4, 1, W // 2)}, shard_shapes


def test_uneven_stream_count_pads_and_matches(rng):
    """S=5 streams on an 8-wide stream axis: padded_streams rounds up, the
    padding streams stay inert, the first 5 rows match single-device."""
    mesh = make_mesh()
    cfg = _cfg()
    full = _full_step_fns(cfg)
    S = 5
    S_pad = padded_streams(mesh, S)
    assert S_pad == 8
    samples, active, rms = _inputs(rng, cfg, S)
    p_samples = pad_stream_dim(samples, S_pad)
    p_active = pad_stream_dim(active, S_pad)  # pads False → inactive
    p_rms = pad_stream_dim(rms, S_pad)

    want, _ = _run_single(cfg, full, samples, init_state(cfg, S), active, rms)
    got, got_state = _run_sharded(mesh, cfg, full, p_samples,
                                  init_state(cfg, S_pad), p_active, p_rms)
    # partitioned compilation may differ from single-device by ~1 ulp of a
    # dB value (fusion boundaries move); semantics-preserving within that
    np.testing.assert_allclose(got[:S], want, rtol=0, atol=5e-5)
    # inactive padding streams latch silent and stay at the initial state
    assert np.asarray(got_state.last_silent)[S:].all()


def test_devring_push_sharded_matches(rng):
    """The device ring advance (vmapped dynamic slice) shards cleanly over
    streams with per-stream counts."""
    mesh = make_mesh()
    S, C, L, H = 16, 2, 64, 16
    ring = init_ring(S, C, L)
    new = rng.standard_normal((S, C, H)).astype(np.float32)
    counts = rng.integers(0, H + 1, S).astype(np.int32)

    want = np.asarray(jax.jit(push)(ring, jnp.asarray(new),
                                    jnp.asarray(counts)).buf)
    s_sh = stream_sharding(mesh)
    ring_sh = jax.tree.map(lambda x: jax.device_put(x, s_sh), ring)
    got = np.asarray(jax.jit(push, in_shardings=(
        jax.tree.map(lambda _: s_sh, ring), s_sh, s_sh))(
        ring_sh, jax.device_put(new, s_sh),
        jax.device_put(counts, s_sh)).buf)
    np.testing.assert_array_equal(got, want)


def test_meter_sharded_matches(rng):
    """MeterState variant: the batched meter step under a DP mesh."""
    mesh = make_mesh()
    from waveform_tpu.core.enums import DisplayMode
    cfg = _cfg(display_mode=DisplayMode.METER)
    assert cfg.meter_mode
    step = make_meter_step(cfg)
    S = 16
    M = cfg.fft_size
    window = (0.3 * rng.standard_normal((S, 2, M))).astype(np.float32)
    fresh = np.ones(S, bool)
    show = np.ones(S, bool)
    state = init_meter_state(cfg, S)

    want = jax.jit(step)(jnp.asarray(window), state, jnp.float32(1 / 60),
                         jnp.asarray(fresh), jnp.asarray(show))

    s_sh = stream_sharding(mesh)
    r_sh = replicated(mesh)
    st_sh = jax.tree.map(lambda _: s_sh, state)
    got = jax.jit(step, in_shardings=(s_sh, st_sh, r_sh, s_sh, s_sh),
                  out_shardings=st_sh)(
        jax.device_put(window, s_sh), shard_state(mesh, state),
        jnp.float32(1 / 60), jax.device_put(fresh, s_sh),
        jax.device_put(show, s_sh))
    np.testing.assert_allclose(np.asarray(got.meter_val),
                               np.asarray(want.meter_val), rtol=0, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(got.last_silent),
                                  np.asarray(want.last_silent))


# ---------------------------------------------------------------------------
# ShardedServingEngine: the FFTW-MPI-engine analog, end-to-end under pytest
# ---------------------------------------------------------------------------

from waveform_tpu.parallel import ShardedServingEngine  # noqa: E402
from waveform_tpu.runtime.serving import ServingEngine  # noqa: E402

NSC = 1_000_000_000


def _feed_and_tick(eng, rng, S, cfg, ticks=4):
    sr = cfg.audio.samples_per_sec
    hop = int(sr / cfg.fps)
    now = NSC
    outs = []
    for t in range(ticks):
        pkt = (0.4 * rng.standard_normal((S, 2, hop))).astype(np.float32)
        eng.feed_batch(pkt, now, now_ns=now)
        now += hop * NSC // sr
        eng.tick(now_ns=now)
        outs.append(eng.read_pixels())
    return outs


@pytest.mark.parametrize("pixel_parallel", [1, 2], ids=["dp8", "dp4xtp2"])
def test_sharded_serving_matches_single_device(pixel_parallel):
    """Full serving path (feed_batch → sync → device ring → spectrum →
    rebin) over the mesh equals the single-device engine tick-for-tick."""
    cfg = _cfg()
    S = 16
    r1, r2 = (np.random.default_rng(7) for _ in range(2))
    ref = ServingEngine(cfg, S, use_native=False)
    sh = ShardedServingEngine(cfg, S, pixel_parallel=pixel_parallel,
                              use_native=False)
    want = _feed_and_tick(ref, r1, S, cfg)
    got = _feed_and_tick(sh, r2, S, cfg)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=0, atol=1e-4)


def test_sharded_serving_uneven_streams_pad_trim():
    """user_streams=5 rounds up to 8 internally; outputs trim back to 5 and
    the padding never leaks."""
    cfg = _cfg()
    S = 5
    rng1, rng2 = (np.random.default_rng(3) for _ in range(2))
    ref = ServingEngine(cfg, S, use_native=False)
    sh = ShardedServingEngine(cfg, S, use_native=False)
    assert sh.S == 8 and sh.user_streams == 5
    want = _feed_and_tick(ref, rng1, S, cfg)
    got = _feed_and_tick(sh, rng2, S, cfg)
    assert got[-1].shape[0] == 5
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=0, atol=1e-4)
    assert sh.last_silent.shape == (5,)


def test_sharded_serving_pixels_stay_sharded():
    """The on-device output is genuinely distributed: with a 4×2 mesh each
    device holds one (stream-block, pixel-half) tile."""
    cfg = _cfg()
    S = 8
    sh = ShardedServingEngine(cfg, S, pixel_parallel=2, use_native=False)
    _feed_and_tick(sh, np.random.default_rng(1), S, cfg, ticks=1)
    px = sh.pixels_sharded
    shapes = {s.data.shape for s in px.addressable_shards}
    assert shapes == {(S // 4, 1, cfg.width // 2)}, shapes
    assert len(px.sharding.device_set) == 8


def test_sharded_tick_many_bulk():
    """Bulk scan path over the mesh: T ticks in one dispatch, sharded."""
    cfg = _cfg()
    S, T = 16, 6
    rng1, rng2 = (np.random.default_rng(11) for _ in range(2))
    hop = int(cfg.audio.samples_per_sec / cfg.fps)
    audio = (0.4 * rng1.standard_normal((T, S, 2, hop))).astype(np.float32)
    ref = ServingEngine(cfg, S, use_native=False)
    sh = ShardedServingEngine(cfg, S, use_native=False)
    want = np.asarray(ref.tick_many(audio))
    got = np.asarray(sh.tick_many(
        (0.4 * rng2.standard_normal((T, S, 2, hop))).astype(np.float32)))
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-4)


def test_sharded_serving_normalize_volume():
    """Volume normalization's device-resident RMS ring shards too."""
    cfg = _cfg(normalize_volume=True)
    S = 8
    r1, r2 = (np.random.default_rng(5) for _ in range(2))
    ref = ServingEngine(cfg, S, use_native=False)
    sh = ShardedServingEngine(cfg, S, use_native=False)
    want = _feed_and_tick(ref, r1, S, cfg)
    got = _feed_and_tick(sh, r2, S, cfg)
    np.testing.assert_allclose(got[-1], want[-1], rtol=0, atol=1e-4)


# ---------------------------------------------------------------------------
# multi-host ingestion helpers (single-process degenerate behavior)
# ---------------------------------------------------------------------------

def test_local_stream_rows_single_process_owns_all():
    from waveform_tpu.parallel.mesh import local_stream_rows
    mesh = make_mesh(pixel_parallel=2)
    S = padded_streams(mesh, 10)
    assert local_stream_rows(mesh, S) == (0, S)


def test_from_process_local_equals_device_put(rng):
    """Single-process, from_process_local must be a plain sharded placement
    (the multi-host path's degenerate case)."""
    from waveform_tpu.parallel.mesh import from_process_local
    mesh = make_mesh(pixel_parallel=1)
    sh = stream_sharding(mesh)
    x = rng.standard_normal((16, 7)).astype(np.float32)
    a = from_process_local(sh, x, x.shape)
    b = jax.device_put(x, sh)
    assert a.sharding == b.sharding
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_engine_exposes_local_streams():
    from waveform_tpu.parallel.sharded_serving import ShardedServingEngine
    cfg = _cfg(fft_size=256)
    eng = ShardedServingEngine(cfg, 10, pixel_parallel=2)
    lo, hi = eng.local_streams
    assert (lo, hi) == (0, eng.S)   # single process owns every row


def test_sharded_engine_shard_maps_the_exact_kernel(monkeypatch):
    """When the exact kernel IS available (forced here, interpret mode so
    the CPU mesh can execute it), the sharded engine routes it through a
    stream-axis shard_map — every kernel call shard-local — and matches
    the single-device engine."""
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "always")
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_INTERPRET", "1")
    monkeypatch.setenv("WAVEFORM_TPU_FFT_BACKEND", "exact")
    cfg = _cfg(fft_size=1024)   # smallest size supports() admits
    S = 16
    r1, r2 = (np.random.default_rng(11) for _ in range(2))
    ref = ServingEngine(cfg, S, use_native=False)
    sh = ShardedServingEngine(cfg, S, pixel_parallel=2, use_native=False)
    want = _feed_and_tick(ref, r1, S, cfg, ticks=3)
    got = _feed_and_tick(sh, r2, S, cfg, ticks=3)
    for w, g in zip(want, got):
        np.testing.assert_allclose(g, w, rtol=0, atol=1e-4)


def test_sharded_engine_never_traces_pallas_kernel(monkeypatch):
    """Outside the shard_map wrapper, the sharded engine must route the
    exact FFT through the XLA lowering even when the kernel is
    force-enabled: with EXACT_FUSED=never the shard_map path disengages
    (kernel_would_run is False) and only the allow_exact_kernel=False
    plumbing keeps cfft_exact from tracing a pallas_call under the
    sharded jit.  Forcing the kernel on this CPU mesh makes any leak
    fatal — Mosaic cannot lower for the CPU backend — and fft_size=1024
    is a size supports() admits, so the gate is genuinely load-bearing."""
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "always")
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_FUSED", "never")
    monkeypatch.setenv("WAVEFORM_TPU_FFT_BACKEND", "exact")
    cfg = _cfg(fft_size=1024)
    S = 8
    eng = ShardedServingEngine(cfg, S, pixel_parallel=2, use_native=False)
    out = _feed_and_tick(eng, np.random.default_rng(3), S, cfg, ticks=2)
    assert np.isfinite(out[-1]).all()


def test_sharded_resized_carries_state_and_matches():
    """Live resize across the mesh (gather → rebuild → scatter): surviving
    rows' device state migrates, and the resized sharded engine stays
    tick-for-tick equal to a resized single-device engine."""
    cfg = _cfg()
    S = 10
    r1, r2 = (np.random.default_rng(11) for _ in range(2))
    ref = ServingEngine(cfg, S, use_native=False)
    sh = ShardedServingEngine(cfg, S, use_native=False)
    _feed_and_tick(ref, r1, S, cfg)
    _feed_and_tick(sh, r2, S, cfg)

    keep = [3, 1, 7]
    ref2 = ref.resized(6, keep=keep)
    sh2 = sh.resized(6, keep=keep)
    assert sh2.user_streams == 6
    # migrated analysis state matches row-for-row before any new tick
    np.testing.assert_allclose(sh2.read_decibels()[:3],
                               ref2.read_decibels()[:3], atol=1e-5)
    # and the engines stay in lockstep through further live ticks
    w = _feed_and_tick(ref2, r1, 6, cfg)
    g = _feed_and_tick(sh2, r2, 6, cfg)
    for wi, gi in zip(w, g):
        np.testing.assert_allclose(gi, wi, rtol=0, atol=1e-4)


def test_sharded_resized_across_mesh_shapes():
    """Growth can re-balance onto a different mesh shape: resize from the
    default mesh onto a pixel-parallel one; kept state is identical."""
    cfg = _cfg()
    rng = np.random.default_rng(5)
    sh = ShardedServingEngine(cfg, 8, use_native=False)
    _feed_and_tick(sh, rng, 8, cfg)
    before = sh.read_decibels()

    sh2 = sh.resized(12, mesh=make_mesh(pixel_parallel=2))
    assert sh2.mesh.shape[PIXEL_AXIS] == 2
    np.testing.assert_allclose(sh2.read_decibels()[:8], before, atol=1e-5)
    # fresh rows start at the floor (inert, not garbage)
    assert np.isfinite(sh2.read_decibels()).all()
    out = _feed_and_tick(sh2, rng, 12, cfg)
    assert out[-1].shape[0] == 12 and np.isfinite(out[-1]).all()


def test_sharded_resized_rejects_bad_keep():
    cfg = _cfg()
    sh = ShardedServingEngine(cfg, 5, use_native=False)
    with pytest.raises(ValueError):
        sh.resized(4, keep=[0, 1, 2, 3, 4])   # more keeps than rows
    with pytest.raises(ValueError):
        sh.resized(8, keep=[5])   # padding row: user rows are 0..4


def test_sharded_meter_matches_single_device():
    """Mesh-sharded meter serving equals the single-device meter engine
    tick-for-tick (meter mode at pod scale — the r4 capability)."""
    from waveform_tpu.core.enums import DisplayMode
    from waveform_tpu.parallel.sharded_serving import (
        ShardedMeterServingEngine,
    )
    from waveform_tpu.runtime.meter_serving import MeterServingEngine

    cfg = resolve(Settings(display_mode=DisplayMode.METER, meter_buf=50),
                  AudioInfo(48000, 2))
    S = 16
    r1, r2 = (np.random.default_rng(13) for _ in range(2))
    ref = MeterServingEngine(cfg, S, use_native=False)
    sh = ShardedMeterServingEngine(cfg, S, use_native=False)
    _feed_and_tick(ref, r1, S, cfg)
    _feed_and_tick(sh, r2, S, cfg)
    np.testing.assert_allclose(np.asarray(sh.meter_values),
                               np.asarray(ref.meter_values), atol=1e-4)
    assert sh.last_silent.shape == (S,)


def test_sharded_meter_pad_trim_and_resize():
    from waveform_tpu.core.enums import DisplayMode
    from waveform_tpu.parallel.sharded_serving import (
        ShardedMeterServingEngine,
    )

    cfg = resolve(Settings(display_mode=DisplayMode.METER, meter_buf=50),
                  AudioInfo(48000, 2))
    rng = np.random.default_rng(21)
    sh = ShardedMeterServingEngine(cfg, 5, use_native=False)  # pads to 8
    assert sh.S == 8 and sh.user_streams == 5
    _feed_and_tick(sh, rng, 5, cfg)
    vals = np.asarray(sh.meter_values)
    assert vals.shape == (5, 2) and np.isfinite(vals).all()

    sh2 = sh.resized(9, keep=[4, 0])
    assert isinstance(sh2, ShardedMeterServingEngine)
    got = np.asarray(sh2.meter_values)
    np.testing.assert_allclose(got[0], vals[4], atol=1e-6)
    np.testing.assert_allclose(got[1], vals[0], atol=1e-6)


# ---------------------------------------------------------------------------
# mesh-sharded waveform serving (waveform mode at pod scale — completes the
# engine-family trio: spectrum r2, meter r4, waveform r4 continuation)
# ---------------------------------------------------------------------------

def _wf_cfg(**kw):
    from waveform_tpu.core.enums import DisplayMode, TSmoothingMode
    return resolve(Settings(display_mode=DisplayMode.WAVEFORM,
                            temporal_smoothing=TSmoothingMode.NONE, **kw),
                   AudioInfo(48000, 2))


def _wf_drive(eng, rng, S, ticks=6, hop=480):
    """Per-stream packet schedule shared by solo/sharded engines."""
    now = NSC
    for t in range(ticks):
        for s in range(S):
            pkt = (0.4 * rng.standard_normal((2, hop))).astype(np.float32)
            eng.feed(s, pkt, now, now_ns=now)
        now += hop * NSC // 48000
        eng.tick(now_ns=now)
    return eng.render_values()


def test_sharded_waveform_matches_single_device():
    """Mesh-sharded waveform serving equals the single-device engine
    tick-for-tick (the step is purely per-stream, so stream-DP must be
    bit-preserving)."""
    from waveform_tpu.parallel.sharded_waveform import ShardedWaveformEngine
    from waveform_tpu.runtime.waveform_device import DeviceWaveformEngine

    cfg = _wf_cfg()
    S = 16
    r1, r2 = (np.random.default_rng(31) for _ in range(2))
    want = _wf_drive(DeviceWaveformEngine(cfg, S), r1, S)
    sh = ShardedWaveformEngine(cfg, S)
    got = _wf_drive(sh, r2, S)
    np.testing.assert_allclose(got, np.asarray(want), rtol=0, atol=1e-5)
    assert sh.local_streams == (0, 16)


def test_sharded_waveform_pad_trim_and_resize():
    """user_streams=5 pads to the mesh multiple; reads trim back; live
    resize migrates surviving rows (including onto the same mesh)."""
    from waveform_tpu.parallel.sharded_waveform import ShardedWaveformEngine

    cfg = _wf_cfg()
    rng = np.random.default_rng(37)
    sh = ShardedWaveformEngine(cfg, 5)       # pads to 8 on the 8-dev mesh
    assert sh.S == 8 and sh.user_streams == 5
    vals = _wf_drive(sh, rng, 5)
    assert vals.shape[0] == 5 and np.isfinite(vals).all()
    assert sh.last_silent.shape == (5,)

    sh2 = sh.resized(9, keep=[4, 0])
    assert isinstance(sh2, ShardedWaveformEngine)
    got = sh2.render_values()
    np.testing.assert_array_equal(got[0], vals[4])
    np.testing.assert_array_equal(got[1], vals[0])
    # migrated host sync objects keep ticking: feed the carried rows more
    now2 = NSC * 5
    pkt = (0.3 * rng.standard_normal((2, 480))).astype(np.float32)
    for s in range(2):
        sh2.feed(s, pkt, now2, now_ns=now2)
    sh2.tick(now_ns=now2 + 480 * NSC // 48000)
    assert np.isfinite(sh2.render_values()).all()


def test_sharded_waveform_normalize_volume_and_microbatch():
    """Volume normalization's device RMS ring shards along streams too,
    and the k-frame microbatch flush matches k=1 frame-for-frame."""
    from waveform_tpu.parallel.sharded_waveform import ShardedWaveformEngine

    cfg = _wf_cfg(normalize_volume=True, volume_target=-6.0)
    S = 4
    r1, r2 = (np.random.default_rng(41) for _ in range(2))
    want = _wf_drive(ShardedWaveformEngine(cfg, S), r1, S, ticks=6)
    mb = ShardedWaveformEngine(cfg, S, microbatch=3)
    got = _wf_drive(mb, r2, S, ticks=6)      # 6 ticks = 2 full flushes
    np.testing.assert_array_equal(got, want)


def test_sharded_waveform_rejects_cohort_binding():
    from waveform_tpu.parallel.sharded_waveform import ShardedWaveformEngine
    sh = ShardedWaveformEngine(_wf_cfg(), 4)
    with pytest.raises(NotImplementedError):
        sh.bind_cohort(0)
