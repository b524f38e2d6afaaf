"""Block bin order: the zero-relayout serving layout (r5).

The Pallas exact kernel emits magnitude rows in its native "block" bin
order (kernels/exact_pallas.block_bin_of_pos) and the serving engine
carries EMA/dB state in that order, permuting per-bin CONSTANTS instead
of relayouting data every tick.  These tests pin the contract:

* the permutation is a bijection with position 0 == bin 0 (the
  reference's bins>=1 normalization/rolloff slices stay positional,
  src/source_generic.cpp:161-179)
* a block-order engine is externally indistinguishable from a
  natural-order one: same pixels, same read_decibels, same render
* checkpoints are canonical natural order — they round-trip between
  engines whose kernel routing differs
"""

import numpy as np
import pytest

import jax.numpy as jnp

from waveform_tpu import AudioInfo, ChannelMode, Settings, resolve
from waveform_tpu.runtime.serving import ServingEngine

SR = 44100


def _cfg(**kw):
    base = dict(fft_size=1024, channel_mode=ChannelMode.STEREO,
                width=160, height=80)
    base.update(kw)
    return resolve(Settings(**base), AudioInfo(SR, 2))


def _feed_ticks(eng, rng, S, cfg, ticks=4, t0=1_000_000_000):
    hop = int(SR / cfg.fps) + 7
    now = t0
    out = None
    for t in range(ticks):
        for s in range(S):
            data = (0.2 * rng.standard_normal((2, hop))).astype(np.float32)
            eng.feed(s, data, now, now_ns=now)
        now += int(1e9 / cfg.fps)
        out = eng.tick(now_ns=now)
    return np.asarray(out)


def test_block_bin_of_pos_is_bijection_rooted_at_dc():
    from waveform_tpu.kernels.exact_pallas import block_bin_of_pos, supports
    for n in (1024, 4096, 16384):
        for split in (2, 3):
            if not supports(n, split):
                continue
            perm = block_bin_of_pos(n, split)
            assert perm.shape == (n // 2,)
            assert perm[0] == 0          # bins>=1 slices stay positional
            assert len(np.unique(perm)) == n // 2


def test_block_order_matches_kernel_rows(rng):
    """block_bin_of_pos IS the kernel's emission order: unpermuting the
    raw packed rows reproduces the natural-order oracle per split (the
    raw rows and the wrapper may resolve different accuracy tiers —
    plan-driven ddt/twiddle — so the pin is against float64, not
    bit-exact against the wrapper)."""
    from waveform_tpu.kernels.exact_pallas import (
        block_bin_of_pos, rfft_rows_mag_packed)
    n = 4096
    x = (0.3 * rng.standard_normal((2, 2, n))).astype(np.float32)
    w = jnp.ones((n,), jnp.float32)
    wz = jnp.zeros((n,), jnp.float32)
    want = np.abs(np.fft.rfft(x.astype(np.float64)))[..., :n // 2]
    for split in (2, 3):
        m2, _ = rfft_rows_mag_packed(jnp.asarray(x.reshape(4, n)), w, wz,
                                     interpret=True, split=split)
        got = np.swapaxes(np.asarray(m2), 0, 1)   # planar -> [S, 2, nbins]
        inv = np.argsort(block_bin_of_pos(n, split))
        rel = np.abs(got[..., inv] - want).max() / want.max()
        assert rel < 1e-6, (split, rel)


def test_block_bin_of_pos_tracks_split_resolution(monkeypatch):
    """The default-split permutation must re-resolve the env/plan choice
    on every call (regression: the lru cache keyed (n, None) and latched
    the first resolution, so a plan retune between two engine builds
    could desynchronize a new kernel trace from its consumer perms)."""
    from waveform_tpu.kernels.exact_pallas import block_bin_of_pos
    n = 4096
    monkeypatch.setenv("WAVEFORM_TPU_STAGE1_SPLIT", "2")
    p2 = block_bin_of_pos(n)
    monkeypatch.setenv("WAVEFORM_TPU_STAGE1_SPLIT", "3")
    p3 = block_bin_of_pos(n)
    assert not np.array_equal(p2, p3)
    np.testing.assert_array_equal(p2, block_bin_of_pos(n, 2))
    np.testing.assert_array_equal(p3, block_bin_of_pos(n, 3))


def test_flat_io_modes_agree(rng, monkeypatch):
    """The kernel's flat/3-D spec fallbacks (WAVEFORM_TPU_KERNEL_FLAT_IO)
    all honor the SAME row/bin-order contract: the small-bs 3-D path
    (N >= 32768 VMEM budgets) and the flat default must be
    indistinguishable to consumers."""
    from waveform_tpu.kernels import exact_pallas as ep
    n = 4096
    x2 = jnp.asarray((0.3 * rng.standard_normal((4, n))).astype(np.float32))
    w = jnp.ones((n,), jnp.float32)
    wz = jnp.zeros((n,), jnp.float32)
    outs = {}
    for mode in ("none", "in", "out", "in,out"):
        monkeypatch.setenv("WAVEFORM_TPU_KERNEL_FLAT_IO", mode)
        # the env resolves OUTSIDE the jit (a static arg), so each mode
        # traces its own program — no cache-clear workaround needed (the
        # r4 ablation trap, ROADMAP #41, is closed by construction)
        m, nz = ep.rfft_rows_mag_packed(x2, w, wz, interpret=True, split=2)
        outs[mode] = (np.asarray(m), np.asarray(nz))
    for mode in ("in", "out", "in,out"):
        np.testing.assert_array_equal(outs[mode][0], outs["none"][0])
        np.testing.assert_array_equal(outs[mode][1], outs["none"][1])


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _kernel_on(monkeypatch):
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "always")
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_INTERPRET", "1")
    monkeypatch.setenv("WAVEFORM_TPU_FFT_BACKEND", "exact")


def test_block_engine_matches_natural_engine(monkeypatch, rng):
    """A kernel-routed (block-order) engine and a kernel-off
    (natural-order) engine are externally identical: pixels agree to the
    backends' accuracy class and read_decibels returns NATURAL order from
    both."""
    cfg = _cfg(slope=1.5)        # exercise the permuted slope constants
    S = 4
    _kernel_on(monkeypatch)
    blk = ServingEngine(cfg, S, use_native=False)
    assert blk._bin_perm is not None
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "never")
    nat = ServingEngine(cfg, S, use_native=False)
    assert nat._bin_perm is None

    r1, r2 = (np.random.default_rng(3) for _ in range(2))
    pb = _feed_ticks(blk, r1, S, cfg)
    pn = _feed_ticks(nat, r2, S, cfg)
    np.testing.assert_allclose(pb, pn, rtol=0, atol=1e-4)
    np.testing.assert_allclose(blk.read_decibels(), nat.read_decibels(),
                               rtol=0, atol=1e-4)
    # the dominant frequency must land on the same NATURAL bin
    tone = np.sin(2 * np.pi * 1200 / SR
                  * np.arange(4096))[None].repeat(2, 0).astype(np.float32)
    now = 10_000_000_000
    for eng in (blk, nat):
        for s in range(S):
            eng.feed(s, tone, now, now_ns=now)
        eng.tick(now_ns=now + 16_000_000)
    kb = np.argmax(blk.read_decibels()[0, 0])
    kn = np.argmax(nat.read_decibels()[0, 0])
    assert kb == kn
    assert abs(kb * SR / cfg.fft_size - 1200) < SR / cfg.fft_size


def test_block_engine_split3_matches_natural(monkeypatch, rng):
    """Engine-level perm/kernel agreement under the NON-default 3-factor
    stage-1 split (what a plan retune can select, as r5's table does at
    N >= 8192): the step's kernel trace and every consumer permutation
    must resolve the same order."""
    monkeypatch.setenv("WAVEFORM_TPU_STAGE1_SPLIT", "3")
    cfg = _cfg(fft_size=4096)     # N1 % 32 == 0: split 3 admissible
    S = 2
    _kernel_on(monkeypatch)
    blk = ServingEngine(cfg, S, use_native=False)
    assert blk._bin_perm is not None
    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "never")
    nat = ServingEngine(cfg, S, use_native=False)
    r1, r2 = (np.random.default_rng(3) for _ in range(2))
    pb = _feed_ticks(blk, r1, S, cfg, ticks=3)
    pn = _feed_ticks(nat, r2, S, cfg, ticks=3)
    np.testing.assert_allclose(pb, pn, rtol=0, atol=1e-4)
    np.testing.assert_allclose(blk.read_decibels(), nat.read_decibels(),
                               rtol=0, atol=1e-4)


def test_checkpoint_canonical_across_layouts(monkeypatch, rng, tmp_path):
    """Checkpoints store natural bins: a block-order engine's save loads
    into a natural-order engine (and back) with state continuity."""
    cfg = _cfg()
    S = 3
    _kernel_on(monkeypatch)
    blk = ServingEngine(cfg, S, use_native=False)
    _feed_ticks(blk, rng, S, cfg)
    path = str(tmp_path / "ck.npz")
    blk.save_state(path)

    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "never")
    nat = ServingEngine(cfg, S, use_native=False)
    nat.load_state(path)
    np.testing.assert_allclose(nat.read_decibels(), blk.read_decibels(),
                               rtol=0, atol=1e-6)

    # and back into a block-order engine
    path2 = str(tmp_path / "ck2.npz")
    nat.save_state(path2)
    _kernel_on(monkeypatch)
    blk2 = ServingEngine(cfg, S, use_native=False)
    blk2.load_state(path2)
    np.testing.assert_allclose(blk2.read_decibels(), blk.read_decibels(),
                               rtol=0, atol=1e-6)


def test_block_engine_row_migrating_load_keeps_unmigrated_rows(
        monkeypatch, rng, tmp_path):
    """load_state(keep=...) on a block-order engine must NOT scramble the
    rows it does not migrate: they are filled from the engine's own
    (block-order) state and must survive the final natural->block
    relayout verbatim (regression: the template rows were handed over in
    block order and got permuted a second time)."""
    cfg = _cfg()
    _kernel_on(monkeypatch)
    src = ServingEngine(cfg, 2, use_native=False)
    _feed_ticks(src, rng, 2, cfg)
    path = str(tmp_path / "ck.npz")
    src.save_state(path)

    dst = ServingEngine(cfg, 3, use_native=False)
    assert dst._bin_perm is not None
    _feed_ticks(dst, np.random.default_rng(5), 3, cfg, ticks=2)
    before = dst.read_decibels()
    dst.load_state(path, keep=[1])
    after = dst.read_decibels()
    np.testing.assert_array_equal(after[0], src.read_decibels()[1])
    # rows 1..2 were NOT migrated: bit-identical to their pre-load state
    np.testing.assert_array_equal(after[1:], before[1:])


def test_block_engine_render_and_resize(monkeypatch, rng):
    """render_frames consumes block-order state through permuted rebin
    tables; resized() migrates block-order rows losslessly."""
    cfg = _cfg()
    S = 4
    _kernel_on(monkeypatch)
    eng = ServingEngine(cfg, S, use_native=False)
    _feed_ticks(eng, rng, S, cfg)
    imgs = np.asarray(eng.render_frames())
    assert imgs.shape[0] == S and np.isfinite(imgs).all()

    monkeypatch.setenv("WAVEFORM_TPU_EXACT_KERNEL", "never")
    ref = ServingEngine(cfg, S, use_native=False)
    _feed_ticks(ref, np.random.default_rng(7), S, cfg)
    np.testing.assert_allclose(np.asarray(ref.render_frames()), imgs,
                               rtol=0, atol=1e-3)

    _kernel_on(monkeypatch)
    small = eng.resized(2, keep=[1, 3])
    np.testing.assert_allclose(small.read_decibels(),
                               eng.read_decibels()[[1, 3]],
                               rtol=0, atol=0)
