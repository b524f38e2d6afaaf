"""Aux subsystems: settings I/O, property sheet, profiler, wisdom, checkpoint."""

import json
import math

import numpy as np
import pytest

from waveform_tpu import (
    DB_MIN,
    AudioInfo,
    DisplayMode,
    FFTWindow,
    RenderMode,
    RGBA,
    Settings,
    TSmoothingMode,
    resolve,
)
from waveform_tpu.core.properties import (
    PROPERTIES,
    PROPERTY_MAP,
    visible_properties,
)
from waveform_tpu.core.settings_io import (
    load_settings,
    save_settings,
    settings_from_obs,
    settings_to_obs,
)
from waveform_tpu.runtime.profiler import FrameProfiler, fft_mflops


def test_settings_roundtrip(tmp_path):
    s = Settings(fft_size=2048, window=FFTWindow.BLACKMAN,
                 display_mode=DisplayMode.STEPPED_BAR, gravity=0.3,
                 color_base=RGBA(1.0, 0.5, 0.0, 1.0), slope=1.5)
    p = tmp_path / "settings.json"
    save_settings(str(p), s)
    s2 = load_settings(str(p))
    assert s2.fft_size == 2048
    assert s2.window == FFTWindow.BLACKMAN
    assert s2.display_mode == DisplayMode.STEPPED_BAR
    assert abs(s2.color_base.g - 0.5) < 1 / 255
    assert s2.color_base.a == 1.0


def test_settings_from_obs_scene_json():
    """The exact key/value shapes OBS scene collections store for the
    reference plugin parse directly."""
    obs_block = {
        "audio_source": "Desktop Audio",
        "display_mode": "bars",
        "window": "blackman_harris",
        "fft_size": 4096,
        "gravity": 0.65,
        "temporal_smoothing": "exp_moving_avg",
        "color_base": 0xFF00FF00,     # ABGR packed int: green, opaque
        "bar_width": 12,
        "some_obs_internal_key": {"ignored": True},
        "interp_mode": "lanczos",
    }
    s = settings_from_obs(obs_block)
    assert s.display_mode == DisplayMode.BAR
    assert s.window == FFTWindow.BLACKMAN_HARRIS
    assert s.color_base.g == 1.0 and s.color_base.r == 0.0
    assert s.color_base.a == 1.0
    assert s.bar_width == 12
    # unknown enum strings keep defaults, like the reference's p_equ chain
    s2 = settings_from_obs({"window": "kaiser"})
    assert s2.window == FFTWindow.HANN


def test_settings_to_obs_color_packing():
    d = settings_to_obs(Settings(color_crest=RGBA(1, 0, 0, 1)))
    assert d["color_crest"] == 0xFF0000FF  # A<<24 | B<<16 | G<<8 | R


def test_property_sheet_covers_settings():
    from dataclasses import fields
    keys = {f.name for f in fields(Settings)}
    assert {p.key for p in PROPERTIES} == keys
    assert PROPERTY_MAP["fft_size"].minimum == 128
    assert PROPERTY_MAP["gravity"].step == 0.01


def test_visibility_rules():
    # curve defaults: bar/step geometry hidden, fft controls visible
    vis = visible_properties(Settings())
    assert "fft_size" in vis and "bar_width" not in vis
    assert "gravity" in vis and "sine_exponent" not in vis
    assert "deadzone" not in vis  # radial off
    # meter mode: spectral controls hidden, rms/meter_buf visible
    vis = visible_properties(Settings(display_mode=DisplayMode.METER))
    assert "rms_mode" in vis and "meter_buf" in vis
    assert "fft_size" not in vis and "window" not in vis
    assert "normalize_volume" not in vis
    # stepped bars show step geometry
    vis = visible_properties(Settings(display_mode=DisplayMode.STEPPED_BAR))
    assert {"step_width", "step_gap", "bar_width"} <= vis
    assert "rounded_caps" not in vis
    # pulse render shows pulse_mode + grad_ratio
    vis = visible_properties(Settings(render_mode=RenderMode.PULSE))
    assert {"pulse_mode", "grad_ratio"} <= vis
    assert "range_middle" not in vis
    # power-of-sine exposes the exponent
    vis = visible_properties(Settings(window=FFTWindow.POWER_OF_SINE))
    assert "sine_exponent" in vis


def test_fft_mflops_definition():
    # 2.5·N·log2(N)/t for real transforms (libbench2/mflops.c)
    assert fft_mflops(4096, 1.0, real_input=True) == pytest.approx(
        2.5 * 4096 * 12 / 1e6)
    assert fft_mflops(4096, 1.0, real_input=False) == pytest.approx(
        5 * 4096 * 12 / 1e6)


def test_frame_profiler():
    import time
    prof = FrameProfiler(num_streams=8, fft_size=1024)
    for _ in range(5):
        with prof.tick():
            time.sleep(0.001)
    st = prof.stats()
    assert st["ticks"] == 5
    assert st["ms_per_tick"] >= 1.0
    assert st["frames_per_sec"] == pytest.approx(8 / (st["ms_per_tick"] / 1e3))
    assert st["p99_ms"] >= st["p50_ms"]


def test_checkpoint_roundtrip(tmp_path, rng):
    from waveform_tpu.runtime.serving import ServingEngine
    NS, SR = 1_000_000_000, 48000
    cfg = resolve(Settings(fft_size=1024), AudioInfo(SR, 2))
    eng = ServingEngine(cfg, 2)
    now = NS
    for k in range(10):
        x = rng.standard_normal((2, 2, 480)).astype(np.float32)
        for s in range(2):
            eng.feed(s, x[s], now, now_ns=now)
        now += 480 * NS // SR
        eng.tick(now_ns=now)
    before = eng.read_decibels()
    p = str(tmp_path / "state.npz")
    eng.save_state(p)

    eng2 = ServingEngine(cfg, 2)
    eng2.load_state(p)
    np.testing.assert_array_equal(eng2.read_decibels(), before)
    np.testing.assert_array_equal(np.asarray(eng2.ring.buf),
                                  np.asarray(eng.ring.buf))
    # mismatched stream count is rejected, not silently wrong
    eng3 = ServingEngine(cfg, 4)
    with pytest.raises(ValueError, match="shape"):
        eng3.load_state(p)

    # ... unless the caller asks for row migration: load_state(keep=...)
    # maps checkpoint row keep[i] -> new row i and leaves the rest fresh
    # (the checkpoint-based re-provision flow multi-host resize uses)
    eng3.load_state(p, keep=[1, 0])
    after = eng3.read_decibels()
    np.testing.assert_array_equal(after[0], before[1])
    np.testing.assert_array_equal(after[1], before[0])
    assert (after[2:] == DB_MIN).all()
    np.testing.assert_array_equal(np.asarray(eng3.ring.view3)[:2],
                                  np.asarray(eng.ring.view3)[[1, 0]])
    with pytest.raises(ValueError, match="out of range"):
        eng3.load_state(p, keep=[2])


def test_wisdom_cache(tmp_path):
    from waveform_tpu.utils import wisdom
    d = wisdom.enable(str(tmp_path / "cache"))
    cfg = resolve(Settings(fft_size=256), AudioInfo(48000, 2))
    wisdom.warm(cfg, num_streams=2)
    import os
    assert os.path.isdir(d)


def test_startup_banner(capsys):
    from waveform_tpu.utils.log import get_logger, log_startup_banner
    log_startup_banner()
    # logger writes to stderr via its handler
    err = capsys.readouterr().err
    assert "Waveform-TPU v" in err
    assert "Backend:" in err


def test_locale_labels():
    from waveform_tpu.core.locale import LOCALES, label
    assert set(LOCALES) == {"en-US", "zh-CN", "zh-TW", "it-IT"}
    # every property key resolves in every locale
    from waveform_tpu.core.properties import PROPERTY_MAP
    for loc in LOCALES:
        for key in PROPERTY_MAP:
            assert label(key, loc)
    assert label("fft_size", "zh-CN") == "FFT 大小"
    assert label("fft_size", "it-IT") == "Dimensione FFT"
    assert label("fft_size", "xx-XX") == "FFT size"  # fallback to en-US


def test_locale_tables_complete():
    """Every PROPERTY_MAP key is natively present (no en fallback) in all
    four tables — the reference ships full per-language ini files
    (/root/reference/data/locale/)."""
    from waveform_tpu.core.locale import LOCALES
    from waveform_tpu.core.properties import PROPERTY_MAP
    for loc, table in LOCALES.items():
        missing = set(PROPERTY_MAP) - set(table)
        assert not missing, f"{loc} missing {sorted(missing)}"
    # zh-TW is a real traditional-Chinese table, not a zh-CN alias
    assert LOCALES["zh-TW"]["window"] == "窗函數"
    assert LOCALES["zh-CN"]["window"] != LOCALES["zh-TW"]["window"]


def test_property_tooltips():
    """The same 20 keys the reference attaches long descriptions to
    (src/source.cpp:197-441, data/locale/en-US.ini:114-133) carry
    tooltips, exposed through locale.tooltip()."""
    from waveform_tpu.core.locale import tooltip
    from waveform_tpu.core.properties import PROPERTY_MAP
    expected = {
        "audio_sync_offset", "ignore_mute", "normalize_volume",
        "mirror_freq_axis", "deadzone", "radial_arc", "rounded_caps",
        "channel_mode", "auto_fft_size", "enable_large_fft", "fft_size",
        "window", "temporal_smoothing", "gravity", "fast_peaks",
        "interp_mode", "filter_mode", "slope", "rolloff_q", "rolloff_rate",
    }
    have = {k for k, p in PROPERTY_MAP.items() if p.tooltip}
    assert have == expected
    assert tooltip("gravity")
    assert tooltip("nonexistent_key") == ""


def test_locale_full_coverage():
    """All three key classes — property labels, enum-value labels, and
    tooltips — are natively present in every locale, matching the
    reference's ~104-key-per-language ini files
    (/root/reference/data/locale/zh-TW.ini:1-20, en-US.ini:114-133)."""
    import enum as _enum

    from waveform_tpu.core import enums as E
    from waveform_tpu.core.locale import LOCALES, enum_label, tooltip
    from waveform_tpu.core.properties import PROPERTY_MAP

    enum_values = {m.value for n in dir(E)
                   for c in [getattr(E, n)]
                   if isinstance(c, type) and issubclass(c, _enum.Enum)
                   for m in c}
    enum_values |= {"output_bus", "source_name"}
    tip_keys = {f"{k}_desc" for k, p in PROPERTY_MAP.items() if p.tooltip}

    for loc, table in LOCALES.items():
        for cls, keys in (("label", set(PROPERTY_MAP)),
                          ("enum", enum_values), ("tooltip", tip_keys)):
            missing = keys - set(table)
            assert not missing, f"{loc} missing {cls} keys {sorted(missing)}"

    # translated, not aliased: spot-check one key per class per language
    assert enum_label(E.DisplayMode.CURVE, "zh-CN") == "曲线"
    assert enum_label("stereo", "zh-TW") == "立體聲"
    assert enum_label("output_bus", "it-IT") == "Bus di uscita"
    assert tooltip("gravity", "zh-CN") != tooltip("gravity")
    assert tooltip("gravity", "zh-TW") != tooltip("gravity", "zh-CN")
    assert tooltip("gravity", "it-IT").startswith("Quanto")
    # every tooltip translated in every non-English locale (no en fallback)
    en = LOCALES["en-US"]
    for loc in ("zh-CN", "zh-TW", "it-IT"):
        for k in tip_keys:
            assert LOCALES[loc][k] != en[k], f"{loc} {k} untranslated"


def test_demo_wav_reader(tmp_path):
    import wave
    from waveform_tpu.demo import read_wav
    sr = 8000
    x = (np.sin(2 * np.pi * 440 * np.arange(800) / sr))
    pcm = (x * 32767).astype(np.int16)
    p = str(tmp_path / "t.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    audio, got_sr = read_wav(p)
    assert got_sr == sr and audio.shape == (1, 800)
    np.testing.assert_allclose(audio[0], x, atol=1e-4)


def test_demo_cli_all_mode_classes(tmp_path):
    """The demo CLI serves spectrum AND meter/waveform scene JSONs (the
    reference's one source type covers all display modes)."""
    import json
    import wave
    from waveform_tpu.demo import main
    sr = 48000
    t = np.arange(sr // 2) / sr
    x = 0.5 * np.sin(2 * np.pi * 440 * t)
    pcm = np.stack([x, x]).T
    p = str(tmp_path / "t.wav")
    with wave.open(p, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((pcm * 32767).astype(np.int16).tobytes())
    for mode in ("curve", "level_meter", "waveform"):
        sp = tmp_path / f"{mode}.json"
        sp.write_text(json.dumps({"display_mode": mode, "meter_buf": 100}))
        out = str(tmp_path / f"frames_{mode}")
        rc = main([p, "--out", out, "--max-frames", "8", "--every", "4",
                   "--settings", str(sp)])
        assert rc == 0
        import os
        assert any(f.endswith(".png") for f in os.listdir(out)), mode


def test_measured_plans_guide_kernel_choices(tmp_path, monkeypatch):
    """utils/plans.py is the FFTW measure-and-pick analog: a stored plan
    entry steers the stage-1 split and digit dtype; env overrides win;
    invalid entries fall back to the heuristic."""
    import json
    import os as _os

    from waveform_tpu.kernels.exact_pallas import (
        _digit_dtype_choice,
        _stage1_split,
    )
    from waveform_tpu.utils import plans

    pf = tmp_path / "plans.json"
    monkeypatch.setenv("WAVEFORM_TPU_PLAN_FILE", str(pf))
    monkeypatch.delenv("WAVEFORM_TPU_STAGE1_SPLIT", raising=False)
    monkeypatch.delenv("WAVEFORM_TPU_KERNEL_DIGIT_DTYPE", raising=False)

    # no plan file: heuristic defaults
    assert _stage1_split(4096) == 2
    assert _stage1_split(65536) == 3
    assert _digit_dtype_choice(4096) == "bf16"

    pf.write_text(json.dumps({"4096": {"split": 3, "ddt": "int8"}}))
    _os.utime(pf, (1, 1))   # distinct mtime for the lookup cache
    assert _stage1_split(4096) == 3
    assert _digit_dtype_choice(4096) == "int8"

    # env override beats the plan
    monkeypatch.setenv("WAVEFORM_TPU_STAGE1_SPLIT", "2")
    monkeypatch.setenv("WAVEFORM_TPU_KERNEL_DIGIT_DTYPE", "bf16")
    assert _stage1_split(4096) == 2
    assert _digit_dtype_choice(4096) == "bf16"
    monkeypatch.delenv("WAVEFORM_TPU_STAGE1_SPLIT")
    monkeypatch.delenv("WAVEFORM_TPU_KERNEL_DIGIT_DTYPE")

    # a split the size cannot run falls back (65536 needs the 3-factor)
    pf.write_text(json.dumps({"65536": {"split": 2}}))
    _os.utime(pf, (2, 2))
    assert _stage1_split(65536) == 3

    # record() round-trips through plan_for()
    plans.record(8192, {"split": 3, "ddt": "bf16", "us_per_frame": 1.0})
    assert plans.plan_for(8192)["split"] == 3
    assert plans.plan_for(999) is None


def test_packaged_plan_fallback(tmp_path, monkeypatch):
    """The measured v5e plan table ships with the package: it fills in
    for sizes the user's plan file lacks, the user file wins where both
    have entries, and on non-TPU backends the table is inert (tests run
    on CPU, so the real _packaged_plans must return nothing here)."""
    import json

    from waveform_tpu.utils import plans

    # the real gate: CPU backend -> packaged table unused
    plans._packaged_plans.cache_clear()
    assert plans._packaged_plans() == {}

    # the shipped file itself parses and carries the measured entries
    import os

    import waveform_tpu
    path = os.path.join(os.path.dirname(waveform_tpu.__file__),
                        "data", "plans_v5e.json")
    with open(path) as f:
        shipped = json.load(f)
    assert sorted(map(int, shipped)) == [128, 256, 512, 1024, 1040, 2048,
                                         4096, 8192, 16384, 32768, 65536]
    for n, e in shipped.items():
        if "split" not in e:
            # small/irregular sizes (N/128 < 8 or N % 128 != 0): no kernel
            # candidate exists — the row records the measured XLA cost so
            # every slider size has a plan entry (r5)
            from waveform_tpu.kernels.exact_pallas import supports
            assert not supports(int(n)), n
            assert e["xla_us_per_frame"] > 0
            continue
        assert e["ddt"] in ("bf16", "int8")
        assert e["split"] in (2, 3)
        # a plan that claims to lose to XLA should not ship at all
        assert e["us_per_frame"] < e["xla_us_per_frame"]

    # precedence: user plan file entry > packaged entry > None
    pf = tmp_path / "plans.json"
    monkeypatch.setenv("WAVEFORM_TPU_PLAN_FILE", str(pf))
    monkeypatch.setattr(plans, "_packaged_plans",
                        lambda: {"4096": {"split": 3, "ddt": "int8"}})
    assert plans.plan_for(4096) == {"split": 3, "ddt": "int8"}
    pf.write_text(json.dumps({"4096": {"split": 2, "ddt": "bf16"}}))
    assert plans.plan_for(4096) == {"split": 2, "ddt": "bf16"}
    assert plans.plan_for(1024) is None


def test_packaged_plans_v5e_gate_and_no_failure_latch(monkeypatch, tmp_path):
    """The shipped v5e table applies only to v5e-looking TPUs (other
    generations have a different VMEM/MXU balance), and a transient
    backend-init failure must not latch an empty table for the process."""
    import jax

    from waveform_tpu.utils import plans

    monkeypatch.setenv("WAVEFORM_TPU_PLAN_FILE",
                       str(tmp_path / "missing.json"))
    monkeypatch.delenv("PALLAS_AXON_TPU_GEN", raising=False)

    class V4:
        platform, device_kind = "tpu", "TPU v4"

    class V5E:
        platform, device_kind = "tpu", "TPU v5 lite"

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(jax, "devices", lambda: [V4()])
    plans._packaged_plans.cache_clear()
    assert plans._packaged_plans() == {}     # v4: heuristics, no table

    monkeypatch.setattr(jax, "devices", lambda: [V5E()])
    plans._packaged_plans.cache_clear()
    assert "4096" in plans._packaged_plans()  # v5e: shipped table applies

    # the relay names the generation via env when device_kind is opaque
    class Opaque:
        platform, device_kind = "tpu", ""

    monkeypatch.setattr(jax, "devices", lambda: [Opaque()])
    monkeypatch.setenv("PALLAS_AXON_TPU_GEN", "v5e:1x1x1")
    plans._packaged_plans.cache_clear()
    assert "4096" in plans._packaged_plans()

    # transient init failure: plan_for degrades to None but does NOT latch
    def boom():
        raise RuntimeError("backend initializing")

    monkeypatch.setattr(jax, "default_backend", boom)
    plans._packaged_plans.cache_clear()
    assert plans.plan_for(4096) is None
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert plans.plan_for(4096) is not None   # recovered, not cached-empty
    plans._packaged_plans.cache_clear()


def test_checkpoint_r3_ring_layout_loads(tmp_path, rng):
    """An r3-layout checkpoint (sample ring stored [S, C, L]) loads into
    an r4 engine whose ring rides flat [S*C, L] — the row-major reshape
    is exactly the flatten (utils/checkpoint.py size-match fixup)."""
    from waveform_tpu.dsp.devring import DeviceRing
    from waveform_tpu.runtime.serving import ServingEngine
    from waveform_tpu.utils.checkpoint import save_pytree
    NS, SR = 1_000_000_000, 48000
    cfg = resolve(Settings(fft_size=1024), AudioInfo(SR, 2))
    eng = ServingEngine(cfg, 2)
    now = NS
    for k in range(6):
        x = rng.standard_normal((2, 2, 480)).astype(np.float32)
        for s in range(2):
            eng.feed(s, x[s], now, now_ns=now)
        now += 480 * NS // SR
        eng.tick(now_ns=now)
    assert eng.ring.channels == 2          # flat serving layout
    assert eng.ring.buf.shape == (4, 1024)
    assert eng.ring.view3.shape == (2, 2, 1024)
    # write the checkpoint the way an r3 engine would have (3-D ring)
    old_style = (eng.state, DeviceRing(buf=np.asarray(eng.ring.view3)), None)
    p = str(tmp_path / "r3_state.npz")
    save_pytree(p, old_style)
    eng2 = ServingEngine(cfg, 2)
    eng2.load_state(p)
    np.testing.assert_array_equal(np.asarray(eng2.ring.buf),
                                  np.asarray(eng.ring.buf))
    np.testing.assert_array_equal(eng2.read_decibels(), eng.read_decibels())


def test_checkpoint_cross_config_ring_raises(tmp_path):
    """The r3 flatten fixup is restricted to the ONE known layout
    evolution: a [S, C, L] ring whose channel count matches the target
    ring's.  A cross-config checkpoint that merely element-count-matches
    (mono-8-stream [8, 1, L] into a stereo-4-stream flat [8, L]) must
    raise the config-change error, not load with rows mapped to the wrong
    (stream, channel) pairs (ADVICE r4)."""
    from waveform_tpu.dsp.devring import DeviceRing, init_ring
    from waveform_tpu.utils.checkpoint import load_pytree, save_pytree

    old = DeviceRing(buf=np.arange(8 * 64, dtype=np.float32)
                     .reshape(8, 1, 64))
    p = str(tmp_path / "ring.npz")
    save_pytree(p, old)

    stereo4 = init_ring(4, 2, 64, flat=True)   # [8, 64], channels=2
    with pytest.raises(ValueError, match="config or stream count"):
        load_pytree(p, stereo4)

    # the legitimate mono flatten (channels match) still loads
    mono8 = init_ring(8, 1, 64, flat=True)     # [8, 64], channels=1
    got = load_pytree(p, mono8)
    np.testing.assert_array_equal(np.asarray(got.buf),
                                  np.asarray(old.buf).reshape(8, 64))

    # and a non-ring leaf with a matching element count but different
    # ndim is a config change too (no silent reshape outside DeviceRing)
    save_pytree(p, np.zeros((2, 3, 4), np.float32))
    with pytest.raises(ValueError, match="config or stream count"):
        load_pytree(p, np.zeros((6, 4), np.float32))
