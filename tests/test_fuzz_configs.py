"""Config-space fuzz: random Settings through resolve -> oracle -> render.

The reference exposes ~50 interacting settings whose combinations were
only ever validated by eye in OBS; resolve() re-states its clamp/fixup
rules (src/source.cpp:501-674, 1077-1322).  This seeded sweep hardens the
full surface: every sampled combination must resolve to a consistent
config, run a spectrum/meter frame without NaN/inf, and rasterize to a
finite image of the advertised shape — including deliberately
out-of-range values the reference clamps rather than rejects.
"""

import numpy as np
import pytest

from waveform_tpu import (
    AudioInfo,
    ChannelMode,
    DisplayMode,
    FFTWindow,
    FilterMode,
    InterpMode,
    PulseMode,
    RenderMode,
    RGBA,
    Settings,
    TSmoothingMode,
    resolve,
)
from waveform_tpu.dsp import oracle
from waveform_tpu.render.raster import make_renderer


def _sample_settings(rng: np.random.Generator) -> Settings:
    def pick(enum):
        vals = list(enum)
        return vals[rng.integers(len(vals))]

    def maybe_bad(good, bad):
        return bad if rng.random() < 0.15 else good

    return Settings(
        display_mode=pick(DisplayMode),
        width=int(maybe_bad(rng.integers(16, 300), rng.integers(-5, 8))),
        height=int(maybe_bad(rng.integers(40, 260), rng.integers(-5, 20))),
        log_scale=bool(rng.integers(2)),
        mirror_freq_axis=bool(rng.integers(2)),
        radial_layout=bool(rng.integers(2)),
        invert_direction=bool(rng.integers(2)),
        deadzone=float(maybe_bad(rng.uniform(0, 60), rng.uniform(90, 200))),
        radial_arc=float(rng.uniform(5.0, 360.0)),
        radial_rotation=float(rng.uniform(-360.0, 720.0)),
        rounded_caps=bool(rng.integers(2)),
        channel_mode=pick(ChannelMode),
        channel=int(rng.integers(-1, 4)),
        channel_spacing=int(rng.integers(0, 20)),
        fft_size=int(maybe_bad(int(rng.integers(8, 512)) * 16,
                               rng.integers(-100, 100))),
        auto_fft_size=bool(rng.random() < 0.2),
        window=pick(FFTWindow),
        sine_exponent=int(rng.integers(0, 20)),
        interp_mode=pick(InterpMode),
        filter_mode=pick(FilterMode),
        filter_radius=float(rng.uniform(0.0, 8.0)),
        temporal_smoothing=pick(TSmoothingMode),
        gravity=float(rng.uniform(0.0, 1.0)),
        fast_peaks=bool(rng.integers(2)),
        cutoff_low=int(rng.integers(0, 24000)),
        cutoff_high=int(rng.integers(0, 24000)),  # may invert: clamp rule
        floor=int(rng.integers(-200, 10)),
        ceiling=int(rng.integers(-40, 10)),
        slope=float(rng.uniform(0.0, 2.0)),
        rolloff_q=float(rng.uniform(0.0, 3.0)),
        rolloff_rate=float(rng.uniform(0.0, 48.0)),
        render_mode=pick(RenderMode),
        pulse_mode=pick(PulseMode),
        color_base=RGBA(*rng.uniform(0, 1, 4)),
        color_middle=RGBA(*rng.uniform(0, 1, 4)),
        color_crest=RGBA(*rng.uniform(0, 1, 4)),
        grad_ratio=float(rng.uniform(0.05, 2.0)),
        bar_width=int(rng.integers(1, 40)),
        bar_gap=int(rng.integers(0, 16)),
        step_width=int(rng.integers(1, 16)),
        step_gap=int(rng.integers(0, 10)),
        min_bar_height=int(rng.integers(0, 10)),
        meter_buf=int(rng.integers(10, 500)),
        rms_mode=bool(rng.integers(2)),
        normalize_volume=bool(rng.integers(2)),
        volume_target=int(rng.integers(-40, 0)),
        max_gain=int(rng.integers(0, 40)),
        audio_sync_offset=int(rng.integers(-1500, 1500)),
    )


@pytest.mark.parametrize("seed", range(40))
def test_fuzz_resolve_oracle_render(seed):
    rng = np.random.default_rng(1000 + seed)
    s = _sample_settings(rng)
    channels = int(rng.integers(1, 3))
    cfg = resolve(s, AudioInfo(48000, channels))

    # resolved invariants the rest of the stack relies on; meter and
    # waveform modes repurpose fft_size (meter buffer samples / width,
    # src/source.cpp:1121,1139-1140), so the 128-min/align-16 FFT rule
    # only binds in spectrum mode
    if cfg.spectrum_mode:
        assert cfg.fft_size >= 128 and cfg.fft_size % 16 == 0
    assert cfg.width >= 1 and cfg.height >= 1
    assert cfg.display_channels in (1, 2)

    # one oracle frame on real audio must be finite (never NaN/inf)
    if cfg.spectrum_mode:
        t = np.arange(cfg.fft_size) / 48000.0
        x = np.stack([np.sin(2 * np.pi * 440.0 * t)] * channels)
        ts = np.zeros((channels, cfg.num_bins))
        db, ts = oracle.spectrum_frame(
            x.astype(np.float32), ts, cfg, dt=1 / 60)
        assert np.isfinite(db).all()

    # the frame rasterizes at the advertised canvas size
    render = make_renderer(cfg)
    if cfg.meter_mode:
        vals = np.full((1, cfg.num_bars), -20.0, np.float32)
    elif cfg.display_mode == DisplayMode.WAVEFORM:
        vals = np.full((cfg.display_channels, cfg.width), -20.0, np.float32)
    else:
        vals = np.full((cfg.display_channels, cfg.num_bins), -20.0,
                       np.float32)
    img = np.asarray(render(vals))
    if cfg.radial:
        side = int((cfg.height + cfg.deadzone_px) * 2)
        assert img.shape == (side, side, 4)
    else:
        assert img.shape == (cfg.height, cfg.width, 4)
    assert np.isfinite(img).all()


def test_fuzz_live_scene_edits():
    """Stateful fuzz of the live-edit surface: a seeded random sequence of
    add/remove/update/set_show/feed/tick against a running MultiEngine.
    Invariants: every registered handle reads finite display values, group
    bookkeeping stays consistent, and the scene never crashes."""
    import numpy as np

    from waveform_tpu import (
        AudioInfo,
        DisplayMode,
        FFTWindow,
        Settings,
        TSmoothingMode,
        resolve,
    )
    from waveform_tpu.runtime.multi import MultiEngine

    NS, SR = 1_000_000_000, 48000
    rng = np.random.default_rng(42)
    audio = AudioInfo(SR, 2)
    cfg_pool = [
        resolve(Settings(fft_size=512, window=FFTWindow.HANN,
                         temporal_smoothing=TSmoothingMode.NONE), audio),
        resolve(Settings(fft_size=1024, window=FFTWindow.BLACKMAN,
                         temporal_smoothing=TSmoothingMode.NONE), audio),
        resolve(Settings(display_mode=DisplayMode.METER, meter_buf=120,
                         temporal_smoothing=TSmoothingMode.NONE), audio),
        resolve(Settings(display_mode=DisplayMode.WAVEFORM, width=128,
                         meter_buf=100), audio),
    ]
    m = MultiEngine()
    live: list[int] = [m.add_stream(cfg_pool[0]), m.add_stream(cfg_pool[1])]
    hidden: set[int] = set()
    now, ph = NS, 0
    for step in range(60):
        op = rng.choice(["add", "remove", "update", "show", "feed_tick",
                         "feed_tick", "feed_tick"])
        if op == "add" and len(live) < 10:
            live.append(m.add_stream(cfg_pool[rng.integers(len(cfg_pool))]))
        elif op == "remove" and len(live) > 1:
            sid = live.pop(int(rng.integers(len(live))))
            m.remove_stream(sid)
            hidden.discard(sid)
        elif op == "update" and live:
            sid = live[int(rng.integers(len(live)))]
            m.update_stream(sid, cfg_pool[rng.integers(len(cfg_pool))])
        elif op == "show" and live:
            sid = live[int(rng.integers(len(live)))]
            if sid in hidden:
                hidden.discard(sid)
                m.set_show(sid, True)
            else:
                hidden.add(sid)
                m.set_show(sid, False)
        else:
            t = (np.arange(480) + ph) / SR
            ph += 480
            for sid in live:
                f = 400.0 + 137.0 * (sid % 7)
                x = np.sin(2 * np.pi * f * t).astype(np.float32)
                m.feed(sid, np.stack([x, x]), now, now_ns=now)
            now += 480 * NS // SR
            m.tick(now_ns=now)
        # invariants after every op
        assert m.num_groups == len({m.config_of(s) for s in live})
        for sid in live:
            assert np.isfinite(m.read_decibels(sid)).all(), (step, op, sid)
