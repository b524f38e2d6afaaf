"""Config resolution rules vs the reference's get_settings()/update() clamps."""

import dataclasses

from waveform_tpu import (
    AudioInfo,
    ChannelMode,
    DisplayMode,
    FFTWindow,
    FilterMode,
    InterpMode,
    PulseMode,
    Settings,
    VideoInfo,
    resolve,
)


def make(**kw):
    audio = kw.pop("audio", AudioInfo())
    video = kw.pop("video", VideoInfo())
    return resolve(Settings(**kw), audio, video)


def test_defaults():
    cfg = make()
    assert cfg.fft_size == 4096
    assert cfg.window == FFTWindow.HANN
    assert cfg.display_mode == DisplayMode.CURVE
    assert cfg.capture_channels == 2
    assert cfg.output_channels == 2  # 2 capture channels -> 2 fft channels
    assert not cfg.stereo
    assert cfg.spectrum_mode


def test_fft_size_clamp_and_align():
    # reference: src/source.cpp:562-565
    assert make(fft_size=100).fft_size == 128
    assert make(fft_size=1000).fft_size == 992  # align down to multiple of 16
    assert make(fft_size=4096).fft_size == 4096
    assert make(fft_size=65536).fft_size == 8192  # large fft gated
    assert make(fft_size=65536, enable_large_fft=True).fft_size == 65536


def test_cutoff_fixup():
    # reference: src/source.cpp:567-571
    cfg = make(cutoff_low=20000, cutoff_high=100)
    assert (cfg.cutoff_low, cfg.cutoff_high) == (120, 17500)
    cfg = make(cutoff_low=100, cutoff_high=100)
    assert (cfg.cutoff_low, cfg.cutoff_high) == (100, 100)


def test_floor_ceiling_fixup():
    # reference: src/source.cpp:573-577
    cfg = make(floor=0, ceiling=0)
    assert (cfg.floor, cfg.ceiling) == (-120, 0)
    cfg = make(floor=-10, ceiling=-20)
    assert (cfg.floor, cfg.ceiling) == (-120, 0)


def test_auto_fft_size():
    # reference: src/source.cpp:1161-1167 — samples_per_sec/fps aligned down to 16
    cfg = make(auto_fft_size=True, audio=AudioInfo(48000, 2), video=VideoInfo(60.0))
    assert cfg.fft_size == 800
    cfg = make(auto_fft_size=True, audio=AudioInfo(44100, 2), video=VideoInfo(60.0))
    assert cfg.fft_size == 735 & ~15 == 720


def test_meter_mode_fixups():
    # reference: src/source.cpp:1106-1128
    cfg = make(display_mode=DisplayMode.METER, window=FFTWindow.BLACKMAN,
               interp_mode=InterpMode.LANCZOS, filter_mode=FilterMode.GAUSS,
               slope=2.0, channel_mode=ChannelMode.STEREO, radial_layout=True,
               normalize_volume=True, mirror_freq_axis=True, meter_buf=100,
               audio=AudioInfo(48000, 2))
    assert cfg.meter_mode
    assert cfg.window == FFTWindow.NONE
    assert cfg.interp_mode == InterpMode.POINT
    assert cfg.filter_mode == FilterMode.NONE
    assert cfg.slope == 0.0
    assert not cfg.stereo and not cfg.radial and not cfg.normalize_volume
    assert not cfg.mirror_freq_axis
    assert cfg.fft_size == (48000 * 100 // 1000) & ~15  # 4800 -> 4800
    assert cfg.num_bars == cfg.capture_channels


def test_waveform_mode_fixups():
    # reference: src/source.cpp:1129-1143
    cfg = make(display_mode=DisplayMode.WAVEFORM, width=640, meter_buf=200,
               audio=AudioInfo(48000, 2))
    assert cfg.fft_size == 640
    assert cfg.waveform_samples == 9600
    assert not cfg.log_scale
    assert cfg.window == FFTWindow.NONE


def test_single_channel_mode():
    # reference: src/source.cpp:1092-1103
    cfg = make(channel_mode=ChannelMode.SINGLE, channel=1, audio=AudioInfo(44100, 2))
    assert cfg.capture_channels == 1
    assert cfg.channel_base == 1
    cfg = make(channel_mode=ChannelMode.SINGLE, channel=5, audio=AudioInfo(44100, 2))
    assert cfg.capture_channels == 0
    assert cfg.channel_base == 0


def test_bar_count():
    # reference: src/source.cpp:1269-1276 — 800/(24+6)=26, remainder 20 < 24
    cfg = make(display_mode=DisplayMode.BAR)
    assert cfg.num_bars == 26
    # 810 - 27*30 = 0 -> stays 27; 816-27*30=6 <24 stays
    assert make(display_mode=DisplayMode.BAR, width=834).num_bars == 28  # 834-27*30=24>=24


def test_radial_geometry():
    # reference: src/source.cpp:658-666
    cfg = make(radial_layout=True, height=400, deadzone=10.0)
    assert cfg.height == 200 - 20
    assert cfg.deadzone_px == 20.0


def test_channel_spacing_rules():
    # reference: src/source.cpp:579-580
    cfg = make(channel_mode=ChannelMode.STEREO, channel_spacing=10)
    assert cfg.channel_spacing == 10 and cfg.stereo
    cfg = make(channel_mode=ChannelMode.MONO, channel_spacing=10)
    assert cfg.channel_spacing == 0
    cfg = make(channel_mode=ChannelMode.STEREO, channel_spacing=500, height=225)
    assert cfg.channel_spacing == 0


def test_resolved_is_hashable():
    cfg = make()
    hash(cfg)  # must be usable as a jit static argument
    assert dataclasses.asdict(cfg)["fft_size"] == 4096
