"""Renderer coverage/color semantics across display and render modes."""

import numpy as np
import pytest

from waveform_tpu import (
    AudioInfo,
    ChannelMode,
    DB_MIN,
    DisplayMode,
    InterpMode,
    RenderMode,
    RGBA,
    Settings,
    resolve,
)
from waveform_tpu.render.image import to_rgba8, write_png
from waveform_tpu.render.raster import make_renderer, render_geometry


def cfg_for(**kw):
    audio = kw.pop("audio", AudioInfo(48000, 2))
    return resolve(Settings(**kw), audio)


def flat_db(cfg, level):
    nbins = cfg.fft_size // 2
    return np.full((cfg.display_channels, nbins), level, np.float32)


def test_curve_solid_fill():
    cfg = cfg_for(fft_size=256, width=100, height=100, floor=-100, ceiling=0,
                  interp_mode=InterpMode.POINT)
    render = make_renderer(cfg)
    img = np.asarray(render(flat_db(cfg, -50.0)))
    assert img.shape == (100, 100, 4)
    # -50 dB over [-100, 0] -> y=50; solid fill from y=50 to bottom
    col = img[:, 50, 3]  # alpha down one column
    assert (col[:49] == 0).all()
    assert (col[51:] > 0).all()


def test_curve_line_mode():
    cfg = cfg_for(fft_size=256, width=100, height=100, floor=-100, ceiling=0,
                  render_mode=RenderMode.LINE, interp_mode=InterpMode.POINT)
    img = np.asarray(make_renderer(cfg)(flat_db(cfg, -50.0)))
    col = img[:, 50, 3]
    filled = np.nonzero(col)[0]
    assert len(filled) <= 3 and 49 <= filled.mean() <= 51  # thin line at y=50


def test_stereo_symmetry():
    cfg = cfg_for(fft_size=256, width=80, height=100,
                  channel_mode=ChannelMode.STEREO, floor=-100, ceiling=0,
                  interp_mode=InterpMode.POINT)
    img = np.asarray(make_renderer(cfg)(flat_db(cfg, -50.0)))
    a = img[:, 40, 3]
    # symmetric about center row 50: a[50-k] == a[50+k]
    np.testing.assert_array_equal(a[1:50], a[51:100][::-1])
    assert a[25] > 0 and a[75] > 0 and a[5] == 0 and a[95] == 0


def test_bars_and_gaps():
    cfg = cfg_for(fft_size=512, width=90, height=100,
                  display_mode=DisplayMode.BAR, bar_width=20, bar_gap=10,
                  floor=-100, ceiling=0, interp_mode=InterpMode.POINT)
    assert cfg.num_bars == 3
    img = np.asarray(make_renderer(cfg)(flat_db(cfg, -30.0)))
    rowidx = 80  # well below the bar tops (~y=30)
    row = img[rowidx, :, 3]
    assert (row[0:20] > 0).all()      # bar 0
    assert (row[20:30] == 0).all()    # gap
    assert (row[30:50] > 0).all()     # bar 1
    assert (row[50:60] == 0).all()


def test_stepped_bars_quantized():
    cfg = cfg_for(fft_size=512, width=60, height=120,
                  display_mode=DisplayMode.STEPPED_BAR, bar_width=20,
                  bar_gap=10, step_width=8, step_gap=4, floor=-120, ceiling=0,
                  interp_mode=InterpMode.POINT)
    img = np.asarray(make_renderer(cfg)(flat_db(cfg, -40.0)))
    col = img[:, 5, 3]
    # stepped fill: alternating 8-filled / 4-empty cells from the bottom
    filled = np.nonzero(col)[0]
    assert len(filled) > 0
    # no solid run longer than step_width+1
    runs = np.split(filled, np.where(np.diff(filled) != 1)[0] + 1)
    assert max(len(r) for r in runs) <= 9
    assert min(len(r) for r in runs) >= 7


def test_gradient_colors_vary_with_y():
    cfg = cfg_for(fft_size=256, width=60, height=100, floor=-100, ceiling=0,
                  render_mode=RenderMode.GRADIENT,
                  color_base=RGBA(1, 0, 0, 1), color_crest=RGBA(0, 0, 1, 1),
                  interp_mode=InterpMode.POINT)
    img = np.asarray(make_renderer(cfg)(flat_db(cfg, -20.0)))
    col = img[:, 30]
    # near the crest (top of fill, far from grad_center=bottom) → blue-ish
    top_px = col[25]
    bottom_px = col[95]
    assert top_px[2] > top_px[0]      # blue dominates near crest
    assert bottom_px[0] > bottom_px[2]  # red dominates near base


def test_range_thresholds():
    cfg = cfg_for(fft_size=256, width=40, height=120, floor=-120, ceiling=0,
                  render_mode=RenderMode.RANGE,
                  color_base=RGBA(0, 1, 0, 1), color_middle=RGBA(1, 1, 0, 1),
                  color_crest=RGBA(1, 0, 0, 1), range_middle=-20,
                  range_crest=-9, interp_mode=InterpMode.POINT)
    img = np.asarray(make_renderer(cfg)(flat_db(cfg, -2.0)))
    col = img[:, 20]
    # near the top (loud) red; middle yellow; lower green
    assert col[5][0] > 0.9 and col[5][1] < 0.1     # red zone
    assert col[15][0] > 0.9 and col[15][1] > 0.9   # yellow zone
    assert col[60][1] > 0.9 and col[60][0] < 0.1   # green zone


def test_pulse_uniform_color():
    cfg = cfg_for(fft_size=256, width=40, height=100, floor=-100, ceiling=0,
                  render_mode=RenderMode.PULSE,
                  color_base=RGBA(0, 0, 0, 1), color_crest=RGBA(1, 1, 1, 1),
                  interp_mode=InterpMode.POINT)
    img = np.asarray(make_renderer(cfg)(flat_db(cfg, -10.0)))
    on = img[img[..., 3] > 0]
    assert len(on) > 0
    # every lit pixel has the same color (frame-uniform pulse)
    assert np.allclose(on, on[0])


def test_radial_canvas_and_deadzone():
    cfg = cfg_for(fft_size=256, width=100, height=200, radial_layout=True,
                  deadzone=20.0, floor=-100, ceiling=0,
                  interp_mode=InterpMode.POINT)
    render = make_renderer(cfg)
    img = np.asarray(render(flat_db(cfg, -5.0)))
    side = int((cfg.height + cfg.deadzone_px) * 2)
    assert img.shape == (side, side, 4)
    # center (deadzone) is empty
    c = side // 2
    assert img[c, c, 3] == 0
    # some ring content exists
    assert (img[..., 3] > 0).any()


def test_meter_render():
    cfg = cfg_for(display_mode=DisplayMode.METER, bar_width=24, bar_gap=6,
                  floor=-65, ceiling=0)
    render = make_renderer(cfg)
    vals = np.array([[-6.0, -30.0]], np.float32)  # [1, C]
    img = np.asarray(render(vals))
    # two bars of different heights
    col0 = np.nonzero(img[:, 10, 3])[0]
    col1 = np.nonzero(img[:, 40, 3])[0]
    assert len(col0) > len(col1) > 0


def test_rounded_caps_extend_above_bar():
    cfg = cfg_for(fft_size=256, width=60, height=120,
                  display_mode=DisplayMode.BAR, bar_width=20, bar_gap=10,
                  rounded_caps=True, floor=-120, ceiling=0,
                  interp_mode=InterpMode.POINT)
    img_caps = np.asarray(make_renderer(cfg)(flat_db(cfg, -60.0)))
    cfg2 = cfg_for(fft_size=256, width=60, height=120,
                   display_mode=DisplayMode.BAR, bar_width=20, bar_gap=10,
                   rounded_caps=False, floor=-120, ceiling=0,
                   interp_mode=InterpMode.POINT)
    img_flat = np.asarray(make_renderer(cfg2)(flat_db(cfg2, -60.0)))
    top_caps = np.nonzero(img_caps[:, 10, 3])[0].min()
    top_flat = np.nonzero(img_flat[:, 10, 3])[0].min()
    # cap geometry shifts the rectangle down by border_top but the disc
    # rounds the end; column center reaches above the rectangle top
    mid_col_top = np.nonzero(img_caps[:, 9, 3])[0].min()
    edge_col_top = np.nonzero(img_caps[:, 1, 3])[0].min()
    assert mid_col_top < edge_col_top  # rounded profile


def test_png_roundtrip(tmp_path):
    cfg = cfg_for(fft_size=256, width=64, height=64,
                  interp_mode=InterpMode.POINT)
    img = np.asarray(make_renderer(cfg)(flat_db(cfg, -20.0)))
    p = tmp_path / "frame.png"
    write_png(str(p), img)
    data = p.read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IEND" in data
    assert to_rgba8(img).shape == (64, 64, 4)
