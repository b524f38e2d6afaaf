"""Renderer coverage/color semantics across display and render modes."""

import numpy as np
import pytest

from waveform_tpu import (
    AudioInfo,
    ChannelMode,
    DB_MIN,
    DisplayMode,
    InterpMode,
    PulseMode,
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


def test_pulse_frequency_mode():
    """Pulse color follows the peak's position when pulse_mode=frequency
    (src/source.cpp:1700)."""
    from waveform_tpu import PulseMode
    import jax.numpy as jnp
    base = dict(fft_size=256, width=100, height=100, floor=-100, ceiling=0,
                render_mode=RenderMode.PULSE, pulse_mode=PulseMode.FREQUENCY,
                color_base=RGBA(0, 0, 1, 1), color_crest=RGBA(1, 0, 0, 1),
                interp_mode=InterpMode.POINT, grad_ratio=1.0)
    cfg = cfg_for(**base)
    render = make_renderer(cfg)
    nbins = 128
    # peak near the low end vs near the high end of the pixel axis
    # wide peaks: point-mode log sampling skips single bins near the top
    # of the axis (several bins per pixel), faithfully to the reference
    lo = np.full((1, nbins), -90.0, np.float32)
    lo[0, 2:5] = -5.0
    hi = np.full((1, nbins), -90.0, np.float32)
    hi[0, 75:90] = -5.0  # within the 17.5 kHz cutoff (highbin ~93 at 48k)
    img_lo = np.asarray(render(lo))
    img_hi = np.asarray(render(hi))
    c_lo = img_lo[img_lo[..., 3] > 0][0]
    c_hi = img_hi[img_hi[..., 3] > 0][0]
    # low-frequency peak -> t small -> blue; high-frequency peak -> red-ish
    assert c_lo[2] > c_lo[0]
    assert c_hi[0] > c_lo[0]


def test_mirror_bars():
    from waveform_tpu import resolve as _r
    cfg = cfg_for(fft_size=512, width=300, display_mode=DisplayMode.BAR,
                  bar_width=20, bar_gap=5, mirror_freq_axis=True,
                  floor=-100, ceiling=0, interp_mode=InterpMode.POINT)
    render = make_renderer(cfg)
    db = np.linspace(-10, -90, 256, dtype=np.float32)[None]
    img = np.asarray(render(db))
    # bar heights mirror about the middle bar (12 bars, half=6)
    heights = []
    for b in range(cfg.num_bars):
        col = img[:, b * 25 + 5, 3]
        nz = np.nonzero(col)[0]
        heights.append(nz.min() if len(nz) else cfg.height)
    half = cfg.num_bars // 2
    for i in range(half + 1, cfg.num_bars):
        assert heights[i] == heights[half - (i - half)]


def test_single_channel_end_to_end(rng):
    """Single-channel mode picks the configured channel only."""
    from waveform_tpu.runtime.engine import WaveformEngine
    NS, SR = 1_000_000_000, 48000
    cfg = cfg_for(fft_size=1024, channel_mode=ChannelMode.SINGLE, channel=1,
                  audio=AudioInfo(SR, 2))
    assert cfg.capture_channels == 1 and cfg.channel_base == 1
    eng = WaveformEngine(cfg, 1, jit=False)
    now = NS
    for k in range(20):
        t = (np.arange(480) + k * 480) / SR
        ch0 = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
        ch1 = np.sin(2 * np.pi * 9000 * t).astype(np.float32)
        eng.feed(0, np.stack([ch0, ch1]), now, now_ns=now)
        now += 480 * NS // SR
    db = eng.tick(now_ns=now)
    pk = int(np.argmax(db[0, 0])) * SR / cfg.fft_size
    assert abs(pk - 9000) < 2 * SR / cfg.fft_size  # channel 1's tone


def test_radial_bilinear_smooth_arcs():
    """Radial edges are antialiased (analytic coverage at the polar
    coordinates; at least as smooth as the GPU sampler behind
    gradient.effect:43-59): alpha along a mid-ring varies smoothly
    instead of snapping 0/1 like a nearest-neighbor gather."""
    cfg = cfg_for(fft_size=256, width=100, height=200, radial_layout=True,
                  deadzone=10.0, floor=-100, ceiling=0,
                  interp_mode=InterpMode.POINT)
    render = make_renderer(cfg)
    img = np.asarray(render(flat_db(cfg, -5.0)))
    side = img.shape[0]
    c = side / 2.0 - 0.5
    # sample alpha on a dense ring through the lit band
    theta = np.linspace(0, 2 * np.pi, 4000, endpoint=False)
    r = cfg.deadzone_px + cfg.height * 0.5
    ys = np.clip(np.round(c + r * np.cos(theta)).astype(int), 0, side - 1)
    xs = np.clip(np.round(c + r * np.sin(theta)).astype(int), 0, side - 1)
    alpha = img[ys, xs, 3]
    assert (alpha > 0).mean() > 0.9          # the ring is lit
    # bilinear edges produce fractional alpha somewhere in the image
    frac = (img[..., 3] > 0.05) & (img[..., 3] < 0.95)
    assert frac.sum() > 50, "no fractional-alpha pixels: not interpolating"
    assert len(np.unique(img[..., 3].round(3))) > 4, \
        "alpha is binary: nearest-neighbor staircase"


@pytest.mark.parametrize("kw", [
    dict(display_mode=DisplayMode.BAR, bar_width=12, bar_gap=4,
         rounded_caps=True),
    dict(display_mode=DisplayMode.STEPPED_BAR, bar_width=12, bar_gap=4,
         step_width=4, step_gap=2),
    dict(render_mode=RenderMode.LINE),
    dict(display_mode=DisplayMode.BAR, bar_width=12, bar_gap=4,
         channel_mode=ChannelMode.STEREO),
])
def test_radial_modes_render(kw):
    """Every radial-capable display mode renders through the direct polar
    rasterizer: right canvas, empty deadzone, lit ring, finite values.
    (Meter mode forces radial OFF, matching src/source.cpp:1116 — covered
    by test_radial_meter_mode_disabled.)"""
    mode = kw.pop("display_mode", DisplayMode.CURVE)
    cfg = cfg_for(fft_size=256, width=120, height=150, radial_layout=True,
                  deadzone=12.0, floor=-100, ceiling=0,
                  display_mode=mode, interp_mode=InterpMode.POINT, **kw)
    render = make_renderer(cfg)
    db = flat_db(cfg, -20.0)
    img = np.asarray(render(db))
    side = int((cfg.height + cfg.deadzone_px) * 2)
    assert img.shape == (side, side, 4)
    assert np.isfinite(img).all()
    c = side // 2
    assert img[c, c, 3] == 0                      # deadzone empty
    assert (img[..., 3] > 0.5).sum() > 100        # solidly lit content


def test_radial_partial_arc_and_rotation():
    """A half-arc leaves the other half of the canvas dark; rotating the
    arc moves the lit sector."""
    def lit_mask(rotation):
        cfg = cfg_for(fft_size=256, width=100, height=120,
                      radial_layout=True, deadzone=10.0, radial_arc=180.0,
                      radial_rotation=rotation, floor=-100, ceiling=0,
                      interp_mode=InterpMode.POINT)
        img = np.asarray(make_renderer(cfg)(flat_db(cfg, -10.0)))
        return img[..., 3] > 0.5

    a = lit_mask(0.0)
    b = lit_mask(180.0)
    # each sector is roughly half the full-circle coverage and they
    # barely overlap
    assert a.sum() > 1000 and b.sum() > 1000
    overlap = (a & b).sum() / min(a.sum(), b.sum())
    assert overlap < 0.05, overlap


def test_radial_invert_flips_radius():
    """invert maps the graph top (the curve value) to the inner radius:
    with a quiet signal a normal radial is lit OUTSIDE (low y = top of
    graph stays dark near... ) — assert the two orientations differ and
    both stay inside the rim."""
    base = dict(fft_size=256, width=100, height=120, radial_layout=True,
                deadzone=10.0, floor=-100, ceiling=0,
                interp_mode=InterpMode.POINT)
    cfg_n = cfg_for(**base)
    cfg_i = cfg_for(**base, invert_direction=True)
    img_n = np.asarray(make_renderer(cfg_n)(flat_db(cfg_n, -30.0)))
    img_i = np.asarray(make_renderer(cfg_i)(flat_db(cfg_i, -30.0)))
    c = img_n.shape[0] // 2
    # radial alpha profile along a ray (to the right of center)
    ray_n = img_n[c, c:, 3]
    ray_i = img_i[c, c:, 3]
    assert not np.allclose(ray_n, ray_i)
    # normal: lit band hugs the rim side of the value; invert flips the
    # band toward the deadzone. Compare centroids of lit radii.
    rn = np.nonzero(ray_n > 0.5)[0]
    ri = np.nonzero(ray_i > 0.5)[0]
    assert len(rn) and len(ri)
    assert rn.mean() > ri.mean()


def test_radial_meter_mode_disabled():
    """Meter mode forces the radial flag off (src/source.cpp:1116): the
    render stays rectangular."""
    cfg = cfg_for(display_mode=DisplayMode.METER, radial_layout=True,
                  width=60, height=90, bar_width=24, bar_gap=6)
    assert not cfg.radial
    img = np.asarray(make_renderer(cfg)(
        np.array([[-6.0, -30.0]], np.float32)))
    assert img.shape == (90, 60, 4)


def test_radial_waveform_render():
    """Waveform display keeps radial (only meter mode forces it off,
    src/source.cpp:1106-1143): the time-domain pixel buffer renders as a
    polar ring."""
    cfg = cfg_for(display_mode=DisplayMode.WAVEFORM, width=120, height=150,
                  radial_layout=True, deadzone=12.0, floor=-100, ceiling=0)
    assert cfg.radial
    db = np.full((cfg.display_channels, cfg.width), -30.0, np.float32)
    img = np.asarray(make_renderer(cfg)(db))
    side = int((cfg.height + cfg.deadzone_px) * 2)
    assert img.shape == (side, side, 4)
    assert np.isfinite(img).all()
    c = side // 2
    assert img[c, c, 3] == 0
    assert (img[..., 3] > 0.5).sum() > 1000
