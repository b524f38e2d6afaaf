"""Color pipeline: the effect shader's pixel math as array ops.

Re-states the six techniques of the reference's HLSL effect
(/root/reference/data/gradient.effect) in inverse-mapped raster form:

* Solid   — constant ``color_base`` (PSSolid, gradient.effect:61-64)
* Gradient— ``lerp(base, crest, saturate((|y-center|-offset)/height))``
            (PSGradient, :66-70)
* Range   — 3-color threshold on ``1-saturate(...)`` vs range_middle/crest
            (PSRange, :72-80)
* Pulse   — frame-uniform color lerped by peak magnitude or frequency,
            computed host-side per frame (src/source.cpp:1695-1709)

And the radial vertex warp (VSRadial, :43-59) as an inverse pixel mapping
in render/raster.py.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.config import RGBA, ResolvedConfig
from ..core.enums import PulseMode, RenderMode


def _vec(c: RGBA) -> jnp.ndarray:
    return jnp.asarray([c.r, c.g, c.b, c.a], jnp.float32)


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def pixel_colors(cfg: ResolvedConfig, y: jnp.ndarray, grad_center: float,
                 grad_height, grad_offset: float,
                 pulse_color: jnp.ndarray | None = None) -> jnp.ndarray:
    """Per-row color [H, 4] for a column-major raster (y = row coordinate).

    ``grad_height``/``grad_center``/``grad_offset`` follow set_shader_vars
    (src/source.cpp:1693-1743).
    """
    s = cfg.settings
    base, crest, middle = _vec(s.color_base), _vec(s.color_crest), _vec(
        s.color_middle)
    if cfg.render_mode == RenderMode.PULSE and pulse_color is not None:
        return jnp.broadcast_to(pulse_color, (*y.shape, 4))
    if cfg.render_mode == RenderMode.GRADIENT:
        t = saturate((jnp.abs(y - grad_center) - grad_offset)
                     / jnp.maximum(grad_height, 1e-9))
        return base + (crest - base) * t[..., None]
    if cfg.render_mode == RenderMode.RANGE:
        ratio = 1.0 - saturate((jnp.abs(y - grad_center) - grad_offset)
                               / jnp.maximum(grad_height, 1e-9))
        # normalized thresholds (src/source.cpp:1738-1741)
        range_middle = (cfg.settings.range_middle - cfg.ceiling) / cfg.floor
        range_crest = (cfg.settings.range_crest - cfg.ceiling) / cfg.floor
        out = jnp.where((ratio > range_middle)[..., None], base,
                        jnp.where((ratio < range_crest)[..., None], crest,
                                  middle))
        return out
    return jnp.broadcast_to(base, (*y.shape, 4))


def pulse_color_value(cfg: ResolvedConfig, miny, minpos, border_top: float,
                      border_bottom: float, num_positions: int) -> jnp.ndarray:
    """Frame-uniform pulse color (src/source.cpp:1695-1709)."""
    s = cfg.settings
    base, crest = _vec(s.color_base), _vec(s.color_crest)
    rng = border_bottom - border_top
    if cfg.pulse_mode == PulseMode.MAGNITUDE:
        t = saturate((border_bottom - miny) / (rng * s.grad_ratio))
    else:
        t = saturate(minpos / ((num_positions - 1) * s.grad_ratio))
    return base + (crest - base) * t
