"""Waveform-TPU: a TPU-native audio spectral-analysis framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
phandasm/waveform OBS plugin: batched windowed real-FFT spectrum analysis,
temporal smoothing, log-frequency rebinning with Lanczos/Catmull-Rom
interpolation and Gaussian filtering, meter and oscilloscope modes, and the
curve/bar render geometry + color pipelines — processing hundreds of
concurrent audio streams per chip instead of one SIMD lane per source.
"""

__version__ = "0.1.0"

from .core.config import (  # noqa: F401
    DB_MIN,
    RGBA,
    AudioInfo,
    ResolvedConfig,
    Settings,
    VideoInfo,
    resolve,
)
from .core.enums import (  # noqa: F401
    ChannelMode,
    DisplayMode,
    FFTWindow,
    FilterMode,
    InterpMode,
    PulseMode,
    RenderMode,
    TSmoothingMode,
)
