"""Structured logging, replacing the reference's OBS-blog wrapper.

The reference streams into OBS's logger with a ``[phandasm_waveform]`` prefix
(/root/reference/src/log.hpp:24-45) and logs version/arch/CPU capabilities
on startup (src/source.cpp:1793-1794).  The TPU analog: a stdlib logger with
the package prefix plus a startup banner reporting the JAX backend and
device inventory (the successor of the CPUID capability line).
"""

from __future__ import annotations

import logging

LOGGER_NAME = "waveform_tpu"


def get_logger() -> logging.Logger:
    logger = logging.getLogger(LOGGER_NAME)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter(
            "[waveform_tpu] %(levelname)s: %(message)s"))
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    return logger


def log_startup_banner() -> None:
    """Version + device capabilities (the CPUID-caps line's successor)."""
    import jax

    from .. import __version__
    logger = get_logger()
    devices = jax.devices()
    logger.info("Waveform-TPU v%s", __version__)
    logger.info("Backend: %s; devices: %s", jax.default_backend(),
                ", ".join(str(d) for d in devices))
