"""Wisdom: persistent compile-plan caching, the FFTW-wisdom analog.

FFTW serializes its planner's search results as "wisdom" files so later
runs skip the plan search (/root/reference/deps/fftw-3.3.11/api/
export-wisdom-to-file.c, tools/fftw-wisdom.c).  Under XLA the planner is
the compiler and the plan is the compiled executable, so wisdom maps to:

* the persistent JAX compilation cache (:func:`enable`) — compiled programs
  for each (config, shape) land on disk and reload in later processes;
* :func:`warm` — eagerly compile a config's pipeline (the AOT "fftw-wisdom
  tool" analog), so serving starts without the first-tick compile stall.
"""

from __future__ import annotations

import os

import jax


def enable(cache_dir: str | None = None) -> str:
    """Turn on the persistent compilation cache; returns the directory."""
    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "waveform_tpu", "xla")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache_dir


def warm(cfg, num_streams: int) -> None:
    """Pre-compile the serving pipeline for a config (AOT plan).

    Builds a throwaway :class:`ServingEngine` and runs one silent tick —
    the exact fused push+spectrum+rebin executable production engines
    invoke, so the persistent-cache entry is the one that gets hit.
    """
    from ..runtime.serving import ServingEngine

    eng = ServingEngine(cfg, num_streams)
    px = eng.tick(now_ns=1)
    jax.block_until_ready(px)
