"""Test configuration: run JAX on a virtual 8-device CPU mesh.

This is the analog of FFTW's ``check.pl --mpi`` localhost-rank trick
(reference: deps/fftw-3.3.11/tests/check.pl): multi-chip behavior is
validated by multi-device simulation on one host.

Note: the axon sitecustomize imports jax at interpreter startup with
``JAX_PLATFORMS=axon``, so env vars alone are too late here —
``jax.config.update`` is what actually flips the backend to CPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x57A7E)
