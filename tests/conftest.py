"""Test harness: CPU-only with 8 virtual devices so multi-chip sharding
compiles and executes without TPU hardware (the reference's suite is
similarly CPU-green anywhere, nsa/tests/conftest.py:21-49).

The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) and puts the
axon PJRT plugin on PYTHONPATH; both must be overridden *before* jax is
imported or every test process pays a ~2 min remote-backend init and runs
at TPU default (bf16) precision.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# keep the axon plugin from being discovered/initialized
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ.pop("PYTHONPATH", None)

# Plugins (e.g. jaxtyping's pytest plugin) may import jax before this
# conftest runs, latching JAX_PLATFORMS=axon at import time — override via
# the live config as well. Backend init is lazy, so this still wins as
# long as no array op has executed yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _determinism():
    np.random.seed(1337)
    yield
