"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Tests must run without TPU hardware; multi-chip sharding tests use the
host-platform device-count override. The environment may pre-register a
TPU plugin at interpreter startup (sitecustomize), so we override the
platform via jax.config and clear any initialized backends.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Pin the env var too: CLI modules (train.py / eval.py) call
# respect_jax_platforms_env() at import, which re-asserts JAX_PLATFORMS
# and clears backends — with the launcher's `axon` value still set, a
# test importing them would silently swap the 8-device CPU mesh for the
# real TPU mid-suite.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from itermvs_tpu.utils import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running test (full-resolution parity etc.)")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
