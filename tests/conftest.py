"""Test configuration: CPU backend with 8 fake devices, x64 enabled.

The re-exec that guarantees the fake devices lives in the repo-root
conftest.py (it must run before pytest starts capturing output). Here:
CPU platform, persistent compilation cache (XLA compiles are slow on this
1-core box; caching makes re-runs ~8x faster), x64 for the f64 oracle /
parity path (tests construct f32 arrays when exercising the TPU-ish fast
path), and shared fixtures.
"""
import os

_N_FAKE_DEVICES = 8

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={_N_FAKE_DEVICES}"
    ).strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)
