"""Test harness config (SURVEY.md section 4).

Tests run on CPU with 8 virtual devices so the real pjit/shard_map mesh code
path executes without TPU hardware (SURVEY.md 4.6). Must run before jax
import, hence module level in conftest.
"""

import os

# Force, not setdefault: the environment ships JAX_PLATFORMS=axon (the real
# tunneled TPU); tests must never run there (slow, contended, and the
# 8-virtual-device mesh needs the CPU backend). jax is already imported by
# a pytest plugin before this conftest runs and it latched JAX_PLATFORMS at
# import time, so the env var alone is too late -- use jax.config.update,
# which still works before backend initialization.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
