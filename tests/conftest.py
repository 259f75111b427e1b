"""Test configuration: run on a virtual 8-device CPU mesh with fp64 enabled.

The reference validates at double precision 1e-6 (/root/reference/test/test.h:31);
we enable x64 for parity tests.  Multi-device tests use the 8 virtual CPU devices.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The environment may force-register an accelerator plugin (JAX_PLATFORMS is
# overridden at interpreter start); pin tests to the virtual CPU mesh explicitly.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
