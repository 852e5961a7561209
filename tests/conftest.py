"""Test harness config: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends — conftest is
imported before any test module, so this is the single choke point.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402
import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config knob works.
jax.config.update("jax_platforms", "cpu")


@pytest.fixture(scope="session")
def devices():
    return jax.devices()
