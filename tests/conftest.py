"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding/parallelism tests need multiple devices; real multi-chip hardware
is not available, so every test runs on 8 virtual CPU devices (the
documented way to validate pjit/shard_map programs device-count-agnostically).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
