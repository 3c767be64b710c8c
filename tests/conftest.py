"""Test configuration: run JAX on a virtual 8-device CPU mesh, fp32 matmuls.

Notes specific to this environment:
* The TPU is exposed through an 'axon' PJRT plugin whose sitecustomize
  force-sets ``jax_platforms="axon,cpu"`` at interpreter start, overriding
  the JAX_PLATFORMS env var — so CPU must be re-forced via jax.config
  *after* importing jax (backends initialize lazily, so this works).
* The TPU's default matmul precision is bfloat16; parity tests compare
  against PyTorch fp32, so tests pin 'highest'.
* Sharding tests need multiple devices; 8 virtual CPU devices stand in
  for a mesh (the documented way to validate pjit/shard_map programs).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
