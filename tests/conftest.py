"""Test harness config: force CPU with 8 virtual devices so multi-device
(sharding/collective) logic is exercised without TPU hardware, per the
project test strategy (SURVEY.md §4).

Note: this image registers an `axon` TPU PJRT plugin from sitecustomize at
interpreter startup, which pins JAX_PLATFORMS=axon. The backend is only
*registered*, not initialized, at that point, so flipping the platform and
XLA flags here (before any test touches a backend) reliably lands tests on
the 8-device virtual CPU mesh."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_configure(config):
    assert jax.device_count() == 8, jax.devices()
