"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax import so XLA carves the host into 8 virtual
devices; all sharding/pjit tests then exercise real multi-device code paths
without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_data_dir():
    """Reference tiny fixtures are read-only; point tests at them directly."""
    return "/root/reference/data"
