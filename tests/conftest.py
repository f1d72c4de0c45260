"""Test configuration: force an 8-device virtual CPU mesh.

Must run before any jax import so XLA carves the host into 8 virtual
devices; all sharding/pjit tests then exercise real multi-device code paths
without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-updates jax_platforms to "axon,cpu" at
# interpreter start (routing everything to the remote TPU tunnel); counter
# it before any backend initialization so tests use the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_data_dir():
    """Reference tiny fixtures are read-only; point tests at them directly."""
    return "/root/reference/data"
