"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are validated without TPU hardware via
XLA's host-platform device-count emulation (the fake-backend story the
reference lacks entirely -- SURVEY.md section 4).
Must set env vars before jax initializes, hence the import-order dance.
"""

import os

# force CPU even if the environment preselects a TPU platform (tests
# must be hardware-independent; bench.py is what runs on the real chip)
_platform = os.environ.get("LCDM_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# some pytest plugins (jaxtyping) import jax before this conftest runs, so
# the env var alone can be too late; the config route works until the
# backend is actually initialized
jax.config.update("jax_platforms", _platform)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def cpu_devices():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    return devs
