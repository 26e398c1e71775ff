"""Test configuration.

Tests run on CPU with a virtual 8-device mesh so multi-chip sharding logic is
exercised without TPU hardware (mirrors how the reference tests multi-"node"
behavior with 2 local workers, reference ``tests/conftest.py:78-89`` — here we
go further and simulate an 8-device mesh).
"""

import os

# MFA_TPU_TEST_BACKEND=tpu runs the suite against real hardware (used for
# the Pallas-kernel parity tests, which are skipped on CPU)
_backend = os.environ.get("MFA_TPU_TEST_BACKEND", "cpu")
if _backend == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (
            xla_flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

# the environment's TPU plugin prepends itself to jax_platforms even when
# JAX_PLATFORMS=cpu is exported; force the CPU backend for tests explicitly
if _backend == "cpu":
    jax.config.update("jax_platforms", "cpu")

from pathlib import Path

import pytest

REFERENCE_DATA = Path("/root/reference/tests/data")


@pytest.fixture(scope="session")
def reference_data_dir():
    if not REFERENCE_DATA.exists():
        pytest.skip("reference test data not available")
    return REFERENCE_DATA


@pytest.fixture(scope="session")
def mono_model_path(reference_data_dir):
    p = reference_data_dir / "am" / "mono_model.zip"
    if not p.exists():
        pytest.skip("mono model fixture not available")
    return p
