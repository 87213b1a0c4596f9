"""Test config: run JAX on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes a backend, so this executes at
conftest import time (pytest imports conftest before test modules).
"""

import os

# The session environment pins JAX_PLATFORMS=axon (the real-TPU tunnel) and a
# sitecustomize imports jax at interpreter start, so env vars alone are too
# late — override through jax.config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = os.environ.get("SE_TPU_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
