"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set the env vars before jax initializes its backends, so this conftest
is imported before any test module imports jax.
"""

import os

# Force CPU (the ambient environment may point JAX_PLATFORMS at a TPU tunnel;
# tests must run on the virtual 8-device CPU mesh).
os.environ["JAX_PLATFORMS"] = os.environ.get("CPFN_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize calls jax.config.update("jax_platforms", "axon,cpu")
# at interpreter startup, which overrides the env var; force it back before
# any backend is initialized.
jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
