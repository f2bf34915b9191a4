"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy of math-parity + synthetic
fixtures (reference: tests/test_rsa_bootstrap.py:1-22); the virtual
device mesh is the TPU-build addition for sharding tests
(SURVEY.md §4: xla_force_host_platform_device_count fakes a
multi-device mesh without hardware).

Note: jax.config.update("jax_platforms", "cpu") is used instead of the
JAX_PLATFORMS env var because the TPU-terminal sitecustomize forces
"axon,cpu" programmatically after env parsing.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
