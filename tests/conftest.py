"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Mirrors the reference's seeded-test fixture (reference tests/conftest.py:6-8)
but adds multi-device simulation so data/band-parallel sharding is exercised
without TPU pod hardware (see SURVEY.md §4).
"""

import os

# Must be set before the backend initializes. Force CPU: unit tests must not
# depend on TPU hardware; the bench harness covers the real chip. Note: the
# sandbox's sitecustomize registers an "axon" TPU plugin and overrides
# JAX_PLATFORMS programmatically, so the env var alone is not enough — the
# jax.config update below is what actually wins.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
# Full-precision math for parity tests; production paths pick dtypes explicitly.
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed_rngs():
    np.random.seed(3407)
    try:
        import torch

        torch.manual_seed(3407)
    except ImportError:
        pass
    yield


@pytest.fixture(autouse=True)
def _scope_reference_oracle_stubs():
    """Un-poison sys.modules after every test.

    reference_oracle.add_reference_to_path() installs stub modules (pesq,
    pystoi, librosa, ...) so the upstream oracle imports; left in
    sys.modules they silently change later tests' real-import behavior
    (a fake `pesq` made test_pesq_wrapper_falls_back_without_wheel fail in
    full-suite order, round-3 verdict weak #3). Stubs are tagged, so this
    removes exactly what the oracle installed, in any test order.
    """
    yield
    from reference_oracle import remove_stubs

    remove_stubs()
