"""Test configuration: run on a virtual 12-device CPU mesh with f64 available
(8 for the slab/GSPMD tests, 3x3 and 3x4 for the 2-D pencil tests).

This is the TPU-native analogue of "test multi-node without a cluster"
(SURVEY.md §4.3): distributed correctness = single-device result equality under
different shardings, validated on the CPU backend.
"""

import os
import sys

# NB: this image's sitecustomize registers a TPU backend and pins
# JAX_PLATFORMS=axon before conftest runs, so the env var route is dead; the
# config.update route still wins as long as no backend has been initialized.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=12").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
