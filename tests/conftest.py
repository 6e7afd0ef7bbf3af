"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors SURVEY.md §4's note: multi-device code is validated with
``xla_force_host_platform_device_count`` since only one real TPU chip is
attached. The sandbox's sitecustomize imports jax before pytest starts, so
the platform must be forced via jax.config (env vars alone are too late).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from hnsw_nsg_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
