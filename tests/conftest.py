"""Test configuration: run everything on a virtual 8-device CPU mesh.

Per SURVEY.md §4: multi-device tests without a real pod — force the host
platform and 8 virtual devices so sharding tests exercise real partitioning.
Must run before jax initializes, hence env vars at import time.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
