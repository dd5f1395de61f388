"""Test harness: force an 8-device virtual CPU mesh before JAX imports.

Multi-chip TPU hardware is unavailable in CI; sharding tests run on XLA's
host-platform virtual devices instead (SURVEY.md section 4's multi-host test
strategy).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
