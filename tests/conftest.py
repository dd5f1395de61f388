"""Test harness: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding tests run on XLA's
host-platform virtual devices instead (SURVEY.md section 4's multi-host test
strategy). The environment's sitecustomize registers a remote TPU backend and
sets jax_platforms itself, so we must override via jax.config (env vars alone
are ignored) before any backend initializes — this also avoids paying the
~12s tunnel connection per test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
