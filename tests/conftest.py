"""Test configuration: force JAX onto CPU with 8 virtual devices.

Tests never touch real TPU hardware; sharding/mesh tests run on a virtual 8-device CPU
mesh (mirroring how the driver dry-runs the multi-chip path). Must run before any jax
import in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Tests (and their bench.py subprocesses) must never pollute the committed
# round-over-round regression ledger (docs/BENCH_HISTORY.jsonl).
os.environ["MPC_IRIS_NO_BENCH_HISTORY"] = "1"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The environment's sitecustomize may register an external TPU plugin and force
# jax_platforms via jax.config (which overrides the env var), so pin the config
# explicitly before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: XLA compiles dominate the suite's wall time on
# this 1-vCPU host (~30 min cold); a warm cache cuts repeat runs to minutes.
# Separate dir from the CLI/TPU cache to keep eviction behavior independent.
from mpc_iris_tpu.utils.config import enable_compile_cache

enable_compile_cache(os.path.expanduser("~/.cache/mpc-iris-tpu/jax-tests"))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0xC0FFEE)
