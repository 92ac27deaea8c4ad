"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Tests validate numerics and multi-chip sharding without TPU hardware; the
driver's bench runs separately on the real chip.  Must set flags before the
first ``import jax`` anywhere in the test process.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu";
# override it back so tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache, READ-ONLY: warm entries (written by earlier
# CLI/bench/dryrun processes) still load instantly, but the suite never
# serializes executables itself — PJRT:CPU's executable.serialize() CHECK-
# aborts the whole process for some engine-step programs (observed three
# times at compilation_cache.put_executable_and_time; min_compile_time=1e9
# makes every write skip, which sidesteps the abort without losing reads).
try:
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/vstab_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1e9)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
