"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; sharding logic is exercised on a fake
8-device host platform per SURVEY §4.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The container's sitecustomize registers the axon TPU plugin and overrides
# JAX_PLATFORMS from the environment; only the programmatic config update
# reliably forces the CPU test platform (with the 8 virtual devices above).
jax.config.update("jax_platforms", "cpu")

# Golden-parity tests compare against f64/f32 torch oracles; run all test
# matmuls at full f32 (production TPU keeps the default bf16 MXU path).
jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compile cache: the capture/chained-parity fixtures compile
# multi-minute XLA programs; caching executables across sessions cuts the
# suite from >20 min to a few minutes on re-runs (VERDICT r2 weak #6).
from avatarcap_tpu.utils.timers import enable_compile_cache  # noqa: E402

enable_compile_cache("/tmp/avatarcap_jax_cache_cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(31359)


from avatarcap_tpu.utils.toy_body import (  # noqa: E402,F401
    uv_sphere, make_toy_smpl_params)


@pytest.fixture
def toy_smpl():
    return make_toy_smpl_params()
