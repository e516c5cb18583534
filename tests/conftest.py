"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on `--xla_force_host_platform_device_count=8` CPU devices, as the
driver's dryrun_multichip does. Must run before jax is imported anywhere.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# The axon TPU PJRT plugin (sitecustomize in /root/.axon_site) imports jax and
# registers the TPU backend at interpreter start, overriding JAX_PLATFORMS.
# Re-point jax at the (8-device virtual) CPU before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent compilation cache: the suite is dominated by flax CPU compiles
# (25-35 min cold); warm reruns skip them, and the cached 8-device-mesh
# programs make the driver's dryrun_multichip a cache hit (VERDICT r4 item 2).
from ossid_code_tpu.core.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)
