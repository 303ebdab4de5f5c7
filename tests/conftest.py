"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of "test multi-node without a cluster"
(SURVEY §4): sharding/collective logic is validated on
``xla_force_host_platform_device_count=8`` CPU devices.
"""
import os

# force CPU: the ambient environment points JAX_PLATFORMS at the tunneled
# TPU ('axon'), which would run every test op over the network
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
import jax  # noqa: E402
from jax.experimental.compilation_cache import compilation_cache as _cc  # noqa: E402

# the ambient sitecustomize force-registers the axon TPU plugin via
# jax.config (which outranks the env var) — override it back to CPU
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: makes repeated test runs fast on the
# single-CPU CI host (each XLA compile costs ~0.4 s here).  The dir is
# keyed by host CPU features: XLA:CPU artifacts from a previous VM boot
# with a different ISA SIGILL / flake when deserialized (utils/cache.py)
from trajsde_tpu.utils.cache import cpu_cache_dir  # noqa: E402

_cc.set_cache_dir(cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
