"""Test configuration: run everything on CPU with 8 virtual devices.

This substitutes for multi-chip TPU hardware: sharding/pjit tests get a
real 8-device mesh (XLA host-platform devices), and all kernels run via
the same XLA paths they compile to on TPU (Pallas kernels run in
interpret mode on CPU).
"""

import os

# Must be set before jax is imported anywhere. Hard-set (not setdefault):
# the surrounding environment pins JAX_PLATFORMS=axon (the TPU tunnel),
# and tests must run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# jax is pre-imported by the environment's sitecustomize with
# JAX_PLATFORMS=axon already latched — the config update (effective
# until first backend initialization) is what actually selects CPU.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: test runs are compile-bound on CPU.
# Keyed by host CPU identity — XLA:CPU caches AOT machine code, and a
# cache written by a different-microarch host is a SIGILL risk (the
# AOT loader warns exactly that when /tmp persists across hosts).
from pointseg.runtime import host_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", host_cache_dir("/tmp/jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(scope="session")
def devices():
    return jax.devices()


@pytest.fixture
def rng():
    return np.random.default_rng(0)
