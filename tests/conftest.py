"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax initializes — this file is imported by pytest
before any test module touches jax.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon TPU plugin overrides JAX_PLATFORMS at import time; force CPU here
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# persistent compilation cache makes repeated test runs much faster
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def mesh8():
    from jax.sharding import Mesh

    devices = np.array(jax.devices("cpu")[:8]).reshape(4, 2)
    return Mesh(devices, ("dp", "mp"))
