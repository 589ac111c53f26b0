"""Test harness: run everything on a virtual 8-device CPU mesh.

NOTE: in some environments a TPU platform plugin overrides the JAX_PLATFORMS
env var, so env-based selection silently fails; the config API is
authoritative. Must run before any backend initialization, hence module
level in conftest (imported by pytest before the test modules).
"""
import os

import numpy as np  # noqa: E402
import pytest  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compilation cache: CPU compiles of the full model take minutes
# on small hosts; cache them across test runs. Machine-keyed dir — CPU AOT
# entries from a different host never load (utils/cache.py).
from control_gic_tpu.utils.cache import setup_compilation_cache  # noqa: E402

setup_compilation_cache("cpu")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
