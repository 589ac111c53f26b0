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
# on small hosts; cache them across test runs.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                 os.path.expanduser("~/.cache/jax_cache_cpu")))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
