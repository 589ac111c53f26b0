"""Persistent-compilation-cache setup shared by tests, CLIs and the driver
entry points.

Caches are keyed per backend AND (for CPU) per host-machine feature set:
XLA:CPU AOT entries embed the compile machine's feature list and refuse to
load on a host with different features (``cpu_aot_loader`` errors on every
lookup), so a cache dir shared across heterogeneous hosts never hits and
every run recompiles from scratch.  Hashing the host's CPU feature flags
into the directory name makes a mismatched entry structurally impossible:
each machine class reads and writes its own directory.
"""
from __future__ import annotations

import hashlib
import os


def _machine_tag() -> str:
    """Short stable fingerprint of the host CPU's feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.machine().encode()).hexdigest()[:8]


def cache_dir(backend: str | None = None) -> str:
    import jax

    backend = backend or jax.default_backend()
    name = f"jax_cache_{backend}"
    if backend == "cpu":  # AOT entries are machine-feature-specific on CPU
        name += f"_{_machine_tag()}"
    return os.path.expanduser(f"~/.cache/{name}")


def setup_compilation_cache(backend: str | None = None) -> str:
    """Point jax at the per-backend, machine-keyed persistent cache."""
    import jax

    path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or cache_dir(backend)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
