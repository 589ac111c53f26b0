"""Multi-host (pod-slice) initialization helpers.

The reference's multi-node story is Lightning-DDP with `num_nodes`
(config_train.yaml:10); the TPU-native equivalent is
jax.distributed.initialize + a global mesh spanning all hosts. Gradient
psums then ride ICI within a slice and DCN across slices, inserted by jit
from the same shardings used single-host — no code changes in the train
step.
"""
from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize jax.distributed. On Cloud TPU pods the arguments are
    auto-detected from the environment; pass them explicitly elsewhere
    (e.g. COORDINATOR_ADDRESS=host:port for CPU multi-process tests)."""
    kwargs = {}
    if coordinator_address or os.environ.get("COORDINATOR_ADDRESS"):
        kwargs["coordinator_address"] = (
            coordinator_address or os.environ["COORDINATOR_ADDRESS"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def is_primary() -> bool:
    return jax.process_index() == 0


def global_device_summary() -> str:
    return (f"process {jax.process_index()}/{jax.process_count()}: "
            f"{jax.local_device_count()} local / "
            f"{jax.device_count()} global devices")
