"""Device-mesh helpers.

The reference's only distribution strategy is Lightning-DDP over NCCL
(config_train.yaml:9-12); the TPU-native equivalent is a jax.sharding.Mesh
with the batch sharded over a 'data' axis: jit then inserts gradient psums
over ICI automatically. High-res tiles are likewise sharded over 'data'
(tiles are independent in the reference, inference_high_resolution.py:234-251,
so no halo exchange is needed for parity — see parallel/spatial_encoder.py
/ spatial_decoder.py / spatial_codec.py for the fused single-pass
alternative).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D (default) or n-D mesh over the first n_devices devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axis_names) > 1:
        side = int(round(len(devices) ** (1 / len(axis_names))))
        arr = arr.reshape((side,) * len(axis_names))
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding for [B, ...] arrays."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a host batch with the batch dim sharded over the mesh."""
    return jax.device_put(batch, data_sharding(mesh, axis))
