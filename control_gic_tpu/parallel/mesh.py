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


def _balanced_shape(n: int, k: int) -> tuple:
    """Factor n into k axis sizes, as even as possible (largest first).

    Greedy: for each remaining axis, pick the largest divisor of the
    remaining device count that is <= ceil(remaining ** (1/axes_left)),
    falling back to 1. Product always equals n (8 devices, 2 axes -> (4, 2);
    6, 2 -> (3, 2); 7, 2 -> (7, 1))."""
    factors = []
    rem = n
    for axes_left in range(k, 0, -1):
        if axes_left == 1:
            factors.append(rem)
            break
        target = int(np.ceil(rem ** (1 / axes_left)))
        d = next(c for c in range(target, 0, -1) if rem % c == 0)
        factors.append(d)
        rem //= d
    return tuple(sorted(factors, reverse=True))


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
    """1-D (default) or n-D mesh over the first n_devices devices.

    n-D meshes factor the device count into as-even-as-possible axis sizes
    (8 devices / 2 axes -> 4x2), so non-square counts work."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    arr = np.asarray(devices)
    if len(axis_names) > 1:
        arr = arr.reshape(_balanced_shape(len(devices), len(axis_names)))
    return Mesh(arr, axis_names)


def data_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Batch-dim sharding for [B, ...] arrays."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Device-put a host batch with the batch dim sharded over the mesh."""
    return jax.device_put(batch, data_sharding(mesh, axis))
