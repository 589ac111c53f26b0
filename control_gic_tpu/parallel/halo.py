"""Spatial (height-sharded) parallelism primitives: halo exchange + conv.

The reference handles high resolution only by independent tiles
(inference_high_resolution.py) — bit-exact tile parity needs no cross-device
traffic (parallel/tiling.py). These primitives are the building blocks for
the *fused* alternative: decoding one huge latent in a single pass with the
image height sharded across the mesh, which removes tile seams entirely.

  halo_exchange: each shard receives `halo` boundary rows from its
    neighbors over ICI (jax.lax.ppermute) — the distributed analog of the
    overlap a 3x3 conv needs.
  halo_conv2d:   SAME-padded conv computed exactly on H-sharded data:
    exchange halos, run the conv VALID over the extended rows on-device,
    keep the interior. Boundary shards zero-pad outward, so the result is
    bit-comparable to the unsharded SAME conv.

Use under jax.shard_map with a mesh axis sharding the H dimension.
GroupNorm/attention under H-sharding additionally need psum / all-gather of
their global statistics — see tests/test_halo.py for the conv equivalence
proof; the fully sharded decoder composes these per layer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Pad the sharded H dim (axis 1 of NHWC) with `halo` rows from the
    neighboring shards (zeros at the global boundary).

    x: [B, H_shard, W, C] inside shard_map. Returns
    [B, H_shard + 2*halo, W, C].
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)

    top_rows = x[:, :halo]          # my first rows -> previous device
    bot_rows = x[:, -halo:]         # my last rows  -> next device

    # receive from previous device: its bottom rows
    from_prev = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)])
    # receive from next device: its top rows
    from_next = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)])

    zeros = jnp.zeros_like(from_prev)
    from_prev = jnp.where(idx == 0, zeros, from_prev)
    from_next = jnp.where(idx == n - 1, zeros, from_next)
    return jnp.concatenate([from_prev, x, from_next], axis=1)


def halo_conv2d(x: jnp.ndarray, kernel: jnp.ndarray, bias: jnp.ndarray,
                axis_name: str) -> jnp.ndarray:
    """Exact SAME 3x3-style conv over H-sharded NHWC data.

    kernel: [kh, kw, Cin, Cout] (odd kh). Exchange kh//2 halo rows, conv
    VALID along H / SAME along W, drop nothing (the halo provides exactly
    the receptive field the interior needs).
    """
    kh = kernel.shape[0]
    halo = kh // 2
    xh = halo_exchange(x, halo, axis_name)
    out = jax.lax.conv_general_dilated(
        xh, kernel, window_strides=(1, 1),
        padding=((0, 0), (kernel.shape[1] // 2, kernel.shape[1] // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + bias


def halo_upsample2_conv3x3(x: jnp.ndarray, kernel: jnp.ndarray,
                           bias: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """H-sharded subpixel upsample+conv, exact vs the unsharded
    ops/resample.py::upsample2_conv3x3.

    The 4-phase 2x2 conv reads one row beyond each shard boundary (global
    form pads H by 1 on both sides), so a 1-row halo exchange followed by
    VALID-along-H conv reproduces y rows [s*H_l, s*H_l + H_l] exactly; the
    phase unshuffle then needs no index changes (phase_unshuffle docstring).

    x: [B, H_shard, W, C] inside shard_map; kernel [3,3,C,Co] -> [B, 2H_shard, 2W, Co].
    """
    from ..ops.resample import phase_conv_kernel, phase_unshuffle

    n, h, w, _ = x.shape
    co = kernel.shape[-1]
    k4 = phase_conv_kernel(kernel, x.dtype)
    xh = halo_exchange(x, 1, axis_name)             # [B, H_l + 2, W, C]
    y = jax.lax.conv_general_dilated(
        xh, k4, (1, 1), ((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [B, H_l + 1, W+1, 4Co]
    return phase_unshuffle(y, n, h, w, co, bias)


def sharded_conv2d_same(mesh: Mesh, x, kernel, bias, axis: str = "data"):
    """Top-level helper: run halo_conv2d under shard_map with x sharded on
    H. x: [B, H, W, C] global."""
    from functools import partial

    fn = jax.shard_map(
        partial(halo_conv2d, axis_name=axis),
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, None, None, None),
                  P(None)),
        out_specs=P(None, axis, None, None),
    )
    return fn(x, kernel, bias)
