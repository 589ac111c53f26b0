"""Spatially-sharded single-pass decoder: one huge latent decoded across the
mesh with the image height sharded, no tiles, no seams.

The reference can only reach high resolutions by splitting into independent
768px tiles (inference_high_resolution.py) because its 4096-token-per-64px²
latent attention is quadratic. parallel/tiling.py reproduces that exactly.
This module is the fused alternative the TPU makes possible: the *entire*
latent is decoded in one program, H-sharded over the mesh, with

  - 3x3 convs     -> halo exchange of boundary rows (lax.ppermute over ICI)
  - GroupNorm /   -> local partial sums + lax.psum for the global spatial
    SpatialNorm      statistics (GroupNorm normalizes over (H, W, C/g))
  - attention     -> queries stay local, keys/values all-gathered
                     (T x C is small relative to the T_local x T score
                      matrix, so the gather is cheap vs the compute)
  - up/avg-pool   -> purely local (shards stay aligned because every
    / nearest        spatial factor is a power of two and shards divide
    resizes          evenly)

It consumes the *same* parameter pytree as models/decoder.py (paths are the
flax module names), so any trained/ported checkpoint works unchanged. The
unsharded decoder remains the reference implementation; equivalence is
tested in tests/test_spatial_decoder.py.

Constraints: global latent H divisible by 4 * n_shards (mask alignment);
W, channels unrestricted.

Numerics note (round 5): models/decoder.py additionally runs the chained
stats-in-epilogue Pallas kernels on TPU for >=9M-elem activations
(ops/norm_conv.chain_admissible); this sharded body stays pure XLA by
design — the chain's halo-row blocking does not compose with the H-shard
halo exchange yet. The drift is bounded: the chained kernels are pinned
bit-identical (uint8) / <=bf16-rounding against the XLA composition by
on-chip A/B and tests, and the CPU equivalence tests (where the chain is
off) pin this file against the flax decoder exactly.
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.resample import subpixel_enabled
from .halo import halo_conv2d, halo_upsample2_conv3x3


# --------------------------------------------------------------------- ops

def _conv(x, p, *, same=True):
    kh, kw = p["kernel"].shape[:2]
    pad = ((kh // 2, kh // 2), (kw // 2, kw // 2)) if same else ((0, 0), (0, 0))
    out = jax.lax.conv_general_dilated(
        x, p["kernel"], (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def _conv_sharded(x, p, axis_name):
    """3x3 (or any odd-kh) conv with halo rows; 1x1 stays local.
    axis_name=None (single-shard specialization) is a plain local conv."""
    if axis_name is None or p["kernel"].shape[0] == 1:
        return _conv(x, p)
    return halo_conv2d(x, p["kernel"], p["bias"], axis_name)


def _group_norm(x, scale, bias, axis_name, num_groups=32, eps=1e-6):
    """GroupNorm with spatial stats psum-reduced over the sharded H axis
    (identity psums skipped when axis_name is None)."""
    b, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(b, h, w, g, c // g).astype(jnp.float32)
    # local partial sums over (H_local, W, C/g)
    s1 = jnp.sum(xg, axis=(1, 2, 4))                     # [B, g]
    s2 = jnp.sum(jnp.square(xg), axis=(1, 2, 4))
    n = h * w * (c // g)
    if axis_name is not None:
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    xg = (xg - mean[:, None, None, :, None]) * inv[:, None, None, :, None]
    out = xg.reshape(b, h, w, c)
    return out * scale + bias


def _nearest_local(x, out_h_local, out_w):
    """Nearest resize that is exact under even H-sharding: every global
    scale here is a power of two, so the floor rule maps each shard's
    output rows onto its own input rows."""
    in_h, in_w = x.shape[1], x.shape[2]
    idx_h = (jnp.arange(out_h_local) * in_h) // out_h_local
    idx_w = (jnp.arange(out_w) * in_w) // out_w
    return jnp.take(jnp.take(x, idx_h, axis=1), idx_w, axis=2)


def _spatial_norm(f, zq, p, axis_name):
    zq = _nearest_local(zq, f.shape[1], f.shape[2])
    normed = _group_norm(f, p["norm_layer"]["scale"], p["norm_layer"]["bias"],
                         axis_name)
    y = _conv(zq, p["conv_y"])
    b = _conv(zq, p["conv_b"])
    return normed * y + b


def _swish(x):
    return x * jax.nn.sigmoid(x)


def _resnet_block(x, zq, p, axis_name):
    h = _spatial_norm(x, zq, p["norm1"]["spatial"], axis_name)
    h = _swish(h)
    h = _conv_sharded(h, p["conv1"], axis_name)
    h = _spatial_norm(h, zq, p["norm2"]["spatial"], axis_name)
    h = _swish(h)
    h = _conv_sharded(h, p["conv2"], axis_name)
    if "nin_shortcut" in p:
        x = _conv(x, p["nin_shortcut"])
    return x + h


def _attn_block(x, zq, p, axis_name):
    from ..ops.attention import attention

    b, h, w, c = x.shape
    hn = _spatial_norm(x, zq, p["norm"]["spatial"], axis_name)
    q = _conv(hn, p["q"]).reshape(b, h * w, c)
    k = _conv(hn, p["k"]).reshape(b, h * w, c)
    v = _conv(hn, p["v"]).reshape(b, h * w, c)
    # gather keys/values from all shards; queries stay local. The Tq != Tk
    # dispatch sends long global KV to the Pallas flash kernel on TPU
    # (avoids the [T_local, T_global] score matrix); einsum elsewhere.
    if axis_name is not None:
        k = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)  # [B,T,C]
        v = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    out = attention(q, k, v).astype(x.dtype)
    out = _conv(out.reshape(b, h, w, c), p["proj_out"])
    return x + out


def _avg_pool_local(x, k):
    b, h, w, c = x.shape
    return x.reshape(b, h // k, k, w // k, k, c).mean(axis=(2, 4))


def _up2_local(x):
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


def _mid(x, zq, p, axis_name):
    x = _resnet_block(x, zq, p["block_1"], axis_name)
    x = _attn_block(x, zq, p["attn_1"], axis_name)
    x = _resnet_block(x, zq, p["block_2"], axis_name)
    return x


# ----------------------------------------------------------------- decoder

def _decoder_shard(z, zq, m_c, m_m, m_f, params, *, axis_name: str,
                   ch: int, ch_mult: Sequence[int], num_res_blocks: int,
                   attn_levels: frozenset):
    """The per-shard decoder body (runs inside shard_map). Mirrors
    models/decoder.py line for line with sharded ops."""
    num_res = len(ch_mult)
    gate = lambda m: m.astype(z.dtype)[..., None]

    h_coarse = _conv_sharded(z, params["conv_in_coarse"], axis_name)
    h_medium = _conv_sharded(z, params["conv_in"], axis_name)
    h_fine = _conv_sharded(z, params["conv_in_fine"], axis_name)

    h_coarse = _mid(h_coarse, zq, params["mid_coarse"], axis_name)
    h_medium = _mid(h_medium, zq, params["mid"], axis_name)
    h_fine = _mid(h_fine, zq, params["mid_fine"], axis_name)

    h_coarse = _avg_pool_local(h_coarse, 4)
    h_medium = _avg_pool_local(h_medium, 2)

    h = h_coarse
    for i_level in reversed(range(num_res)):
        if i_level == num_res - 2:
            h = h * _up2_local(gate(m_c)) + h_medium * gate(m_m)
        elif i_level == num_res - 3:
            h = (h * _up2_local(_up2_local(gate(m_c)))
                 + h * _up2_local(gate(m_m))
                 + h_fine * gate(m_f))
        for i_block in range(num_res_blocks + 1):
            h = _resnet_block(h, zq, params[f"up_{i_level}_block_{i_block}"],
                              axis_name)
            if i_level in attn_levels:
                h = _attn_block(h, zq, params[f"up_{i_level}_attn_{i_block}"],
                                axis_name)
        if i_level != 0:
            # same path selection as models/blocks.py::Upsample (the two
            # must stay numerically in lockstep — CLAUDE.md invariant)
            p_up = params[f"up_{i_level}_upsample"]["conv"]
            if subpixel_enabled():
                if axis_name is None:
                    from ..ops.resample import upsample2_conv3x3
                    h = upsample2_conv3x3(h, p_up["kernel"], p_up["bias"])
                else:
                    h = halo_upsample2_conv3x3(h, p_up["kernel"],
                                               p_up["bias"], axis_name)
            else:
                h = _up2_local(h)
                h = _conv_sharded(h, p_up, axis_name)

    h = _spatial_norm(h, zq, params["norm_out"], axis_name)
    h = _swish(h)
    return _conv_sharded(h, params["conv_out"], axis_name)


def decode_spatial_sharded(mesh: Mesh, decoder_params, z, zq, masks, *,
                           axis: str = "data", ch: int = 128,
                           ch_mult: Sequence[int] = (1, 2, 2, 4, 4),
                           num_res_blocks: int = 2,
                           attn_resolutions: Sequence[int] = (32,),
                           resolution: int = 256):
    """Decode [B, Hl, Wl, zc] with Hl sharded over `axis` of the mesh.

    Args mirror models/decoder.py; decoder_params is the flax 'decoder'
    subtree. Returns the full [B, 4*Hl, 4*Wl, out_ch] image (sharded on H).
    """
    n = mesh.shape[axis]
    m_c, m_m, m_f = masks
    hl = z.shape[1]
    assert hl % (4 * n) == 0, (hl, n, "latent H must divide 4*n_shards")

    num_res = len(ch_mult)
    curr_res = resolution // 2 ** (num_res - 1)
    attn_levels = set()
    for i_level in reversed(range(num_res)):
        if curr_res in attn_resolutions:
            attn_levels.add(i_level)
        if i_level != 0:
            curr_res *= 2

    fn = _decode_fn_cached(mesh, axis, ch, tuple(ch_mult), num_res_blocks,
                           frozenset(attn_levels))
    return fn(z, zq, m_c, m_m, m_f, decoder_params)


@functools.lru_cache(maxsize=16)
def _decode_fn_cached(mesh, axis, ch, ch_mult, num_res_blocks, attn_levels):
    """Jitted shard_map, cached per static config: rebuilding the closure
    each call forced a FULL retrace+recompile per invocation (the round-4
    on-TPU smoke measured a 748 s 'warm' call before this cache).

    Single-shard specialization: at mesh axis size 1 the collective/halo
    structure is pure overhead (identity psums, all-gathers, ppermute halo
    plumbing — the round-4 verdict's measured 1.3-1.8x single-chip
    penalty), so the body runs as a plain jit with axis_name=None and
    every collective compiled out; the n>1 program is unchanged."""
    if mesh.shape[axis] == 1:
        body = functools.partial(
            _decoder_shard, axis_name=None, ch=ch, ch_mult=ch_mult,
            num_res_blocks=num_res_blocks, attn_levels=attn_levels)
        return jax.jit(body)
    body = functools.partial(
        _decoder_shard, axis_name=axis, ch=ch, ch_mult=ch_mult,
        num_res_blocks=num_res_blocks, attn_levels=attn_levels)

    sh = P(None, axis, None, None)     # NHWC, H sharded
    shm = P(None, axis, None)          # mask [B, h, w]
    # check_vma=False: the flash-attention pallas_call inside the shard
    # body cannot declare per-axis varying-ness (jax requires `vma` on its
    # ShapeDtypeStruct outputs under check_vma) — hit on real TPU only,
    # where flash engages; the einsum fallback on CPU never trips it.
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(sh, sh, shm, shm, shm, P()),
        out_specs=sh, check_vma=False))
