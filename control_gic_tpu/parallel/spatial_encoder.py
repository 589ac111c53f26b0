"""Spatially-sharded single-pass encoder: entropy maps, routing, the
triple-tap trunk and VQ computed with the image height sharded over the mesh.

Together with parallel/spatial_decoder.py this gives a complete fused
high-res codec path — one program per image regardless of resolution, no
tiles. Sharded-op inventory on top of the decoder's (halo conv, psum
GroupNorm, all-gather attention):

  - stride-2 downsample conv with the reference's (0,1) asymmetric pad:
    each shard needs exactly one boundary row from the next shard
    (H_shard stays even, so shard outputs stay aligned).
  - router thresholds: the per-shard entropy maps are all-gathered (tiny:
    one value per 16px/8px patch) and every shard computes the identical
    global sort + threshold, then keeps its mask rows.

Consumes the flax 'encoder' param subtree (models/encoder.py names).
Constraint: global H divisible by 64 * n_shards (entropy patches + 4 levels
of downsampling + coarse-mask alignment).
"""
from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.entropy import patch_entropy
from ..ops.quantize import vq_lookup
from .halo import halo_exchange
from .spatial_decoder import _conv, _swish


def _group_norm_plain(x, p, axis_name, eps=1e-6, num_groups=32):
    scale, bias = p["norm"]["scale"], p["norm"]["bias"]
    b, h, w, c = x.shape
    g = num_groups
    xg = x.reshape(b, h, w, g, c // g).astype(jnp.float32)
    s1 = jnp.sum(xg, axis=(1, 2, 4))
    s2 = jnp.sum(jnp.square(xg), axis=(1, 2, 4))
    n = h * w * (c // g)
    if axis_name is not None:     # None = single-shard specialization
        s1 = jax.lax.psum(s1, axis_name)
        s2 = jax.lax.psum(s2, axis_name)
        n = n * jax.lax.psum(1, axis_name)
    mean = s1 / n
    var = s2 / n - jnp.square(mean)
    inv = jax.lax.rsqrt(var + eps)
    xg = (xg - mean[:, None, None, :, None]) * inv[:, None, None, :, None]
    return xg.reshape(b, h, w, c) * scale + bias


def _conv3_sharded(x, p, axis_name):
    if axis_name is None or p["kernel"].shape[0] == 1:
        return _conv(x, p)
    xh = halo_exchange(x, p["kernel"].shape[0] // 2, axis_name)
    out = jax.lax.conv_general_dilated(
        xh, p["kernel"], (1, 1),
        ((0, 0), (p["kernel"].shape[1] // 2, p["kernel"].shape[1] // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + p["bias"]


def _downsample_sharded(x, p, axis_name):
    """Reference Downsample: pad (0,1,0,1) then 3x3 stride-2 VALID
    (vqvae_blocks.py:56-75). Sharded: take 2 rows from the next shard (the
    3-row window starting at our last even row reaches one row past the
    boundary; the (0,1) pad form needs rows [2i, 2i+2]), zero-padding at the
    global bottom/right."""
    if axis_name is None:         # local: the reference's (0,1) pad form
        out = jax.lax.conv_general_dilated(
            x, p["conv"]["kernel"], (2, 2), ((0, 1), (0, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out + p["conv"]["bias"]
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # rows from next shard: its first 2 rows
    nxt = jax.lax.ppermute(x[:, :2], axis_name,
                           [(i, (i - 1) % n) for i in range(n)])
    nxt = jnp.where(idx == n - 1, jnp.zeros_like(nxt), nxt)
    xh = jnp.concatenate([x, nxt], axis=1)       # [B, H_s + 2, W, C]
    out = jax.lax.conv_general_dilated(
        xh, p["conv"]["kernel"], (2, 2),
        ((0, 0), (0, 1)),                        # W pad (0,1); H provided
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # valid H outputs: floor((H_s + 2 - 3)/2) + 1 = H_s/2 (+1 if odd window
    # fits); keep exactly H_s/2 rows
    return out[:, :x.shape[1] // 2] + p["conv"]["bias"]


def _resnet_plain(x, p, axis_name):
    h = _group_norm_plain(x, p["norm1"]["group"], axis_name)
    h = _swish(h)
    h = _conv3_sharded(h, p["conv1"], axis_name)
    h = _group_norm_plain(h, p["norm2"]["group"], axis_name)
    h = _swish(h)
    h = _conv3_sharded(h, p["conv2"], axis_name)
    if "nin_shortcut" in p:
        x = _conv(x, p["nin_shortcut"])
    return x + h


def _attn_plain(x, p, axis_name):
    from ..ops.attention import attention

    b, h, w, c = x.shape
    hn = _group_norm_plain(x, p["norm"]["group"], axis_name)
    q = _conv(hn, p["q"]).reshape(b, h * w, c)
    k = _conv(hn, p["k"]).reshape(b, h * w, c)
    v = _conv(hn, p["v"]).reshape(b, h * w, c)
    # local queries vs all-gathered keys/values; the Tq != Tk dispatch
    # uses the Pallas flash kernel for long global KV on TPU.
    if axis_name is not None:
        k = jax.lax.all_gather(k, axis_name, axis=1, tiled=True)
        v = jax.lax.all_gather(v, axis_name, axis=1, tiled=True)
    out = attention(q, k, v).astype(x.dtype)
    return x + _conv(out.reshape(b, h, w, c), p["proj_out"])


def _head(x, p, axis_name):
    x = _resnet_plain(x, p["block_1"], axis_name)
    x = _attn_plain(x, p["attn_1"], axis_name)
    x = _resnet_plain(x, p["block_2"], axis_name)
    x = _group_norm_plain(x, p["norm_out"], axis_name)
    x = _swish(x)
    return _conv3_sharded(x, p["conv_out"], axis_name)


def _router_sharded(e16, e8, coarse_ratio, medium_ratio, axis_name):
    """Router with globally identical semantics: all-gather the (tiny)
    entropy maps so every shard runs the *exact* ops/router.py
    triple_grain_router on the full map (all 7 modes, identical thresholds
    and tie behavior), then each shard keeps its own mask rows."""
    from ..ops.router import triple_grain_router

    if axis_name is None:
        out = triple_grain_router(e16, e8, coarse_ratio, medium_ratio)
        return out.mask_coarse, out.mask_medium, out.mask_fine

    g16 = jax.lax.all_gather(e16, axis_name, axis=1, tiled=True)
    g8 = jax.lax.all_gather(e8, axis_name, axis=1, tiled=True)
    out = triple_grain_router(g16, g8, coarse_ratio, medium_ratio)

    idx = jax.lax.axis_index(axis_name)

    def local_rows(m, rows):
        return jax.lax.dynamic_slice_in_dim(m, idx * rows, rows, axis=1)

    return (local_rows(out.mask_coarse, e16.shape[1]),
            local_rows(out.mask_medium, e8.shape[1]),
            local_rows(out.mask_fine, 2 * e8.shape[1]))


def _encoder_shard(x, params, codebook, *, axis_name, ch, ch_mult,
                   num_res_blocks, attn_levels, coarse_ratio, medium_ratio):
    num_res = len(ch_mult)

    e8 = patch_entropy(x, 8)
    e16 = patch_entropy(x, 16)
    m_c, m_m, m_f = _router_sharded(e16, e8, coarse_ratio, medium_ratio,
                                    axis_name)

    h = _conv3_sharded(x, params["conv_in"], axis_name)
    h_fine = h_medium = None
    for i_level in range(num_res):
        for i_block in range(num_res_blocks):
            h = _resnet_plain(h, params[f"down_{i_level}_block_{i_block}"],
                              axis_name)
            if i_level in attn_levels:
                h = _attn_plain(h, params[f"down_{i_level}_attn_{i_block}"],
                                axis_name)
        if i_level == num_res - 3:
            h_fine = h
        if i_level == num_res - 2:
            h_medium = h
        if i_level != num_res - 1:
            h = _downsample_sharded(h, params[f"down_{i_level}_downsample"],
                                    axis_name)
    h_coarse = h

    z_f = _head(h_fine, params["head_fine"], axis_name)
    z_m = _head(h_medium, params["head_medium"], axis_name)
    z_c = _head(h_coarse, params["head_coarse"], axis_name)

    up = lambda t, s: jnp.repeat(jnp.repeat(t, s, 1), s, 2)
    gate = lambda m, s: up(m, s).astype(z_f.dtype)[..., None]
    fused = (up(z_c, 4) * gate(m_c, 4) + up(z_m, 2) * gate(m_m, 2)
             + z_f * m_f.astype(z_f.dtype)[..., None])
    return fused, m_c, m_m, m_f


def encode_spatial_sharded(mesh: Mesh, encoder_params, quant_conv_params,
                           codebook, x, coarse_ratio: float,
                           medium_ratio: float, *, axis: str = "data",
                           ch: int = 128,
                           ch_mult: Sequence[int] = (1, 2, 2, 4, 4),
                           num_res_blocks: int = 2,
                           attn_resolutions: Sequence[int] = (32,),
                           resolution: int = 256):
    """Encode [B, H, W, 3] with H sharded over `axis`. Returns
    (indices [B, H/4, W/4], masks) with the same sharding.

    NOTE: attention placement follows the config resolution schedule like
    the flax encoder (models/encoder.py).
    """
    n = mesh.shape[axis]
    h = x.shape[1]
    assert h % (64 * n) == 0, (h, n, "H must divide 64*n_shards")

    num_res = len(ch_mult)
    curr_res = resolution
    attn_levels = set()
    for i_level in range(num_res):
        if curr_res in attn_resolutions:
            attn_levels.add(i_level)
        if i_level != num_res - 1:
            curr_res //= 2

    fn = _encode_fn_cached(mesh, axis, ch, tuple(ch_mult), num_res_blocks,
                           frozenset(attn_levels), float(coarse_ratio),
                           float(medium_ratio))
    idx, m_c, m_m, m_f = fn(x, encoder_params, quant_conv_params, codebook)
    return idx, (m_c, m_m, m_f)


@functools.lru_cache(maxsize=16)
def _encode_fn_cached(mesh, axis, ch, ch_mult, num_res_blocks, attn_levels,
                      coarse_ratio, medium_ratio):
    """Jitted shard_map, cached per static config (see
    spatial_decoder._decode_fn_cached — rebuilding per call recompiled).
    At mesh axis size 1 the body runs as a plain jit with axis_name=None:
    identity collectives and the halo/ppermute plumbing compile out (the
    single-shard specialization; see _decode_fn_cached)."""
    single = mesh.shape[axis] == 1

    def body(x, enc_params, qc_params, cb):
        fused, m_c, m_m, m_f = _encoder_shard(
            x, enc_params, cb, axis_name=None if single else axis, ch=ch,
            ch_mult=ch_mult, num_res_blocks=num_res_blocks,
            attn_levels=attn_levels, coarse_ratio=coarse_ratio,
            medium_ratio=medium_ratio)
        z = _conv(fused, {"kernel": qc_params["kernel"],
                          "bias": qc_params["bias"]})
        idx = vq_lookup(z, cb)
        return idx, m_c, m_m, m_f

    if single:
        return jax.jit(body)

    sh = P(None, axis, None, None)
    shm = P(None, axis, None)
    return jax.jit(jax.shard_map(
        body, mesh=mesh,
        in_specs=(sh, P(), P(), P()),
        out_specs=(shm, shm, shm, shm),
        check_vma=False))  # see spatial_decoder: pallas flash in shard_map
