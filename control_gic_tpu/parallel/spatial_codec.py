"""Fully sharded single-pass codec: sharded encode -> real bitstreams ->
sharded decode, for images too large for one device's memory/attention.

This is the fused alternative to tile-based high-res compression
(parallel/tiling.py): ONE routing decision over the whole image (the
reference applies its ratios per 768px tile, so tile-local entropy ordering
distorts the global budget), no tile seams, height sharded across the mesh
the whole way.

The entropy-coded streams are identical in format to the single-device
path; the receiver can decode them with either path.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..codec import CGICCodec, EncodedImage
from ..ops.quantize import codebook_gather
from .spatial_decoder import decode_spatial_sharded
from .spatial_encoder import encode_spatial_sharded


def compress_spatial(codec: CGICCodec, image: np.ndarray,
                     coarse_ratio: float, medium_ratio: float,
                     mesh: Mesh, axis: str = "data"
                     ) -> Tuple[np.ndarray, float, EncodedImage]:
    """Single-pass sharded compress of [H, W, 3]. Arbitrary sizes are
    center zero-padded to H % (64 * mesh) == 0, W % 16 == 0 (the sharded
    encoder's alignment), and the reconstruction unpadded; bpp is over the
    original pixels (the padded rows' bits are part of the stream, like
    the reference's padded tiles). Returns (reconstruction, bpp, bundle)."""
    from .tiling import compute_padding

    n = mesh.shape[axis]
    h0, w0, _ = image.shape
    (pl, pr, _, _), _ = compute_padding(h0, w0, min_div=16)
    (_, _, pt, pb), _ = compute_padding(h0, w0, min_div=64 * n)
    if pl or pr or pt or pb:
        image = np.pad(image, ((pt, pb), (pl, pr), (0, 0)))
    h, w, _ = image.shape
    cfg = codec.model.config
    params = codec.variables["params"]

    x = jnp.asarray(image, jnp.float32)[None]
    idx, masks = encode_spatial_sharded(
        mesh, params["encoder"], params["quant_conv"], params["codebook"],
        x, coarse_ratio, medium_ratio, axis=axis, ch=cfg.ch,
        ch_mult=cfg.ch_mult, num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=cfg.attn_resolutions, resolution=cfg.resolution)

    # host entropy coding (identical format to the unsharded path)
    from ..ops.router import triple_grain_router  # for mode semantics
    mode = triple_grain_router(jnp.zeros((1, 4, 4)), jnp.zeros((1, 8, 8)),
                               coarse_ratio, medium_ratio).mode
    encoded = codec.streams_from_arrays(
        np.asarray(idx[0]), np.asarray(masks[0][0]),
        np.asarray(masks[1][0]), np.asarray(masks[2][0]), mode, (h, w))

    rec = decode_spatial(codec, encoded, mesh, axis=axis)
    if pl or pr or pt or pb:
        rec = rec[pt:h - pb if pb else h, pl:w - pr if pr else w]
    bpp = encoded.num_bytes * 8 / (h0 * w0)
    return rec, bpp, encoded


def decode_spatial(codec: CGICCodec, encoded: EncodedImage, mesh: Mesh,
                   axis: str = "data") -> np.ndarray:
    """Receiver-side sharded decode of a bundle."""
    cfg = codec.model.config
    params = codec.variables["params"]
    ind, masks = codec._rebuild(encoded)

    zq = codebook_gather(jnp.asarray(ind, jnp.int32)[None],
                         jnp.asarray(params["codebook"]))
    # post_quant_conv is 1x1 -> local everywhere, apply before sharding
    z = jax.lax.conv_general_dilated(
        zq.astype(jnp.float32),
        jnp.asarray(params["post_quant_conv"]["kernel"]), (1, 1),
        ((0, 0), (0, 0)), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    z = z + jnp.asarray(params["post_quant_conv"]["bias"])

    rec = decode_spatial_sharded(
        mesh, params["decoder"], z, zq,
        tuple(jnp.asarray(m, jnp.int32)[None] for m in masks),
        axis=axis, ch=cfg.ch, ch_mult=cfg.ch_mult,
        num_res_blocks=cfg.num_res_blocks,
        attn_resolutions=cfg.attn_resolutions, resolution=cfg.resolution)
    return np.asarray(rec[0])
