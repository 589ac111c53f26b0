"""CGIC codec core: encoder + router fusion + VQ + mask-aware decoder.

Behavioral contract: /root/reference/CGIC/models/model.py:22-137 —
  encode:  entropy maps (p8, p16) -> encoder taps -> router masks -> fused
           64x64 latent (up4(coarse)*m_c + up2(medium)*m_m + fine*m_f,
           vqvae_blocks.py:361-366) -> 1x1 quant_conv -> VQ.
  decode:  1x1 post_quant_conv -> mask-aware decoder (conditioned on the
           quantized latent zq).

The module is a pure function of (params, image, static ratios); the
entropy estimator and router are parameter-free ops. The compression mode
and grain ratios are static at trace time (they are user config, not data),
so each (ratios, input-shape) pair compiles to one specialized program —
the TPU analog of the reference's Python mode dispatch.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.entropy import patch_entropy
from ..ops.quantize import VQResult, codebook_gather, vq_quantize
from ..ops.resample import upsample_nearest
from ..ops.router import RouterOutput, grain_indices_from_masks, triple_grain_router
from .decoder import Decoder
from .encoder import Encoder


@dataclasses.dataclass(frozen=True)
class CGICConfig:
    n_embed: int = 1024
    embed_dim: int = 4
    z_channels: int = 4
    ch: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32,)
    resolution: int = 256
    in_channels: int = 3
    out_ch: int = 3
    dropout: float = 0.0
    beta: float = 0.25
    entropy_patch_sizes: Tuple[int, int] = (8, 16)
    dtype: str = "float32"
    remat: bool = False   # rematerialize blocks under grad (needs dropout 0)

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class EncodeOutput(NamedTuple):
    quant: jnp.ndarray          # [B, Hl, Wl, embed_dim] straight-through zq
    emb_loss: jnp.ndarray       # scalar VQ commitment loss
    indices: jnp.ndarray        # [B, Hl, Wl] int32 codebook indices
    router: RouterOutput        # grain masks + static mode
    grain_indices: jnp.ndarray  # [B, Hl, Wl] partition map (0/1/2)
    counts: jnp.ndarray         # [n_embed] codebook usage of this batch


class CGIC(nn.Module):
    """Granularity-adaptive VQGAN codec."""
    config: CGICConfig = CGICConfig()

    def setup(self):
        c = self.config
        dt = c.compute_dtype
        self.encoder = Encoder(
            ch=c.ch, ch_mult=c.ch_mult, num_res_blocks=c.num_res_blocks,
            attn_resolutions=c.attn_resolutions, resolution=c.resolution,
            z_channels=c.z_channels, dropout=c.dropout, dtype=dt,
            remat=c.remat)
        self.decoder = Decoder(
            ch=c.ch, out_ch=c.out_ch, ch_mult=c.ch_mult,
            num_res_blocks=c.num_res_blocks,
            attn_resolutions=c.attn_resolutions, resolution=c.resolution,
            dropout=c.dropout, dtype=dt, remat=c.remat)
        self.quant_conv = nn.Conv(c.embed_dim, (1, 1), dtype=dt,
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(c.z_channels, (1, 1), dtype=dt,
                                       name="post_quant_conv")
        # Codebook: uniform(-1/n, 1/n) init as in quantize.py:25-26.
        n, d = c.n_embed, c.embed_dim

        def _codebook_init(key):
            import jax
            return jax.random.uniform(key, (n, d), jnp.float32,
                                      minval=-1.0 / n, maxval=1.0 / n)

        self.codebook = self.param("codebook", _codebook_init)

    def route(self, x: jnp.ndarray, coarse_ratio: float, medium_ratio: float,
              per_sample: bool = False) -> RouterOutput:
        """Entropy maps + router; x is NHWC in the training range [-1, 1]."""
        p_m, p_c = self.config.entropy_patch_sizes   # (8, 16)
        e8 = patch_entropy(x, p_m)
        e16 = patch_entropy(x, p_c)
        return triple_grain_router(e16, e8, coarse_ratio, medium_ratio,
                                   per_sample=per_sample)

    def encode(self, x: jnp.ndarray, coarse_ratio: float, medium_ratio: float,
               *, per_sample: bool = False,
               deterministic: bool = True) -> EncodeOutput:
        router = self.route(x, coarse_ratio, medium_ratio,
                            per_sample=per_sample)
        z_fine, z_medium, z_coarse = self.encoder(
            x.astype(self.config.compute_dtype), deterministic=deterministic)

        dt = self.config.compute_dtype
        m_c = router.mask_coarse.astype(dt)[..., None]
        m_m = router.mask_medium.astype(dt)[..., None]
        m_f = router.mask_fine.astype(dt)[..., None]
        h = (upsample_nearest(z_coarse, 4) * upsample_nearest(m_c, 4)
             + upsample_nearest(z_medium, 2) * upsample_nearest(m_m, 2)
             + z_fine * m_f)

        h = self.quant_conv(h)
        vq: VQResult = vq_quantize(h.astype(jnp.float32),
                                   self.codebook.astype(jnp.float32),
                                   beta=self.config.beta)
        return EncodeOutput(
            quant=vq.z_q, emb_loss=vq.loss, indices=vq.indices,
            router=router, grain_indices=grain_indices_from_masks(router),
            counts=vq.counts)

    def decode(self, quant: jnp.ndarray, masks, *,
               deterministic: bool = True) -> jnp.ndarray:
        dt = self.config.compute_dtype
        quant = quant.astype(dt)
        z = self.post_quant_conv(quant)
        return self.decoder(z, quant, masks, deterministic=deterministic)

    def decode_indices(self, indices: jnp.ndarray, masks, *,
                       deterministic: bool = True) -> jnp.ndarray:
        """Receiver-side decode from an index grid (model.py:391-399)."""
        quant = codebook_gather(indices, self.codebook)
        return self.decode(quant, masks, deterministic=deterministic)

    def __call__(self, x: jnp.ndarray, coarse_ratio: float = 0.1,
                 medium_ratio: float = 0.4, *, deterministic: bool = True):
        enc = self.encode(x, coarse_ratio, medium_ratio,
                          deterministic=deterministic)
        rec = self.decode(enc.quant, enc.router.masks,
                          deterministic=deterministic)
        return rec, enc
