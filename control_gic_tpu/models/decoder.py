"""Mask-aware VQGAN decoder with SpatialNorm conditioning (NHWC, flax.linen).

Behavioral contract: /root/reference/CGIC/modules/vqvae/decoder.py:215-398.
  - Three parallel 3x3 conv stems (z -> block_in) + three zq-conditioned mid
    stacks (ResBlock + Attn + ResBlock), all at the full latent resolution.
  - The coarse path is then avg-pooled x4 and the medium path x2
    (decoder.py:304-305, 366-367).
  - The upsampling trunk (num_res_blocks+1 ResBlocks per level, attention at
    the configured resolutions) re-injects each granularity at its matching
    level, gated multiplicatively by the grain masks (decoder.py:373-382):
      at H/8 level: h = h * up2(mask_c) + medium * mask_m
      at H/4 level: h = h * up4(mask_c) + h * up2(mask_m) + fine * mask_f
  - Every norm is SpatialNorm modulated by the quantized latent zq.
  - Final SpatialNorm -> swish -> 3x3 conv to out_ch; that conv's kernel is
    the "last layer" for the adaptive GAN weight (model.py:403-404).
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm_conv import (admissible, chain_admissible,
                             norm_conv_worthwhile, spatial_norm_conv,
                             spatial_norm_conv_mom, stats_from_moments)
from ..ops.resample import avg_pool, upsample_nearest
from .blocks import (AttnBlock, ResnetBlock, SpatialNorm, Upsample,
                     _Conv3x3Params)


class _Mid(nn.Module):
    dropout: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, h, zq, *, deterministic: bool = True):
        h = ResnetBlock(dropout=self.dropout, zq_cond=True, dtype=self.dtype,
                        name="block_1")(h, zq, deterministic=deterministic)
        h = AttnBlock(zq_cond=True, dtype=self.dtype, name="attn_1")(h, zq)
        h = ResnetBlock(dropout=self.dropout, zq_cond=True, dtype=self.dtype,
                        name="block_2")(h, zq, deterministic=deterministic)
        return h


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (32,)
    resolution: int = 256
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False    # rematerialize trunk blocks under grad
                           # (requires dropout == 0, the reference default)

    @nn.compact
    def __call__(self, z, zq, masks, *, deterministic: bool = True):
        """Decode the fused latent to RGB.

        Args:
          z: [B, Hl, Wl, z_channels] post-quant-conv latent (Hl = H/4).
          zq: [B, Hl, Wl, embed_dim] quantized latent for SpatialNorm.
          masks: (mask_coarse [B,Hl/4,Wl/4], mask_medium [B,Hl/2,Wl/2],
                  mask_fine [B,Hl,Wl]) int/float grids.
        Returns: [B, 4*Hl, 4*Wl, out_ch].
        """
        num_res = len(self.ch_mult)
        block_in = self.ch * self.ch_mult[-1]
        m_c, m_m, m_f = masks
        gate = lambda m: m.astype(self.dtype)[..., None]   # [B,h,w,1]

        h_coarse = nn.Conv(block_in, (3, 3), dtype=self.dtype,
                           name="conv_in_coarse")(z)
        h_medium = nn.Conv(block_in, (3, 3), dtype=self.dtype,
                           name="conv_in")(z)
        h_fine = nn.Conv(block_in, (3, 3), dtype=self.dtype,
                         name="conv_in_fine")(z)

        h_coarse = _Mid(self.dropout, self.dtype, name="mid_coarse")(
            h_coarse, zq, deterministic=deterministic)
        h_medium = _Mid(self.dropout, self.dtype, name="mid")(
            h_medium, zq, deterministic=deterministic)
        h_fine = _Mid(self.dropout, self.dtype, name="mid_fine")(
            h_fine, zq, deterministic=deterministic)

        h_coarse = avg_pool(h_coarse, 4)
        h_medium = avg_pool(h_medium, 2)

        # attention placement schedule mirrors the reference init: curr_res
        # starts at resolution / 2^(num_res-1) and doubles after each level
        # built in reversed order.
        curr_res = self.resolution // 2 ** (num_res - 1)
        attn_levels = set()
        for i_level in reversed(range(num_res)):
            if curr_res in self.attn_resolutions:
                attn_levels.add(i_level)
            if i_level != 0:
                curr_res *= 2

        Res = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        Attn = nn.remat(AttnBlock) if self.remat else AttnBlock

        # Stats-in-epilogue chaining (ops/norm_conv.spatial_norm_conv_mom):
        # consecutive ResnetBlocks at non-attention levels run as fused
        # norm+conv kernels that pass each block's output moments to the
        # next block's norm, skipping its full-activation stats read
        # (~1 RW per conv instead of ~2). Anything that edits h outside
        # the kernels (mask injection, attention, upsample) invalidates
        # the running moments. Inference-path optimization: disabled
        # under remat (moments would be a traced kwarg through nn.remat);
        # gradients of the kernels recompute via the XLA reference either
        # way. Hot path: reference decoder.py:340-398.
        use_chain = not self.remat and deterministic
        mom = None

        h = h_coarse
        for i_level in reversed(range(num_res)):
            if i_level == num_res - 2:
                h = h * upsample_nearest(gate(m_c), 2) + h_medium * gate(m_m)
                mom = None
            elif i_level == num_res - 3:
                h = (h * upsample_nearest(gate(m_c), 4)
                     + h * upsample_nearest(gate(m_m), 2)
                     + h_fine * gate(m_f))
                mom = None
            block_out = self.ch * self.ch_mult[i_level]
            attn_here = i_level in attn_levels
            for i_block in range(self.num_res_blocks + 1):
                blk_chain = (use_chain and not attn_here
                             and chain_admissible(h.shape, block_out))
                # does anything consume this block's epilogue moments?
                out_shape = h.shape[:3] + (block_out,)
                if i_block < self.num_res_blocks:
                    consumer = (use_chain and not attn_here and
                                chain_admissible(out_shape, block_out))
                else:   # level's last block: norm_out is the consumer
                    # (a single norm+conv, so only its own shape matters)
                    consumer = (i_level == 0 and blk_chain and
                                admissible(out_shape, self.out_ch))
                if blk_chain:
                    out = Res(
                        out_channels=block_out, dropout=self.dropout,
                        zq_cond=True, dtype=self.dtype,
                        name=f"up_{i_level}_block_{i_block}")(
                            h, zq, deterministic=deterministic,
                            mom_in=mom, emit_mom=consumer)
                    h, mom = out if consumer else (out, None)
                else:
                    h = Res(
                        out_channels=block_out, dropout=self.dropout,
                        zq_cond=True, dtype=self.dtype,
                        name=f"up_{i_level}_block_{i_block}")(
                            h, zq, deterministic=deterministic)
                    mom = None
                if attn_here:
                    h = Attn(zq_cond=True, dtype=self.dtype,
                             name=f"up_{i_level}_attn_{i_block}")(h, zq)
                    mom = None
            if i_level != 0:
                h = Upsample(dtype=self.dtype,
                             name=f"up_{i_level}_upsample")(h)
                mom = None

        if mom is not None and admissible(h.shape, self.out_ch):
            # final norm consumes the last trunk block's moments
            zq_r, *np_out = SpatialNorm(dtype=self.dtype, name="norm_out")(
                h, zq, return_params=True)
            k, b = _Conv3x3Params(h.shape[-1], self.out_ch,
                                  name="conv_out")()
            return spatial_norm_conv_mom(
                h.astype(self.dtype), zq_r, *np_out, k, b,
                stats=stats_from_moments(mom, h.shape[1] * h.shape[2]),
                act_swish=True, emit_mom=False, use_fused=True)
        if norm_conv_worthwhile(h.shape, self.out_ch):
            zq_r, *np_out = SpatialNorm(dtype=self.dtype, name="norm_out")(
                h, zq, return_params=True)
            k, b = _Conv3x3Params(h.shape[-1], self.out_ch,
                                  name="conv_out")()
            return spatial_norm_conv(h.astype(self.dtype), zq_r, *np_out,
                                     k, b, act_swish=True)
        h = SpatialNorm(dtype=self.dtype, name="norm_out")(h, zq, act="swish")
        return nn.Conv(self.out_ch, (3, 3), dtype=self.dtype,
                       name="conv_out")(h)
