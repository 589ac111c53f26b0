"""Triple-tap VQGAN encoder (NHWC, flax.linen).

Behavioral contract: /root/reference/CGIC/modules/vqvae/vqvae_blocks.py:195-374.
A single downsampling trunk (ch=128, ch_mult (1,2,2,4,4), 2 ResBlocks/level,
attention at 32x32) taps features at three depths:
  fine   = level num_res-3 output  (H/4,  ch*ch_mult[-3])
  medium = level num_res-2 output  (H/8,  ch*ch_mult[-2])
  coarse = trunk bottom            (H/16, ch*ch_mult[-1])
Each tap gets its own mid stack (ResBlock + Attn + ResBlock) + GroupNorm +
3x3 conv head down to z_channels.

Unlike the reference (which instantiates the router inside the encoder
forward, vqvae_blocks.py:354), this module is purely the neural net: it
returns the three z-heads and the caller (models/cgic.py) fuses them with
the router masks. That keeps the compiled encoder independent of the ratio
config.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.norm_conv import (chain_admissible, group_norm_conv,
                             norm_conv_worthwhile)
from .blocks import (AttnBlock, Downsample, GroupNorm32, ResnetBlock, swish,
                     _Conv3x3Params)


class _MidHead(nn.Module):
    """mid(ResBlock+Attn+ResBlock) -> GroupNorm -> swish -> conv to z_ch."""
    z_channels: int
    dropout: float
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, h, *, deterministic: bool = True):
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="block_1")(h, deterministic=deterministic)
        h = AttnBlock(dtype=self.dtype, name="attn_1")(h)
        h = ResnetBlock(dropout=self.dropout, dtype=self.dtype,
                        name="block_2")(h, deterministic=deterministic)
        if norm_conv_worthwhile(h.shape, self.z_channels):
            gs, gb = GroupNorm32(dtype=self.dtype, name="norm_out")(
                h, return_params=True)
            k, b = _Conv3x3Params(h.shape[-1], self.z_channels,
                                  name="conv_out")()
            return group_norm_conv(h.astype(self.dtype), gs, gb, k, b,
                                   act_swish=True)
        h = GroupNorm32(dtype=self.dtype, name="norm_out")(h)
        h = swish(h)
        return nn.Conv(self.z_channels, (3, 3), dtype=self.dtype,
                       name="conv_out")(h)


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (32,)
    resolution: int = 256
    z_channels: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    remat: bool = False    # rematerialize blocks under grad (memory <-> FLOPs)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """x: [B, H, W, 3] -> (z_fine [B,H/4,W/4,zc], z_medium [B,H/8,...],
        z_coarse [B,H/16,...])."""
        num_res = len(self.ch_mult)
        # `resolution` only seeds the attn-placement schedule; actual H can
        # differ (high-res tiles) — the reference behaves identically since
        # it tracks curr_res from the config resolution too.
        curr_res = self.resolution
        Res = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        Attn = nn.remat(AttnBlock) if self.remat else AttnBlock

        h = nn.Conv(self.ch, (3, 3), dtype=self.dtype, name="conv_in")(x)
        h_fine = h_medium = None
        # Stats-in-epilogue chaining across consecutive trunk blocks (see
        # models/decoder.py — same policy, GroupNorm form): each chained
        # block's epilogue moments feed the next block's norm stats.
        # Attention and Downsample invalidate the running moments.
        use_chain = not self.remat and deterministic
        mom = None
        for i_level in range(num_res):
            block_out = self.ch * self.ch_mult[i_level]
            attn_here = curr_res in self.attn_resolutions
            for i_block in range(self.num_res_blocks):
                blk_chain = (use_chain and not attn_here
                             and chain_admissible(h.shape, block_out))
                out_shape = h.shape[:3] + (block_out,)
                consumer = (blk_chain and i_block < self.num_res_blocks - 1
                            and chain_admissible(out_shape, block_out))
                if blk_chain:
                    out = Res(
                        out_channels=block_out, dropout=self.dropout,
                        dtype=self.dtype,
                        name=f"down_{i_level}_block_{i_block}")(
                            h, deterministic=deterministic,
                            mom_in=mom, emit_mom=consumer)
                    h, mom = out if consumer else (out, None)
                else:
                    h = Res(
                        out_channels=block_out, dropout=self.dropout,
                        dtype=self.dtype,
                        name=f"down_{i_level}_block_{i_block}")(
                            h, deterministic=deterministic)
                    mom = None
                if attn_here:
                    h = Attn(dtype=self.dtype,
                             name=f"down_{i_level}_attn_{i_block}")(h)
                    mom = None
            if i_level == num_res - 3:
                h_fine = h
            if i_level == num_res - 2:
                h_medium = h
            if i_level != num_res - 1:
                h = Downsample(dtype=self.dtype,
                               name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
                mom = None
        h_coarse = h

        z_fine = _MidHead(self.z_channels, self.dropout, self.dtype,
                          name="head_fine")(h_fine, deterministic=deterministic)
        z_medium = _MidHead(self.z_channels, self.dropout, self.dtype,
                            name="head_medium")(h_medium,
                                                deterministic=deterministic)
        z_coarse = _MidHead(self.z_channels, self.dropout, self.dtype,
                            name="head_coarse")(h_coarse,
                                                deterministic=deterministic)
        return z_fine, z_medium, z_coarse
