"""VQGAN building blocks in flax.linen, NHWC layout, TPU-first.

Behavioral contracts (cited against /root/reference for parity checking):
  - ResnetBlock: GroupNorm(32, eps 1e-6) -> swish -> 3x3 conv, twice, with a
    1x1 nin-shortcut on channel change (vqvae_blocks.py:78-137).
  - AttnBlock: GroupNorm -> 1x1 q/k/v -> single-head softmax attention at
    scale c^-0.5 -> 1x1 proj, residual (vqvae_blocks.py:140-192). The
    attention inner loop dispatches to a Pallas flash kernel for long token
    counts (ops/attention.py).
  - SpatialNorm (MoVQ): GroupNorm(f) * conv_y(zq) + conv_b(zq) with zq
    nearest-resized to f's spatial size (decoder.py:34-53).
  - Downsample: (0,1,0,1) asymmetric zero-pad then 3x3 stride-2 VALID conv
    (vqvae_blocks.py:56-75). Upsample: x2 nearest then 3x3 conv
    (vqvae_blocks.py:38-53).

Design notes (TPU): everything is NHWC so convs hit the MXU with no layout
transposes; `dtype` selects the activation/compute dtype (bf16 for speed,
f32 for parity tests) while parameters stay f32.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import attention
from ..ops.fused_norm import spatial_norm
from ..ops.norm_conv import (chain_admissible, group_norm_conv,
                             group_norm_conv_mom, norm_conv_worthwhile,
                             spatial_norm_conv, spatial_norm_conv_mom,
                             stats_from_moments)
from ..ops.resample import (nearest_resize, subpixel_enabled,
                            upsample2_conv3x3, upsample_nearest)


def swish(x: jnp.ndarray) -> jnp.ndarray:
    return x * nn.sigmoid(x)


class GroupNorm32(nn.Module):
    """GroupNorm(num_groups=32, eps=1e-6, affine) computed in f32.

    `return_params=True` creates the identical param tree (norm/{scale,
    bias}) but returns (scale, bias) instead of applying, so a caller can
    fuse the norm into a following conv (ops/norm_conv.group_norm_conv)."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, return_params: bool = False):
        if return_params:
            return _GNParams(x.shape[-1], name="norm")()
        h = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="norm")(
                             x.astype(jnp.float32))
        return h.astype(self.dtype)


class _GNParams(nn.Module):
    """Param holder matching nn.GroupNorm's tree ({scale, bias})."""
    features: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.features,)),
                self.param("bias", nn.initializers.zeros, (self.features,)))


class _Conv1x1Params(nn.Module):
    """Param holder matching nn.Conv(features, (1,1))'s tree."""
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (1, 1, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _Conv3x3Params(nn.Module):
    """Param holder matching nn.Conv(features, (3,3))'s tree exactly
    (same names, shapes, initializers -> same init values and checkpoint
    compatibility), for ops that consume the raw kernel/bias."""
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class SpatialNorm(nn.Module):
    """MoVQ spatially-modulated GroupNorm: norm(f) * conv_y(zq) + conv_b(zq).

    `act="swish"` fuses the following activation. On TPU the whole
    apply (normalize + on-the-fly 1x1 convs + modulation + swish) runs as
    one Pallas pass (ops/fused_norm.py); elsewhere the jnp reference
    formula is used. Param tree is unchanged (norm_layer/conv_y/conv_b),
    so checkpoints and the torch port are unaffected.

    `return_params=True` creates the identical param tree but returns
    (zq_r, gs, gb, wy, by, wb, bb) instead of applying, so a caller can
    fuse the norm into a following conv (ops/norm_conv.py).
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, zq, act: Optional[str] = None,
                 return_params: bool = False):
        zq_r = nearest_resize(zq, f.shape[1], f.shape[2])
        c = f.shape[-1]
        z = zq.shape[-1]
        gs, gb = _GNParams(c, name="norm_layer")()
        wy, by = _Conv1x1Params(z, c, name="conv_y")()
        wb, bb = _Conv1x1Params(z, c, name="conv_b")()
        if return_params:
            return zq_r.astype(self.dtype), gs, gb, wy[0, 0], by, wb[0, 0], bb
        out = spatial_norm(f.astype(self.dtype), zq_r, gs, gb,
                           wy[0, 0], by, wb[0, 0], bb,
                           act_swish=(act == "swish"))
        return out.astype(self.dtype)


class _Norm(nn.Module):
    """Plain GroupNorm, or SpatialNorm when a zq conditioning is passed.

    `act="swish"` applies the activation (fused into the SpatialNorm
    kernel on TPU)."""
    spatial: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None, act: Optional[str] = None,
                 return_params: bool = False):
        if self.spatial:
            assert zq is not None
            return SpatialNorm(dtype=self.dtype, name="spatial")(
                x, zq, act=act, return_params=return_params)
        if return_params:
            return GroupNorm32(dtype=self.dtype, name="group")(
                x, return_params=True)
        h = GroupNorm32(dtype=self.dtype, name="group")(x)
        return swish(h) if act == "swish" else h


class ResnetBlock(nn.Module):
    out_channels: Optional[int] = None
    dropout: float = 0.0
    zq_cond: bool = False          # decoder-style SpatialNorm conditioning
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, zq=None, *, deterministic: bool = True,
                 mom_in=None, emit_mom: bool = False):
        """mom_in / emit_mom thread the stats-in-epilogue chain through
        decoder trunks (ops/norm_conv.spatial_norm_conv_mom): mom_in is
        the [B, 2, C] per-channel moments of x emitted by the previous
        chained block (norm1's stats pass is then skipped); emit_mom=True
        returns (out, moments-of-out) for the next consumer. The caller
        (models/decoder.py) decides chain membership; identical math and
        param tree either way."""
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch

        chain = ((self.dropout == 0.0 or deterministic)
                 and (emit_mom or mom_in is not None)
                 and chain_admissible(x.shape, out_ch))
        if chain and (zq is not None or not self.zq_cond):
            # one wiring for both norm forms: SpatialNorm (zq_cond) vs
            # plain GroupNorm — only the param unpack and the fused op
            # differ (ops/norm_conv collapses the same split internally)
            xd = x.astype(self.dtype)

            def norm_p(name, ref):
                p = _Norm(self.zq_cond, self.dtype, name=name)(
                    ref, zq, return_params=True)
                return tuple(p[1:]) if self.zq_cond else p

            if self.zq_cond:
                zq_r = nearest_resize(zq, x.shape[1],
                                      x.shape[2]).astype(self.dtype)
                conv_mom = (lambda h, pn, k, b, **kw: spatial_norm_conv_mom(
                    h, zq_r, *pn, k, b, use_fused=True, **kw))
            else:
                conv_mom = (lambda h, pn, k, b, **kw: group_norm_conv_mom(
                    h, *pn, k, b, use_fused=True, **kw))

            k1, b1 = _Conv3x3Params(in_ch, out_ch, name="conv1")()
            stats1 = (stats_from_moments(mom_in, x.shape[1] * x.shape[2])
                      if mom_in is not None else None)
            h, mom1 = conv_mom(xd, norm_p("norm1", x), k1, b1,
                               stats=stats1, emit_mom=True)
            k2, b2 = _Conv3x3Params(out_ch, out_ch, name="conv2")()
            res = (nn.Conv(out_ch, (1, 1), dtype=self.dtype,
                           name="nin_shortcut")(x)
                   if in_ch != out_ch else xd)
            stats2 = stats_from_moments(mom1, h.shape[1] * h.shape[2])
            return conv_mom(h, norm_p("norm2", h), k2, b2, res=res,
                            stats=stats2, emit_mom=emit_mom)
        assert mom_in is None and not emit_mom, \
            "mom_in/emit_mom passed to a block that cannot chain " \
            "(caller must check chain_admissible first)"

        # Fused norm+swish+conv Pallas paths (TPU): same param tree, one
        # kernel per norm->conv pair instead of ~4 HBM round trips.
        # SpatialNorm+conv for decoder blocks (zq conditioning), plain
        # GroupNorm+conv for encoder blocks.
        fusible = ((self.dropout == 0.0 or deterministic)
                   and norm_conv_worthwhile(x.shape, out_ch)
                   and norm_conv_worthwhile(x.shape[:3] + (out_ch,), out_ch))
        fuse = self.zq_cond and zq is not None and fusible
        fuse_plain = (not self.zq_cond) and fusible
        if fuse:
            xd = x.astype(self.dtype)
            zq_r, *np1 = _Norm(True, self.dtype, name="norm1")(
                x, zq, return_params=True)
            k1, b1 = _Conv3x3Params(in_ch, out_ch, name="conv1")()
            h = spatial_norm_conv(xd, zq_r, *np1, k1, b1, act_swish=True)
            _, *np2 = _Norm(True, self.dtype, name="norm2")(
                h, zq, return_params=True)
            k2, b2 = _Conv3x3Params(out_ch, out_ch, name="conv2")()
            h = spatial_norm_conv(h, zq_r, *np2, k2, b2, act_swish=True)
        elif fuse_plain:
            xd = x.astype(self.dtype)
            g1, gb1 = _Norm(False, self.dtype, name="norm1")(
                x, return_params=True)
            k1, b1 = _Conv3x3Params(in_ch, out_ch, name="conv1")()
            h = group_norm_conv(xd, g1, gb1, k1, b1, act_swish=True)
            g2, gb2 = _Norm(False, self.dtype, name="norm2")(
                h, return_params=True)
            k2, b2 = _Conv3x3Params(out_ch, out_ch, name="conv2")()
            h = group_norm_conv(h, g2, gb2, k2, b2, act_swish=True)
        else:
            h = _Norm(self.zq_cond, self.dtype, name="norm1")(x, zq,
                                                              act="swish")
            h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name="conv1")(h)

            h = _Norm(self.zq_cond, self.dtype, name="norm2")(h, zq,
                                                              act="swish")
            if self.dropout > 0.0:
                h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            h = nn.Conv(out_ch, (3, 3), dtype=self.dtype, name="conv2")(h)

        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1), dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    zq_cond: bool = False
    dtype: jnp.dtype = jnp.float32
    use_flash: Optional[bool] = None   # None = auto by token count/backend

    @nn.compact
    def __call__(self, x, zq=None):
        b, h, w, c = x.shape
        hn = _Norm(self.zq_cond, self.dtype, name="norm")(x, zq)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="q")(hn)
        k = nn.Conv(c, (1, 1), dtype=self.dtype, name="k")(hn)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(hn)

        t = h * w
        out = attention(q.reshape(b, t, c), k.reshape(b, t, c),
                        v.reshape(b, t, c), use_flash=self.use_flash)
        out = out.reshape(b, h, w, c)
        out = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv ((0,1),(0,1)) — halves H and W."""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2),
                       padding=((0, 1), (0, 1)), dtype=self.dtype,
                       name="conv")(x)


class Upsample(nn.Module):
    """x2 nearest upsample followed by a 3x3 conv.

    Default path is the subpixel reformulation (ops/resample.py::
    upsample2_conv3x3): same math, 4/9 the conv FLOPs, no upsampled
    intermediate in HBM. Same param tree either way (conv/{kernel,bias}).
    """
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if subpixel_enabled():
            k, b = _Conv3x3Params(x.shape[-1], x.shape[-1], name="conv")()
            return upsample2_conv3x3(x.astype(self.dtype), k, b)
        x = upsample_nearest(x, 2)
        return nn.Conv(x.shape[-1], (3, 3), dtype=self.dtype, name="conv")(x)
