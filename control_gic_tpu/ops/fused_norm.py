"""Fused SpatialNorm (+ optional swish) — the decoder's bandwidth hot spot.

SpatialNorm (MoVQ, reference decoder.py:34-53) is
    out = GroupNorm(f) * conv_y(zq) + conv_b(zq)        [then often swish]
where conv_y/conv_b are 1x1 convs from the 4-channel quantized latent to f's
C channels. Under XLA this costs ~7 activation-sized HBM round trips per
norm: the stats pass reads f; the normalize pass reads f and writes the
normalized tensor; the two 1x1 convs each write a full C-channel tensor
(y, b) that the modulation then re-reads. The decoder evaluates ~40 of
these at up to 256x256 resolution, so SpatialNorm traffic rivals the conv
FLOPs in wall-clock.

This module fuses everything after the stats reduction into ONE Pallas
pass: read f + the 4-channel zq block, compute y/b on the fly (two
[rb,4]x[4,C] MXU matmuls — FLOP-free by comparison), normalize, modulate,
swish, write out (~3 activation passes), plus a Pallas moment pass for the
stats. NOTE: measured in-model this is currently a net loss vs XLA (see
fused_norms_enabled) because the kernel boundary blocks XLA's epilogue
fusion into neighboring convs — it is kept opt-in and as groundwork for a
norm+conv fused kernel.

Gradients: jax.custom_vjp with the backward computed by jax.vjp of the
reference jnp formula (recompute-in-backward), so the kernel is safe under
grad/remat/scan. The jnp formula (`spatial_norm_reference`) is also the
CPU/parity fallback and replicates flax nn.GroupNorm numerics exactly
(biased variance as E[x^2] - E[x]^2, clamped at 0, eps inside rsqrt).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

GROUPS = 32
EPS = 1e-6


def _gn_stats(f: jnp.ndarray, groups: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, group) mean / rstd in f32. f: [B, H, W, C]."""
    b, h, w, c = f.shape
    xg = f.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xg.mean(axis=(1, 3))
    mean2 = jnp.square(xg).mean(axis=(1, 3))
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    return mean, jax.lax.rsqrt(var + EPS)            # [B, G] each


def group_norm_reference(f: jnp.ndarray, scale: jnp.ndarray,
                         bias: jnp.ndarray, groups: int = GROUPS
                         ) -> jnp.ndarray:
    """flax nn.GroupNorm(num_groups, eps=1e-6) in plain jnp (f32 out)."""
    b, h, w, c = f.shape
    mean, rstd = _gn_stats(f, groups)
    cg = c // groups
    mean_c = jnp.repeat(mean, cg, axis=1).reshape(b, 1, 1, c)
    rstd_c = jnp.repeat(rstd, cg, axis=1).reshape(b, 1, 1, c)
    return ((f.astype(jnp.float32) - mean_c) * rstd_c
            * scale.astype(jnp.float32) + bias.astype(jnp.float32))


def spatial_norm_reference(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb,
                           act_swish: bool) -> jnp.ndarray:
    """Unfused jnp formula (also the custom-VJP backward and CPU path).

    f: [B,H,W,C]; zq_r: [B,H,W,Z] (already nearest-resized to f);
    wy/wb: [Z,C] 1x1-conv kernels; by/bb/gn_scale/gn_bias: [C].
    Stats are computed in f32; the pointwise normalize/modulate/swish runs
    in f.dtype.

    The modulation is deliberately written as a Z-term broadcast sum, NOT
    `zq @ wy`: Z is 4, and XLA lowers the dot form to f32 convolutions
    that materialize two full C-channel f32 tensors per norm (536 MB each
    at 256²x256) across fusion boundaries. The broadcast form fuses into
    one elementwise pass. Measured on-chip (v5e, 256² batch 8 bf16): the
    whole round-trip went 105.9 -> 123.2 img/s from this rewrite alone,
    and -> 127.6 with the pointwise math in f.dtype (stats still f32).
    """
    dt = f.dtype
    b, h, w, c = f.shape
    mean, rstd = _gn_stats(f, GROUPS)
    cg = c // GROUPS
    mc = jnp.repeat(mean, cg, 1).reshape(b, 1, 1, c).astype(dt)
    rs = jnp.repeat(rstd, cg, 1).reshape(b, 1, 1, c).astype(dt)
    normed = (f - mc) * (rs * gn_scale.astype(dt)) + gn_bias.astype(dt)
    z4 = zq_r.astype(dt)
    y = by.astype(dt) + sum(z4[..., z:z + 1] * wy[z].astype(dt)
                            for z in range(z4.shape[-1]))
    bmod = bb.astype(dt) + sum(z4[..., z:z + 1] * wb[z].astype(dt)
                               for z in range(z4.shape[-1]))
    out = normed * y + bmod
    if act_swish:
        out = out * jax.nn.sigmoid(out)
    return out.astype(dt)


# ------------------------------------------------------------------ kernels

def _stats_kernel(f_ref, o_ref):
    """Per-channel sum / sum-of-squares, accumulated across row blocks.

    Grid (B, HW/rb) with the row index innermost: the (1, 2, C) output
    block stays VMEM-resident across the accumulation steps. The XLA
    equivalent (two convert+reduce fusions) runs at ~40% of HBM bandwidth
    on the decoder's shapes (measured via trace_report); this pass is a
    single streaming read.
    """
    from jax.experimental import pallas as pl

    ir = pl.program_id(1)

    @pl.when(ir == 0)
    def _init():
        o_ref[...] = jnp.zeros_like(o_ref)

    f = f_ref[0].astype(jnp.float32)                       # [rb, C]
    o_ref[0, 0, :] += jnp.sum(f, axis=0)
    o_ref[0, 1, :] += jnp.sum(f * f, axis=0)


def _gn_stats_pallas(f2: jnp.ndarray, groups: int, rb: int,
                     interpret: bool = False):
    """Pallas moment pass + tiny XLA group-fold. f2: [B, HW, C] ->
    per-channel-expanded (mean_c, rstd_c) [B, C] f32 (matching
    _gn_stats + repeat)."""
    from jax.experimental import pallas as pl

    b, hw, c = f2.shape
    s = pl.pallas_call(
        _stats_kernel,
        grid=(b, hw // rb),
        in_specs=[pl.BlockSpec((1, rb, c), lambda ib, ir: (ib, ir, 0))],
        out_specs=pl.BlockSpec((1, 2, c), lambda ib, ir: (ib, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, c), jnp.float32),
        interpret=interpret,
    )(f2)
    cg = c // groups
    n = hw * cg
    s1 = s[:, 0].reshape(b, groups, cg).sum(-1)            # [B, G]
    s2 = s[:, 1].reshape(b, groups, cg).sum(-1)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + EPS)
    mean_c = jnp.repeat(mean, cg, axis=1)                  # [B, C]
    rstd_c = jnp.repeat(rstd, cg, axis=1)
    return mean_c, rstd_c


def _apply_kernel(f_ref, zq_ref, mean_ref, rstd_ref, gam_ref, bet_ref,
                  wy_ref, by_ref, wb_ref, bb_ref, o_ref,
                  *, act_swish: bool):
    from jax.experimental import pallas as pl

    ib = pl.program_id(0)
    f = f_ref[0].astype(jnp.float32)                       # [rb, C]
    zq = zq_ref[0].astype(jnp.float32)                     # [rb, Z]
    mean = mean_ref[ib]                                    # [C] (pre-expanded;
    rstd = rstd_ref[ib]                                    #  full [B,C] block)
    gam = gam_ref[0].astype(jnp.float32)
    bet = bet_ref[0].astype(jnp.float32)

    normed = (f - mean) * (rstd * gam) + bet
    y = jnp.dot(zq, wy_ref[...].astype(jnp.float32),
                preferred_element_type=jnp.float32) + by_ref[0]
    bm = jnp.dot(zq, wb_ref[...].astype(jnp.float32),
                 preferred_element_type=jnp.float32) + bb_ref[0]
    out = normed * y + bm
    if act_swish:
        out = out * (1.0 / (1.0 + jnp.exp(-out)))
    o_ref[0] = out.astype(o_ref.dtype)


def _row_block(hw: int, c: int, target_bytes: int = 1 << 21) -> int:
    """Largest divisor of hw whose [rb, C] f32 block fits target_bytes.

    Mosaic requires the sublane block dim to be a multiple of 8 or equal to
    the full dim; returns 0 when no admissible block exists (caller falls
    back to the jnp path)."""
    cap = max(1, target_bytes // (4 * c))
    if hw <= cap:
        return hw
    rb = cap - cap % 8
    while rb >= 8 and hw % rb:
        rb -= 8
    return rb if rb >= 8 else 0


def _fused_forward(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb,
                   act_swish: bool, interpret: bool = False) -> jnp.ndarray:
    from jax.experimental import pallas as pl

    b, h, w, c = f.shape
    z = zq_r.shape[-1]
    g = GROUPS
    hw = h * w
    rb = _row_block(hw, c)
    assert rb > 0, (hw, c)
    f2 = f.reshape(b, hw, c)
    zq2 = zq_r.reshape(b, hw, z)
    # per-channel-expanded [B, C] stats via the Pallas moment pass
    mean_c, rstd_c = _gn_stats_pallas(f2, g, rb, interpret=interpret)
    row = lambda ib, ir: (ib, ir, 0)
    fixed = lambda ib, ir: (0, 0)

    kernel = functools.partial(_apply_kernel, act_swish=act_swish)
    out = pl.pallas_call(
        kernel,
        grid=(b, hw // rb),
        in_specs=[
            pl.BlockSpec((1, rb, c), row),                 # f
            pl.BlockSpec((1, rb, z), row),                 # zq
            pl.BlockSpec((b, c), fixed),                   # mean (per-chan,
            pl.BlockSpec((b, c), fixed),                   # rstd  full block)
            pl.BlockSpec((1, c), fixed),                   # gamma
            pl.BlockSpec((1, c), fixed),                   # beta
            pl.BlockSpec((z, c), fixed),                   # wy
            pl.BlockSpec((1, c), fixed),                   # by
            pl.BlockSpec((z, c), fixed),                   # wb
            pl.BlockSpec((1, c), fixed),                   # bb
        ],
        out_specs=pl.BlockSpec((1, rb, c), row),
        out_shape=jax.ShapeDtypeStruct((b, hw, c), f.dtype),
        interpret=interpret,
    )(f2, zq2, mean_c, rstd_c,
      gn_scale.astype(jnp.float32)[None], gn_bias.astype(jnp.float32)[None],
      wy.astype(jnp.float32), by.astype(jnp.float32)[None],
      wb.astype(jnp.float32), bb.astype(jnp.float32)[None])
    return out.reshape(b, h, w, c)


def _stats_only_forward(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb,
                        act_swish: bool, interpret: bool = False):
    """Pallas moment pass + plain-jnp apply: XLA keeps fusing the
    normalize/modulate/swish epilogue with neighboring ops, only the slow
    moment reductions are replaced."""
    b, h, w, c = f.shape
    hw = h * w
    rb = _row_block(hw, c)
    assert rb > 0, (hw, c)
    mean_c, rstd_c = _gn_stats_pallas(f.reshape(b, hw, c), GROUPS, rb,
                                      interpret=interpret)
    mean = mean_c[:, None, None, :]
    rstd = rstd_c[:, None, None, :]
    normed = ((f.astype(jnp.float32) - mean) * rstd
              * gn_scale.astype(jnp.float32) + gn_bias.astype(jnp.float32))
    zf = zq_r.astype(jnp.float32)
    y = zf @ wy.astype(jnp.float32) + by.astype(jnp.float32)
    bm = zf @ wb.astype(jnp.float32) + bb.astype(jnp.float32)
    out = normed * y + bm
    if act_swish:
        out = out * jax.nn.sigmoid(out)
    return out.astype(f.dtype)


def _make_fused(act_swish: bool, interpret: bool = False,
                stats_only: bool = False):
    forward = _stats_only_forward if stats_only else _fused_forward

    @jax.custom_vjp
    def fn(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb):
        return forward(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb,
                       act_swish, interpret=interpret)

    def fwd(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb):
        args = (f, zq_r, gn_scale, gn_bias, wy, by, wb, bb)
        return fn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(
            lambda *a: spatial_norm_reference(*a, act_swish=act_swish),
            *args)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


_FUSED_SWISH = _make_fused(True)
_FUSED_PLAIN = _make_fused(False)
_STATS_SWISH = _make_fused(True, stats_only=True)
_STATS_PLAIN = _make_fused(False, stats_only=True)


def fused_norms_enabled() -> bool:
    """Pallas path gate: opt-in via CONTROL_GIC_FUSED_NORM=1 (TPU only).

    Measured on-chip (tools/norm_tune.py + tools/perf_breakdown.py,
    256² batch 8 bf16): the kernels win STANDALONE (apply pass ~0.15 ms at
    full bandwidth, 5-10% over the XLA composition per norm), but IN-MODEL
    the pallas_call boundaries block XLA from fusing the normalize/modulate
    epilogue with neighboring convs, a bigger effect than the traffic saved
    (decode 58.3 ms unfused vs 59.5 fused vs 61.3 with the Pallas stats
    pass too). Default is therefore the XLA formula; the kernel stays for
    shapes/models where epilogue fusion doesn't apply, and as the base for
    a future norm+conv fused kernel.
    """
    if not os.environ.get("CONTROL_GIC_FUSED_NORM"):
        return False
    return jax.default_backend() not in ("cpu", "gpu")


def stats_kernel_enabled() -> bool:
    """Middle path: Pallas moment pass + XLA apply. Opt-in via
    CONTROL_GIC_STATS_KERNEL=1 (TPU only). Measured in-model WORSE than
    both alternatives (decode 66.3 ms vs 58.3 XLA / 59.5 fully-fused at
    256² batch 8): splitting stats out of XLA's fusion pipeline costs more
    than the reduction speedup saves. Kept for kernel development only."""
    if not os.environ.get("CONTROL_GIC_STATS_KERNEL"):
        return False
    return jax.default_backend() not in ("cpu", "gpu")


def spatial_norm(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb,
                 act_swish: bool = False,
                 use_fused: bool | None = None) -> jnp.ndarray:
    """SpatialNorm (+ optional swish): Pallas-fused on TPU, jnp elsewhere."""
    admissible = _row_block(f.shape[1] * f.shape[2], f.shape[3]) > 0
    if use_fused is None:
        use_fused = fused_norms_enabled() and admissible
    if use_fused:
        fn = _FUSED_SWISH if act_swish else _FUSED_PLAIN
        return fn(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb)
    if stats_kernel_enabled() and admissible:
        fn = _STATS_SWISH if act_swish else _STATS_PLAIN
        return fn(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb)
    return spatial_norm_reference(f, zq_r, gn_scale, gn_bias, wy, by, wb, bb,
                                  act_swish)
