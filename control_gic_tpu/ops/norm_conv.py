"""Fused SpatialNorm(+swish) + 3x3 conv — one Pallas pass per decoder conv.

Every conv in the decoder's ResnetBlocks (reference decoder.py:60-101) is fed
by a SpatialNorm -> swish chain (reference decoder.py:34-53, 88-96). Under
XLA that chain costs ~4 full activation HBM round trips per conv: the
GroupNorm stats read, the normalize read+write (XLA does not fuse elementwise
producers INTO a convolution operand), and the conv's own read. The measured
decode profile (tools/trace_report.py, 256² batch 8 bf16) shows the norm
stats reductions alone at ~12 ms/iter (~40% HBM bw) next to ~34 ms of conv.

This kernel removes the intermediate tensor entirely:

    stats pass (Pallas moment kernel, ops/fused_norm._gn_stats_pallas)
    conv pass: read x tile (+1 halo row each side) -> normalize, modulate by
               the on-the-fly 1x1 zq convs, swish -> 9 shifted MXU matmuls
               (the 3x3 conv as sum_{dy,dx} A[dy,dx-shift] @ W[dy,dx]) -> out

i.e. 2 activation passes instead of ~4, with the conv FLOPs still on the MXU
in the input dtype (bf16 in production) and f32 accumulation — matching
XLA's own bf16 conv numerics. Halo rows are gathered by XLA into [B, nH, W, C]
side arrays (2 rows per block) so Pallas block indexing stays non-overlapping;
column halos are handled in-kernel by zero-padding W (SAME padding).

Gradients: jax.custom_vjp; the backward recomputes through the jnp/XLA
reference composition (`norm_conv_reference`) exactly like ops/fused_norm
does, so the op is safe under grad/remat/scan and training gradients are
bit-identical to the unfused path.

The unfused path remains the default off-TPU and wherever shapes are
inadmissible; `norm_conv_enabled()` gates the kernel (see there for the
measured numbers that set the default).
"""
from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .fused_norm import (EPS, GROUPS, _gn_stats, _gn_stats_pallas, _row_block,
                         group_norm_reference, spatial_norm_reference)


# ------------------------------------------------------------- reference

def _conv3x3(a, cw, cb):
    out = lax.conv_general_dilated(
        a, cw.astype(a.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + cb.astype(out.dtype)


def norm_conv_reference(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                        act_swish: bool = True) -> jnp.ndarray:
    """Unfused composition: SpatialNorm(+swish) then 3x3 SAME conv.

    Matches flax nn.Conv(dtype=x.dtype) numerics: operands cast to x.dtype,
    f32 accumulation on the MXU, bias added in the output dtype.
    x: [B,H,W,C]; zq_r: [B,H,W,Z]; cw: [3,3,Cin,Cout]; cb: [Cout].
    """
    a = spatial_norm_reference(x, zq_r, gs, gb, wy, by, wb, bb, act_swish)
    return _conv3x3(a, cw, cb)


def group_norm_conv_reference(x, gs, gb, cw, cb,
                              act_swish: bool = True) -> jnp.ndarray:
    """Plain GroupNorm(+swish, f32) then 3x3 SAME conv (encoder blocks)."""
    a = group_norm_reference(x, gs, gb)
    if act_swish:
        a = a * jax.nn.sigmoid(a)
    return _conv3x3(a.astype(x.dtype), cw, cb)


# ---------------------------------------------------------------- kernel

def _kernel(*refs, act_swish: bool, modulate: bool, bh: int,
            w: int, cin: int, co: int, nh: int):
    from jax.experimental import pallas as pl

    if modulate:
        (x_ref, xp_ref, xn_ref, zq_ref, zqp_ref, zqn_ref, mean_ref,
         rstd_ref, gs_ref, gb_ref, wy_ref, by_ref, wb_ref, bb_ref,
         cw_ref, cb_ref, o_ref) = refs
    else:
        (x_ref, xp_ref, xn_ref, mean_ref, rstd_ref, gs_ref, gb_ref,
         cw_ref, cb_ref, o_ref) = refs

    ib = pl.program_id(0)
    ih = pl.program_id(2)

    mean = mean_ref[ib]                                   # [C] f32
    scale = rstd_ref[ib] * gs_ref[0]                      # rstd * gamma
    beta = gb_ref[0]
    if modulate:
        wy = wy_ref[...].astype(jnp.float32)
        wb = wb_ref[...].astype(jnp.float32)
        by = by_ref[0]
        bb = bb_ref[0]
    cdtype = x_ref.dtype

    def act(xv, zv):
        """normalize -> modulate -> (swish); xv [r,W,C], zv [r,W,Z]."""
        out = (xv.astype(jnp.float32) - mean) * scale + beta
        if modulate:
            zf = zv.astype(jnp.float32)
            y = jnp.dot(zf, wy, preferred_element_type=jnp.float32) + by
            bm = jnp.dot(zf, wb, preferred_element_type=jnp.float32) + bb
            out = out * y + bm
        if act_swish:
            out = out * (1.0 / (1.0 + jnp.exp(-out)))
        return out.astype(cdtype)

    zq0 = zq_ref[0] if modulate else None
    zqp0 = zqp_ref[0] if modulate else None
    zqn0 = zqn_ref[0] if modulate else None
    a_mid = act(x_ref[0], zq0)                            # [bh, W, C]
    a_top = jnp.where(ih > 0, act(xp_ref[0], zqp0), 0).astype(cdtype)
    a_bot = jnp.where(ih < nh - 1,
                      act(xn_ref[0], zqn0), 0).astype(cdtype)
    a = jnp.concatenate([a_top, a_mid, a_bot], axis=0)    # [bh+2, W, C]
    zcol = jnp.zeros((bh + 2, 1, cin), cdtype)
    a = jnp.concatenate([zcol, a, zcol], axis=1)          # [bh+2, W+2, C]

    acc = jnp.zeros((bh * w, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = a[dy:dy + bh, dx:dx + w, :].reshape(bh * w, cin)
            acc += jnp.dot(sl, cw_ref[dy * 3 + dx],
                           preferred_element_type=jnp.float32)
    o_ref[0] = (acc + cb_ref[0]).reshape(bh, w, co).astype(o_ref.dtype)


def _kernel_chain(*refs, act_swish: bool, has_res: bool, emit_mom: bool,
                  modulate: bool, bh: int, w: int, cin: int, co: int,
                  nh: int):
    """SpatialNorm(+swish)+conv with an optional fused RESIDUAL add and
    the next norm's MOMENTS (per-channel sum/sumsq of the final output)
    optionally emitted from the epilogue — the stats-in-epilogue
    ResnetBlock formulation.

    Motivation (round-4 trace analysis): after the broadcast-norm rewrite
    the 256² round-trip is bandwidth-bound on conv+stats+epilogue traffic
    at ~2 read-write passes per conv; chaining kernels that consume the
    PREVIOUS op's moments (skipping their own stats pass) and emit their
    own reaches ~1RW per conv. Matches the reference ResnetBlock hot path
    /root/reference/CGIC/modules/vqvae/decoder.py:60-101,340-398.
    """
    from jax.experimental import pallas as pl

    it = iter(refs)
    x_ref, xp_ref, xn_ref = next(it), next(it), next(it)
    if modulate:
        zq_ref, zqp_ref, zqn_ref = next(it), next(it), next(it)
    else:
        zq_ref = zqp_ref = zqn_ref = None
    mean_ref, rstd_ref, gs_ref, gb_ref = next(it), next(it), next(it), next(it)
    if modulate:
        wy_ref, by_ref, wb_ref, bb_ref = (next(it), next(it), next(it),
                                          next(it))
    cw_ref, cb_ref = next(it), next(it)
    res_ref = next(it) if has_res else None
    o_ref = next(it)
    mom_ref = next(it) if emit_mom else None

    ib = pl.program_id(0)
    ih = pl.program_id(2)

    mean = mean_ref[ib]
    scale = rstd_ref[ib] * gs_ref[0]
    beta = gb_ref[0]
    if modulate:
        wy = wy_ref[...].astype(jnp.float32)
        wb = wb_ref[...].astype(jnp.float32)
        by = by_ref[0]
        bb = bb_ref[0]
    cdtype = x_ref.dtype

    def act(xv, zv):
        out = (xv.astype(jnp.float32) - mean) * scale + beta
        if modulate:
            zf = zv.astype(jnp.float32)
            y = jnp.dot(zf, wy, preferred_element_type=jnp.float32) + by
            bm = jnp.dot(zf, wb, preferred_element_type=jnp.float32) + bb
            out = out * y + bm
        if act_swish:
            out = out * (1.0 / (1.0 + jnp.exp(-out)))
        return out.astype(cdtype)

    zq0 = zq_ref[0] if modulate else None
    zqp0 = zqp_ref[0] if modulate else None
    zqn0 = zqn_ref[0] if modulate else None
    a_mid = act(x_ref[0], zq0)
    a_top = jnp.where(ih > 0, act(xp_ref[0], zqp0), 0).astype(cdtype)
    a_bot = jnp.where(ih < nh - 1,
                      act(xn_ref[0], zqn0), 0).astype(cdtype)
    a = jnp.concatenate([a_top, a_mid, a_bot], axis=0)
    zcol = jnp.zeros((bh + 2, 1, cin), cdtype)
    a = jnp.concatenate([zcol, a, zcol], axis=1)

    acc = jnp.zeros((bh * w, co), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            sl = a[dy:dy + bh, dx:dx + w, :].reshape(bh * w, cin)
            acc += jnp.dot(sl, cw_ref[dy * 3 + dx],
                           preferred_element_type=jnp.float32)
    out = (acc + cb_ref[0]).reshape(bh, w, co)
    if has_res:
        out = out + res_ref[0].astype(jnp.float32)
    out_c = out.astype(o_ref.dtype)
    o_ref[0] = out_c

    if emit_mom:
        # moments of the STORED (dtype-rounded) output — exactly what the
        # next norm's stats pass would read — accumulated across row blocks
        @pl.when(ih == 0)
        def _init():
            mom_ref[...] = jnp.zeros_like(mom_ref)

        of = out_c.astype(jnp.float32)
        mom_ref[0, 0, :] += jnp.sum(of, axis=(0, 1))
        mom_ref[0, 1, :] += jnp.sum(of * of, axis=(0, 1))


def stats_from_moments(mom: jnp.ndarray, hw: int):
    """Fold per-channel moments [B, 2, C] (sum, sumsq over H*W) into the
    per-channel-expanded GroupNorm stats (mean_c, rstd_c) [B, C] f32 —
    matching _gn_stats + repeat. The consumer of a chained kernel's
    epilogue moments; tiny [B, C] XLA work in place of a full activation
    read."""
    b, _, c = mom.shape
    cg = c // GROUPS
    n = hw * cg
    s1 = mom[:, 0].reshape(b, GROUPS, cg).sum(-1)
    s2 = mom[:, 1].reshape(b, GROUPS, cg).sum(-1)
    mean = s1 / n
    var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    rstd = jax.lax.rsqrt(var + EPS)
    return jnp.repeat(mean, cg, axis=1), jnp.repeat(rstd, cg, axis=1)


def spatial_norm_kernel_act(x, zq_r, gs, gb, wy, by, wb, bb,
                            act_swish: bool, stats=None):
    """The kernel's activation math in jnp (f32 dot-form modulation —
    matches _kernel_chain numerics, NOT the broadcast-form
    spatial_norm_reference used by the unfused model path). `stats`
    optionally supplies precomputed (mean_c, rstd_c) [B, C] f32."""
    if stats is None:
        mean, rstd = _gn_stats(x, GROUPS)
        cg = x.shape[-1] // GROUPS
        mean_c = jnp.repeat(mean, cg, axis=1)
        rstd_c = jnp.repeat(rstd, cg, axis=1)
    else:
        mean_c, rstd_c = stats
    mean_c = mean_c[:, None, None, :]
    rstd_c = rstd_c[:, None, None, :]
    out = ((x.astype(jnp.float32) - mean_c)
           * (rstd_c * gs.astype(jnp.float32)) + gb.astype(jnp.float32))
    zf = zq_r.astype(jnp.float32)
    y = zf @ wy.astype(jnp.float32) + by.astype(jnp.float32)
    bm = zf @ wb.astype(jnp.float32) + bb.astype(jnp.float32)
    out = out * y + bm
    if act_swish:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def _mom_epilogue(out, res, x_dtype, emit_mom):
    if res is not None:
        out = out.astype(jnp.float32) + res.astype(jnp.float32)
    out = out.astype(x_dtype)
    if not emit_mom:
        return out
    of = out.astype(jnp.float32)
    mom = jnp.stack([of.sum(axis=(1, 2)),
                     (of * of).sum(axis=(1, 2))], axis=1)
    return out, mom


def chain_reference(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb, res=None,
                    stats=None, act_swish: bool = True,
                    emit_mom: bool = True):
    """Unfused composition (custom-VJP backward + CPU path) of the chained
    kernel: SpatialNorm(+swish) -> 3x3 conv [-> +residual], optionally
    consuming precomputed stats, optionally emitting (sum, sumsq)
    [B, 2, Cout] moments of the dtype-rounded output."""
    out = _conv3x3(spatial_norm_kernel_act(x, zq_r, gs, gb, wy, by, wb, bb,
                                           act_swish, stats=stats), cw, cb)
    return _mom_epilogue(out, res, x.dtype, emit_mom)


def group_norm_kernel_act(x, gs, gb, act_swish: bool, stats=None):
    """Plain GroupNorm(+swish) in the kernel's numerics (f32 normalize,
    optional precomputed stats) — the modulate=False activation."""
    if stats is None:
        mean, rstd = _gn_stats(x, GROUPS)
        cg = x.shape[-1] // GROUPS
        mean_c = jnp.repeat(mean, cg, axis=1)
        rstd_c = jnp.repeat(rstd, cg, axis=1)
    else:
        mean_c, rstd_c = stats
    out = ((x.astype(jnp.float32) - mean_c[:, None, None, :])
           * (rstd_c[:, None, None, :] * gs.astype(jnp.float32))
           + gb.astype(jnp.float32))
    if act_swish:
        out = out * jax.nn.sigmoid(out)
    return out.astype(x.dtype)


def plain_chain_reference(x, gs, gb, cw, cb, res=None, stats=None,
                          act_swish: bool = True, emit_mom: bool = True):
    """Unfused composition of the plain (GroupNorm, encoder-side) chained
    kernel; see chain_reference."""
    out = _conv3x3(group_norm_kernel_act(x, gs, gb, act_swish,
                                         stats=stats), cw, cb)
    return _mom_epilogue(out, res, x.dtype, emit_mom)


def norm_conv_res_moments_reference(x, zq_r, gs, gb, wy, by, wb, bb,
                                    cw, cb, res, act_swish: bool = True):
    """Back-compat alias: chain_reference with residual + moments."""
    return chain_reference(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                           res=res, act_swish=act_swish, emit_mom=True)


def _chain_forward(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb, res, stats,
                   act_swish: bool, emit_mom: bool,
                   interpret: bool = False):
    """Modulated (SpatialNorm) chained forward; zq_r/wy/by/wb/bb may be
    None for the plain GroupNorm variant (see _chain_forward_impl)."""
    return _chain_forward_impl(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                               res, stats, act_swish=act_swish,
                               emit_mom=emit_mom, modulate=True,
                               interpret=interpret)


def _chain_forward_impl(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb, res,
                        stats, *, act_swish: bool, emit_mom: bool,
                        modulate: bool, interpret: bool = False):
    from jax.experimental import pallas as pl

    b, h, w, cin = x.shape
    cout = cw.shape[-1]
    bh = _pick_bh(h, w, cin, x.dtype.itemsize)
    co_blk = _pick_co(cout, cin, x.dtype.itemsize)
    nh = h // bh
    nco = cout // co_blk

    if stats is not None:
        mean_c, rstd_c = stats
        mean_c = mean_c.astype(jnp.float32)
        rstd_c = rstd_c.astype(jnp.float32)
    else:
        rb = _row_block(h * w, cin)
        if rb > 0 and not interpret:
            mean_c, rstd_c = _gn_stats_pallas(x.reshape(b, h * w, cin),
                                              GROUPS, rb,
                                              interpret=interpret)
        else:
            mean, rstd = _gn_stats(x, GROUPS)
            cg = cin // GROUPS
            mean_c = jnp.repeat(mean, cg, axis=1)
            rstd_c = jnp.repeat(rstd, cg, axis=1)

    xp, xn = _halo_rows(x, bh)
    cwr = cw.reshape(9, cin, cout).astype(x.dtype)
    f32 = jnp.float32

    row4 = lambda ib, ico, ih: (ib, ih, 0, 0)
    fixed2 = lambda ib, ico, ih: (0, 0)
    in_specs = [
        pl.BlockSpec((1, bh, w, cin), row4),
        pl.BlockSpec((1, 1, w, cin), row4),
        pl.BlockSpec((1, 1, w, cin), row4),
    ]
    operands = [x, xp, xn]
    if modulate:
        z = zq_r.shape[-1]
        zp, zn = _halo_rows(zq_r, bh)
        in_specs += [
            pl.BlockSpec((1, bh, w, z), row4),
            pl.BlockSpec((1, 1, w, z), row4),
            pl.BlockSpec((1, 1, w, z), row4),
        ]
        operands += [zq_r, zp, zn]
    in_specs += [
        pl.BlockSpec((b, cin), fixed2),
        pl.BlockSpec((b, cin), fixed2),
        pl.BlockSpec((1, cin), fixed2),
        pl.BlockSpec((1, cin), fixed2),
    ]
    operands += [mean_c, rstd_c,
                 gs.astype(f32)[None], gb.astype(f32)[None]]
    if modulate:
        in_specs += [
            pl.BlockSpec((z, cin), fixed2),
            pl.BlockSpec((1, cin), fixed2),
            pl.BlockSpec((z, cin), fixed2),
            pl.BlockSpec((1, cin), fixed2),
        ]
        operands += [wy.astype(f32), by.astype(f32)[None],
                     wb.astype(f32), bb.astype(f32)[None]]
    in_specs += [
        pl.BlockSpec((9, cin, co_blk), lambda ib, ico, ih: (0, 0, ico)),
        pl.BlockSpec((1, co_blk), lambda ib, ico, ih: (0, ico)),
    ]
    operands += [cwr, cb.astype(f32)[None]]
    if res is not None:
        in_specs.append(pl.BlockSpec(
            (1, bh, w, co_blk), lambda ib, ico, ih: (ib, ih, 0, ico)))
        operands.append(res)

    out_specs = [pl.BlockSpec((1, bh, w, co_blk),
                              lambda ib, ico, ih: (ib, ih, 0, ico))]
    out_shape = [jax.ShapeDtypeStruct((b, h, w, cout), x.dtype)]
    if emit_mom:
        out_specs.append(pl.BlockSpec(
            (1, 2, co_blk), lambda ib, ico, ih: (ib, 0, ico)))
        out_shape.append(jax.ShapeDtypeStruct((b, 2, cout), jnp.float32))

    kernel = functools.partial(_kernel_chain, act_swish=act_swish,
                               has_res=res is not None, emit_mom=emit_mom,
                               modulate=modulate, bh=bh, w=w, cin=cin,
                               co=co_blk, nh=nh)
    out = pl.pallas_call(
        kernel,
        grid=(b, nco, nh),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    return tuple(out) if emit_mom else out[0]


@functools.lru_cache(maxsize=None)
def _chain_custom(act_swish: bool, has_res: bool, has_stats: bool,
                  emit_mom: bool, interpret: bool = False,
                  modulate: bool = True):
    """custom-VJP wrapper for one static chained-kernel configuration.

    Positional layout: the base args (x, zq_r, gs, gb, wy, by, wb, bb,
    cw, cb for the modulated form; x, gs, gb, cw, cb for the plain
    GroupNorm form), then res if has_res, then mean_c, rstd_c if
    has_stats. The backward recomputes through chain_reference /
    plain_chain_reference (jnp/XLA), so gradients are identical to the
    unfused composition — including cotangents for externally-supplied
    stats, which flow back through the producing block's moments."""
    nbase = 10 if modulate else 5

    def split(args):
        res = args[nbase] if has_res else None
        k = nbase + int(has_res)
        stats = (args[k], args[k + 1]) if has_stats else None
        return args[:nbase], res, stats

    @jax.custom_vjp
    def fn(*args):
        base, res, stats = split(args)
        if modulate:
            return _chain_forward(*base, res, stats, act_swish, emit_mom,
                                  interpret=interpret)
        x, gs, gb, cw, cb = base
        return _chain_forward_impl(x, None, gs, gb, None, None, None,
                                   None, cw, cb, res, stats,
                                   act_swish=act_swish, emit_mom=emit_mom,
                                   modulate=False, interpret=interpret)

    def fwd(*args):
        return fn(*args), args

    def bwd(args, g):
        def ref(*a):
            base, res, stats = split(a)
            if modulate:
                return chain_reference(*base, res=res, stats=stats,
                                       act_swish=act_swish,
                                       emit_mom=emit_mom)
            return plain_chain_reference(*base, res=res, stats=stats,
                                         act_swish=act_swish,
                                         emit_mom=emit_mom)

        _, vjp = jax.vjp(ref, *args)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


def spatial_norm_conv_mom(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                          res=None, stats=None, act_swish: bool = True,
                          emit_mom: bool = True,
                          use_fused: Optional[bool] = None):
    """SpatialNorm(+swish) -> 3x3 conv [-> +residual] with optional
    precomputed stats in and optional epilogue moments out — the chained
    ResnetBlock building block (~1 activation read-write per conv when
    chained, vs ~2 for the XLA composition). Returns out, or (out,
    moments [B, 2, Cout]) with emit_mom. Reference composition
    off-TPU/inadmissible."""
    if use_fused is None:
        use_fused = (norm_conv_enabled()
                     and admissible(x.shape, cw.shape[-1])
                     and admissible(x.shape[:3] + (cw.shape[-1],),
                                    cw.shape[-1]))
    if use_fused:
        fn = _chain_custom(act_swish, res is not None, stats is not None,
                           emit_mom, _interpret_forced())
        args = [x, zq_r, gs, gb, wy, by, wb, bb, cw, cb]
        if res is not None:
            args.append(res)
        if stats is not None:
            args.extend(stats)
        return fn(*args)
    return chain_reference(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                           res=res, stats=stats, act_swish=act_swish,
                           emit_mom=emit_mom)


def spatial_norm_conv_res_moments(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                                  res, act_swish: bool = True,
                                  use_fused: Optional[bool] = None):
    """Back-compat wrapper: SpatialNorm(+swish) -> 3x3 conv -> +residual,
    returning (out, moments [B, 2, Cout]). See spatial_norm_conv_mom."""
    return spatial_norm_conv_mom(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                                 res=res, act_swish=act_swish,
                                 emit_mom=True, use_fused=use_fused)


def group_norm_conv_mom(x, gs, gb, cw, cb, res=None, stats=None,
                        act_swish: bool = True, emit_mom: bool = True,
                        use_fused: Optional[bool] = None):
    """Plain GroupNorm(+swish) -> 3x3 conv [-> +residual] with optional
    precomputed stats in and optional epilogue moments out — the
    encoder-side (no zq modulation) chained building block. Returns out,
    or (out, moments [B, 2, Cout]) with emit_mom. Reference composition
    off-TPU/inadmissible."""
    if use_fused is None:
        use_fused = (norm_conv_enabled()
                     and admissible(x.shape, cw.shape[-1])
                     and admissible(x.shape[:3] + (cw.shape[-1],),
                                    cw.shape[-1]))
    if use_fused:
        fn = _chain_custom(act_swish, res is not None, stats is not None,
                           emit_mom, _interpret_forced(), modulate=False)
        args = [x, gs, gb, cw, cb]
        if res is not None:
            args.append(res)
        if stats is not None:
            args.extend(stats)
        return fn(*args)
    return plain_chain_reference(x, gs, gb, cw, cb, res=res, stats=stats,
                                 act_swish=act_swish, emit_mom=emit_mom)


def _pick_bh(h: int, w: int, cin: int = 128, itemsize: int = 2,
             target_bytes: int = 1 << 20) -> int:
    """Largest divisor of h with the [bh, W, Cin] input tile <= target_bytes.

    1MB tiles from the on-chip sweep (tools/norm_conv_tune.py, v5e): bh=16
    beats 8 at 256^2x128 (3.54 vs 3.66 ms) and is the best *compilable*
    block at 128^2x256 (2.64 ms; the 2MB bh=32 tile crashes the TPU
    compile at co=256 outside a scan)."""
    bh = max(1, min(h, target_bytes // max(w * cin * itemsize, 1)))
    while h % bh:
        bh -= 1
    return bh


def _pick_co(cout: int, cin: int, itemsize: int,
             target_bytes: int = 1 << 21) -> int:
    """Largest divisor of cout (multiple of 128 when possible) keeping the
    [9, Cin, co] weight block under target_bytes."""
    if cout <= 128:
        return cout
    co = (target_bytes // (9 * cin * itemsize)) // 128 * 128
    co = max(128, min(co, cout))
    while cout % co:
        co -= 128
    return max(co, 128) if cout % 128 == 0 else cout


def admissible(x_shape: Tuple[int, ...], cout: int) -> bool:
    """Shapes the Pallas path handles efficiently (else: reference path)."""
    _, h, w, c = x_shape
    if c % 128 or w % 16 or h < 2:
        return False
    if cout > 128 and cout % 128:
        return False
    return _row_block(h * w, c) > 0       # stats pass admissibility


def _halo_rows(t: jnp.ndarray, bh: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rows i*bh-1 (zeros at i=0) and (i+1)*bh (zeros at i=nh-1) per block.

    t: [B, H, W, C] -> ([B, nH, W, C], [B, nH, W, C])."""
    b, h, w, c = t.shape
    nh = h // bh
    zero = jnp.zeros((b, 1, w, c), t.dtype)
    prev = jnp.concatenate([zero, t[:, bh - 1::bh][:, :nh - 1]], axis=1)
    nxt = jnp.concatenate([t[:, bh::bh], zero], axis=1)
    return prev, nxt


def _norm_conv_forward(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                       act_swish: bool, interpret: bool = False,
                       bh: Optional[int] = None,
                       co_blk: Optional[int] = None) -> jnp.ndarray:
    """SpatialNorm(+swish)+conv (modulate=True path)."""
    return _norm_conv_forward_impl(
        x, zq_r, gs, gb, wy, by, wb, bb, cw, cb, act_swish=act_swish,
        modulate=True, interpret=interpret, bh=bh, co_blk=co_blk)


def _group_norm_conv_forward(x, gs, gb, cw, cb, act_swish: bool,
                             interpret: bool = False,
                             bh: Optional[int] = None,
                             co_blk: Optional[int] = None) -> jnp.ndarray:
    """GroupNorm(+swish)+conv (modulate=False path, encoder blocks)."""
    return _norm_conv_forward_impl(
        x, None, gs, gb, None, None, None, None, cw, cb,
        act_swish=act_swish, modulate=False, interpret=interpret,
        bh=bh, co_blk=co_blk)


def _norm_conv_forward_impl(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb, *,
                            act_swish: bool, modulate: bool,
                            interpret: bool = False,
                            bh: Optional[int] = None,
                            co_blk: Optional[int] = None) -> jnp.ndarray:
    from jax.experimental import pallas as pl

    b, h, w, cin = x.shape
    cout = cw.shape[-1]
    bh = bh or _pick_bh(h, w, cin, x.dtype.itemsize)
    co_blk = co_blk or _pick_co(cout, cin, x.dtype.itemsize)
    nh = h // bh
    nco = cout // co_blk

    rb = _row_block(h * w, cin)
    if rb > 0 and not interpret:
        mean_c, rstd_c = _gn_stats_pallas(x.reshape(b, h * w, cin), GROUPS,
                                          rb, interpret=interpret)
    else:                                  # jnp stats (interpret/CPU tests)
        mean, rstd = _gn_stats(x, GROUPS)
        cg = cin // GROUPS
        mean_c = jnp.repeat(mean, cg, axis=1)
        rstd_c = jnp.repeat(rstd, cg, axis=1)

    xp, xn = _halo_rows(x, bh)
    cwr = cw.reshape(9, cin, cout).astype(x.dtype)
    f32 = jnp.float32

    row4 = lambda ib, ico, ih: (ib, ih, 0, 0)
    fixed2 = lambda ib, ico, ih: (0, 0)

    in_specs = [
        pl.BlockSpec((1, bh, w, cin), row4),           # x
        pl.BlockSpec((1, 1, w, cin), row4),            # prev halo row
        pl.BlockSpec((1, 1, w, cin), row4),            # next halo row
    ]
    operands = [x, xp, xn]
    if modulate:
        z = zq_r.shape[-1]
        zp, zn = _halo_rows(zq_r, bh)
        in_specs += [
            pl.BlockSpec((1, bh, w, z), row4),         # zq
            pl.BlockSpec((1, 1, w, z), row4),          # zq prev halo
            pl.BlockSpec((1, 1, w, z), row4),          # zq next halo
        ]
        operands += [zq_r, zp, zn]
    in_specs += [
        pl.BlockSpec((b, cin), fixed2),                # mean (per-chan)
        pl.BlockSpec((b, cin), fixed2),                # rstd
        pl.BlockSpec((1, cin), fixed2),                # gamma
        pl.BlockSpec((1, cin), fixed2),                # beta
    ]
    operands += [mean_c, rstd_c,
                 gs.astype(f32)[None], gb.astype(f32)[None]]
    if modulate:
        in_specs += [
            pl.BlockSpec((z, cin), fixed2),            # wy
            pl.BlockSpec((1, cin), fixed2),            # by
            pl.BlockSpec((z, cin), fixed2),            # wb
            pl.BlockSpec((1, cin), fixed2),            # bb
        ]
        operands += [wy.astype(f32), by.astype(f32)[None],
                     wb.astype(f32), bb.astype(f32)[None]]
    in_specs += [
        pl.BlockSpec((9, cin, co_blk),
                     lambda ib, ico, ih: (0, 0, ico)),  # conv weights
        pl.BlockSpec((1, co_blk),
                     lambda ib, ico, ih: (0, ico)),     # conv bias
    ]
    operands += [cwr, cb.astype(f32)[None]]

    kernel = functools.partial(_kernel, act_swish=act_swish,
                               modulate=modulate, bh=bh, w=w,
                               cin=cin, co=co_blk, nh=nh)
    out = pl.pallas_call(
        kernel,
        grid=(b, nco, nh),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, w, co_blk),
                               lambda ib, ico, ih: (ib, ih, 0, ico)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        interpret=interpret,
    )(*operands)
    return out


def _make_norm_conv(act_swish: bool, interpret: bool = False):
    @jax.custom_vjp
    def fn(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb):
        return _norm_conv_forward(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                                  act_swish, interpret=interpret)

    def fwd(*args):
        return fn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(
            lambda *a: norm_conv_reference(*a, act_swish=act_swish), *args)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


def _make_group_norm_conv(act_swish: bool, interpret: bool = False):
    @jax.custom_vjp
    def fn(x, gs, gb, cw, cb):
        return _group_norm_conv_forward(x, gs, gb, cw, cb,
                                        act_swish, interpret=interpret)

    def fwd(*args):
        return fn(*args), args

    def bwd(args, g):
        _, vjp = jax.vjp(
            lambda *a: group_norm_conv_reference(*a, act_swish=act_swish),
            *args)
        return vjp(g)

    fn.defvjp(fwd, bwd)
    return fn


_NORM_CONV_SWISH = _make_norm_conv(True)
_NORM_CONV_PLAIN = _make_norm_conv(False)
_NORM_CONV_SWISH_I = _make_norm_conv(True, interpret=True)
_NORM_CONV_PLAIN_I = _make_norm_conv(False, interpret=True)
_GN_CONV_SWISH = _make_group_norm_conv(True)
_GN_CONV_PLAIN = _make_group_norm_conv(False)
_GN_CONV_SWISH_I = _make_group_norm_conv(True, interpret=True)
_GN_CONV_PLAIN_I = _make_group_norm_conv(False, interpret=True)


def _interpret_forced() -> bool:
    return (os.environ.get("CONTROL_GIC_NORM_CONV") == "interpret"
            or os.environ.get("CONTROL_GIC_CHAIN") == "interpret")


def chain_enabled() -> bool:
    """Gate for the stats-in-epilogue chained ResnetBlock path in the
    decoder trunk (CONTROL_GIC_CHAIN: '1' on, '0' off, 'interpret' =
    interpret-mode kernels on any backend for CPU tests).

    Separate from norm_conv_enabled(): the non-chained per-call kernels
    measured as in-model losses (see norm_conv_enabled history), while the
    chain amortizes the stats pass ACROSS blocks — the configuration the
    round-4 bandwidth analysis says can beat XLA. Default ON for TPU,
    shape-gated (see chain_admissible): round-5 on-chip A/Bs measured the
    6-tile 768² decode at 1130 -> 911 ms all-chained (and 1073 -> 860 for
    the full decode+stitch program, bit-identical uint8 output) while the
    256² round-trip LOSES all-chained (122.5 -> 104 img/s) — so the
    element gate keeps 256²-class programs on pure XLA and the gated
    default only changes programs where the chain wins."""
    flag = os.environ.get("CONTROL_GIC_CHAIN", "")
    if flag == "interpret":
        return True
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    return flag != "0"


def chain_admissible(x_shape: Tuple[int, ...], cout: int) -> bool:
    """Call-site gate for the chained path: enabled AND both convs of the
    block shape-admissible AND the activation big enough to win.

    The element gate reuses _fuse_min_elems (9M): the round-5 on-chip
    in-model A/B reproduced the round-3 boundary exactly — all-chained
    256² round-trip LOSES (122.5 -> 104 img/s; largest shape 8.4M
    elems/sample) while the 6-tile 768² decode WINS 19% (1130 -> 911 ms;
    chained shapes 9.4-75M elems/sample, bit-identical uint8 output).
    Small compute-bound activations lose to XLA's global fusion; large
    bandwidth-bound ones gain from the ~1RW chained pass."""
    if not chain_enabled():
        return False
    if not (admissible(x_shape, cout)
            and admissible(x_shape[:3] + (cout,), cout)):
        return False
    if _interpret_forced():
        return True
    rule = _RULE.get()
    if rule is not None:
        return bool(rule(x_shape, cout))
    return (x_shape[1] * x_shape[2] * x_shape[3]) >= _fuse_min_elems()


def _fuse_min_elems() -> int:
    """Shape policy for the default gating: fuse only when the per-sample
    activation (h*w*c elements) is at least this large.

    Round-3 on-chip A/B (v5e, bf16; decode of six 768px tiles + the 256²
    batch-8 round-trip + whole-program encode, see DESIGN.md):
      - big-shape programs WIN with the kernel: 6-tile 768px decode
        1915 -> 1448 ms, encode 367 -> 282 ms (engaged shapes: mids
        192²x512 = 18.9M, trunk 384²x256 = 37.7M, 768²x128 = 75M,
        192²x256 = 9.4M elems/sample);
      - the 256²-image program still LOSES slightly (104.4 -> 101.4
        img/s; its largest shape is 256²x128 = 8.4M elems/sample).
    9M separates every measured winner (>= 9.4M) from every measured
    loser (<= 8.4M): bandwidth-bound big activations gain from the fused
    single pass, compute-bound small ones lose to XLA's global fusion.
    Interpret-mode tests bypass the policy so every shape stays covered."""
    return int(os.environ.get("CONTROL_GIC_NORM_CONV_MIN_ELEMS",
                              "9000000"))


_FORCED = __import__("contextvars").ContextVar(
    "control_gic_norm_conv_forced", default=False)

# Optional pluggable engagement predicate (x_shape, cout) -> bool. When
# set, it REPLACES the element-count gate (admissibility still applies).
# Used by on-chip A/B harnesses to measure per-shape policies in-model.
# ContextVar (like _FORCED) so concurrent pipeline threads tracing other
# programs are unaffected. NOTE: the rule is consulted at TRACE time and
# is not part of any jit-cache key — harnesses must build fresh jit
# wrappers per rule (cached executables keep the policy they were traced
# under).
_RULE = __import__("contextvars").ContextVar(
    "control_gic_norm_conv_rule", default=None)


def set_engagement_rule(fn) -> None:
    _RULE.set(fn)


# Round-4 standalone per-call A/B vs the XLA composition (v5e bf16, for
# future kernel work): 64²x512->512: 2.63 vs 3.23 ms (+19%); 128²x256->256:
# 2.54 vs 3.17 (+20%); 256²x128->128: 3.48 vs 3.23 (-8%). These wins do
# NOT survive in-model (see norm_conv_enabled).


class force_norm_conv:
    """Engage the fused kernel for programs TRACED inside this context
    (still subject to `admissible` and the element gate), regardless of the
    global opt-in. ContextVar-based, so concurrent pipeline threads tracing
    other programs are unaffected.

    History: the tiled high-res codec forced the kernel ON through round 3
    (25% decode win on 768px-tile programs). After the round-4 SpatialNorm
    broadcast rewrite (ops/fused_norm.spatial_norm_reference) the XLA path
    caught up — re-measured A/B on the 2K tiled codec: kernel-forced
    0.47-0.49 img/s vs all-XLA 0.49 (a wash within tunnel variance) — so
    the force was removed and the kernel is opt-in everywhere."""

    def __enter__(self):
        self._tok = _FORCED.set(True)
        return self

    def __exit__(self, *exc):
        _FORCED.reset(self._tok)
        return False


def norm_conv_enabled() -> bool:
    """Gate for the fused SpatialNorm/GroupNorm+swish+conv Pallas path.

    Engagement policy: OPT-IN everywhere (CONTROL_GIC_NORM_CONV=1), OFF by
    default, since round 4. History of the measurements that set this:
      - Round 3: the kernel won ~25% end-to-end on 768px-tile programs
        (decode 1915 -> 1448 ms) and lost at 256²/Kodak whole-image
        shapes, so the tiled codec forced it ON (force_norm_conv).
      - Round 4: trace analysis found the real whole-image bottleneck was
        the SpatialNorm modulation lowering (f32 conv materialization);
        after rewriting it as broadcast arithmetic
        (fused_norm.spatial_norm_reference, rt256 105.9 -> 127.6 img/s),
        the XLA path also caught up on tile programs (2K tiled codec:
        kernel-forced 0.47-0.49 img/s vs all-XLA 0.49 — a wash), and
        standalone per-call wins (64²x512: 2.63 vs 3.23 ms) still do not
        survive in-model (every engagement rule measured 93-97 img/s vs
        106 baseline at rt256 pre-rewrite) because the pallas_call
        boundary blocks XLA's conv+stats+epilogue fusions.
    The kernel remains correct (tests/test_norm_conv.py, interpret mode
    covers every shape on CPU) and is the base for a future stats-in-
    epilogue ResnetBlock kernel; per-shape harness: tools/norm_conv_tune.py
    + set_engagement_rule for in-model policy A/Bs.
    """
    flag = os.environ.get("CONTROL_GIC_NORM_CONV", "")
    if flag == "interpret":
        return True
    if jax.default_backend() in ("cpu", "gpu"):
        return False
    if flag == "0":
        return False
    return flag == "1" or _FORCED.get()


def norm_conv_worthwhile(x_shape: Tuple[int, ...], cout: int) -> bool:
    """Full call-site gate: enabled AND shape-admissible AND big enough to
    win (see _fuse_min_elems). Module code (blocks/encoder/decoder) must
    branch on THIS, not norm_conv_enabled() alone: when the element gate
    would reject, the module should keep its original unfused composition
    (the exact round-2 all-XLA program) rather than routing through the
    ops-level reference fallback, whose different graph structure measured
    ~13% slower at 256² (rt256 105.9 -> 92.1 img/s, round-3 regression)."""
    if not norm_conv_enabled():
        return False
    if not admissible(x_shape, cout):
        return False
    if _interpret_forced():
        return True
    rule = _RULE.get()
    if rule is not None:
        return bool(rule(x_shape, cout))
    return (x_shape[1] * x_shape[2] * x_shape[3]) >= _fuse_min_elems()


def spatial_norm_conv(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                      act_swish: bool = True,
                      use_fused: Optional[bool] = None) -> jnp.ndarray:
    """SpatialNorm(+swish) -> 3x3 SAME conv, Pallas-fused on TPU.

    Falls back to the XLA composition off-TPU or for inadmissible shapes.
    Parameters mirror the flax modules exactly (see models/blocks.py), so
    the op is a drop-in for SpatialNorm + nn.Conv with identical pytrees.
    """
    if use_fused is None:
        use_fused = norm_conv_worthwhile(x.shape, cw.shape[-1])
    if use_fused:
        if _interpret_forced():
            fn = _NORM_CONV_SWISH_I if act_swish else _NORM_CONV_PLAIN_I
        else:
            fn = _NORM_CONV_SWISH if act_swish else _NORM_CONV_PLAIN
        return fn(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb)
    return norm_conv_reference(x, zq_r, gs, gb, wy, by, wb, bb, cw, cb,
                               act_swish)


def group_norm_conv(x, gs, gb, cw, cb, act_swish: bool = True,
                    use_fused: Optional[bool] = None) -> jnp.ndarray:
    """GroupNorm(+swish) -> 3x3 SAME conv, Pallas-fused on TPU.

    The encoder-side twin of `spatial_norm_conv` (no zq modulation):
    every encoder ResnetBlock conv is fed by GroupNorm -> swish
    (reference vqvae_blocks.py:78-137), and the encoder heads end in
    GroupNorm -> swish -> conv_out (vqvae_blocks.py:286-297). Falls back
    to the XLA composition off-TPU or for inadmissible shapes.
    """
    if use_fused is None:
        use_fused = norm_conv_worthwhile(x.shape, cw.shape[-1])
    if use_fused:
        if _interpret_forced():
            fn = _GN_CONV_SWISH_I if act_swish else _GN_CONV_PLAIN_I
        else:
            fn = _GN_CONV_SWISH if act_swish else _GN_CONV_PLAIN
        return fn(x, gs, gb, cw, cb)
    return group_norm_conv_reference(x, gs, gb, cw, cb, act_swish)
