"""Fused SpatialNorm+swish+3x3conv: Pallas kernel == XLA composition.

The kernel runs in interpret mode here (CPU suite); on TPU the same kernel
compiles natively (validated by tools/norm_conv_tune.py on-chip). Covers:
the reference composition vs the flax modules, the kernel vs the reference
(row blocking/halos, Cout blocking, Cin != Cout, the Cout=3 conv_out shape),
gradients through the custom VJP, and the ResnetBlock/Decoder fused param
wiring via CONTROL_GIC_NORM_CONV=interpret.
"""
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from control_gic_tpu.ops.norm_conv import (_group_norm_conv_forward,
                                           _make_group_norm_conv,
                                           _norm_conv_forward, _make_norm_conv,
                                           admissible, group_norm_conv,
                                           group_norm_conv_reference,
                                           norm_conv_reference,
                                           spatial_norm_conv)
from control_gic_tpu.ops.fused_norm import spatial_norm_reference


def _inputs(rng, b=2, h=16, w=16, cin=128, cout=128, z=4,
            dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), dtype)
    zq = jnp.asarray(rng.normal(size=(b, h, w, z)), dtype)
    gs = jnp.asarray(rng.normal(1.0, 0.1, cin), jnp.float32)
    gb = jnp.asarray(rng.normal(0.0, 0.1, cin), jnp.float32)
    wy = jnp.asarray(rng.normal(size=(z, cin)) * 0.3, jnp.float32)
    by = jnp.asarray(rng.normal(size=cin) * 0.1, jnp.float32)
    wb = jnp.asarray(rng.normal(size=(z, cin)) * 0.3, jnp.float32)
    bb = jnp.asarray(rng.normal(size=cin) * 0.1, jnp.float32)
    cw = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
    cb = jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32)
    return x, zq, gs, gb, wy, by, wb, bb, cw, cb


def test_reference_matches_flax_composition(rng):
    """norm_conv_reference == spatial_norm_reference -> nn.Conv."""
    args = _inputs(rng)
    x, zq, gs, gb, wy, by, wb, bb, cw, cb = args
    a = spatial_norm_reference(x, zq, gs, gb, wy, by, wb, bb, act_swish=True)
    conv = nn.Conv(cw.shape[-1], (3, 3), dtype=x.dtype)
    want = conv.apply({"params": {"kernel": cw, "bias": cb}}, a)
    got = norm_conv_reference(*args, act_swish=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_kernel_matches_reference_shapes(rng):
    """Interpret-mode kernel == reference over blocking/shape variants."""
    cases = [
        dict(b=2, h=16, w=16, cin=128, cout=128),       # square
        dict(b=1, h=8, w=32, cin=128, cout=256),        # cin != cout
        dict(b=2, h=16, w=16, cin=256, cout=128),       # channel reduce
        dict(b=1, h=16, w=16, cin=128, cout=3),         # conv_out shape
    ]
    for case in cases:
        for act in (True, False):
            args = _inputs(rng, **case)
            want = norm_conv_reference(*args, act_swish=act)
            got = _norm_conv_forward(*args, act_swish=act, interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4,
                err_msg=f"{case} act={act}")


def test_kernel_row_and_cout_blocking(rng):
    """Forcing small bh (halo rows between blocks) and co_blk must not
    change the result."""
    args = _inputs(rng, b=2, h=16, w=16, cin=128, cout=256)
    want = norm_conv_reference(*args, act_swish=True)
    for bh, co in [(4, 128), (2, 256), (8, 128), (16, 256)]:
        got = _norm_conv_forward(*args, act_swish=True, interpret=True,
                                 bh=bh, co_blk=co)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4,
                                   err_msg=f"bh={bh} co={co}")


def _plain_inputs(rng, b=2, h=16, w=16, cin=128, cout=128,
                  dtype=jnp.float32):
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), dtype)
    gs = jnp.asarray(rng.normal(1.0, 0.1, cin), jnp.float32)
    gb = jnp.asarray(rng.normal(0.0, 0.1, cin), jnp.float32)
    cw = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.05, jnp.float32)
    cb = jnp.asarray(rng.normal(size=cout) * 0.1, jnp.float32)
    return x, gs, gb, cw, cb


def test_plain_kernel_matches_reference_shapes(rng):
    """GroupNorm(+swish)+conv kernel (modulate=False, encoder blocks) ==
    the XLA composition over blocking/shape variants."""
    cases = [
        dict(b=2, h=16, w=16, cin=128, cout=128),       # square
        dict(b=1, h=8, w=32, cin=128, cout=256),        # cin != cout
        dict(b=2, h=16, w=16, cin=256, cout=4),         # encoder conv_out
    ]
    for case in cases:
        for act in (True, False):
            args = _plain_inputs(rng, **case)
            want = group_norm_conv_reference(*args, act_swish=act)
            got = _group_norm_conv_forward(*args, act_swish=act,
                                           interpret=True)
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), atol=2e-4, rtol=2e-4,
                err_msg=f"{case} act={act}")
    # row blocking across halo boundaries
    args = _plain_inputs(rng, b=2, h=16, w=16, cin=128, cout=128)
    want = group_norm_conv_reference(*args, act_swish=True)
    for bh in (2, 4, 8):
        got = _group_norm_conv_forward(*args, act_swish=True,
                                       interpret=True, bh=bh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=2e-4, rtol=2e-4, err_msg=f"bh={bh}")


def test_plain_gradients_match_reference(rng):
    args = _plain_inputs(rng, b=1, h=8, w=16, cin=128, cout=128)
    fused = _make_group_norm_conv(True, interpret=True)

    def loss(fn, *a):
        return jnp.sum(jnp.square(fn(*a).astype(jnp.float32)))

    gf = jax.grad(lambda *a: loss(fused, *a), argnums=tuple(range(5)))(*args)
    gr = jax.grad(lambda *a: loss(
        lambda *b: group_norm_conv_reference(*b, act_swish=True), *a),
        argnums=tuple(range(5)))(*args)
    for i, (a, b) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=f"arg {i}")


def test_encoder_block_fused_wiring(rng, monkeypatch):
    """Plain (encoder-style) ResnetBlock fused branch == unfused branch
    with the same params, via the interpret escape."""
    from control_gic_tpu.models.blocks import ResnetBlock

    x = jnp.asarray(rng.normal(size=(1, 8, 16, 128)), jnp.float32)

    block = ResnetBlock(out_channels=256, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    want = block.apply(params, x)

    monkeypatch.setenv("CONTROL_GIC_NORM_CONV", "interpret")
    params_f = block.init(jax.random.PRNGKey(0), x)
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), params, params_f))
    assert same, "fused path must create the identical param tree"
    got = block.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_encoder_midhead_fused_wiring(rng, monkeypatch):
    """Encoder _MidHead (norm_out -> swish -> conv_out) fused == unfused."""
    from control_gic_tpu.models.encoder import _MidHead

    x = jnp.asarray(rng.normal(size=(1, 8, 16, 128)), jnp.float32)
    head = _MidHead(z_channels=4, dropout=0.0, dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    want = head.apply(params, x)

    monkeypatch.setenv("CONTROL_GIC_NORM_CONV", "interpret")
    params_f = head.init(jax.random.PRNGKey(0), x)
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), params, params_f))
    assert same, "fused path must create the identical param tree"
    got = head.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_gradients_match_reference(rng):
    """custom-VJP grads == grads of the unfused composition (identical by
    construction: the backward recomputes through the reference)."""
    args = _inputs(rng, b=1, h=8, w=16, cin=128, cout=128)
    fused = _make_norm_conv(True, interpret=True)

    def loss(fn, *a):
        return jnp.sum(jnp.square(fn(*a).astype(jnp.float32)))

    gf = jax.grad(lambda *a: loss(fused, *a), argnums=tuple(range(10)))(*args)
    gr = jax.grad(lambda *a: loss(
        lambda *b: norm_conv_reference(*b, act_swish=True), *a),
        argnums=tuple(range(10)))(*args)
    for i, (a, b) in enumerate(zip(gf, gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4, err_msg=f"arg {i}")


def test_admissibility_gate(rng):
    assert admissible((2, 16, 16, 128), 128)
    assert admissible((2, 64, 64, 512), 3)
    assert not admissible((2, 16, 16, 96), 128)      # C not lane-aligned
    assert not admissible((2, 16, 12, 128), 128)     # W not sublane-aligned
    assert not admissible((2, 16, 16, 128), 192)     # Cout not blockable
    # inadmissible shapes fall back to the reference silently
    args = _inputs(rng, cin=128, cout=128, w=12)
    got = spatial_norm_conv(*args, act_swish=True)
    want = norm_conv_reference(*args, act_swish=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_resnet_block_fused_wiring(rng, monkeypatch):
    """ResnetBlock/decoder fused branch (param wiring, zq resize reuse)
    == unfused branch with the same params, via the interpret escape."""
    from control_gic_tpu.models.blocks import ResnetBlock

    x = jnp.asarray(rng.normal(size=(1, 8, 16, 128)), jnp.float32)
    zq = jnp.asarray(rng.normal(size=(1, 8, 16, 4)), jnp.float32)

    block = ResnetBlock(out_channels=256, zq_cond=True, dtype=jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x, zq)
    want = block.apply(params, x, zq)

    monkeypatch.setenv("CONTROL_GIC_NORM_CONV", "interpret")
    params_f = block.init(jax.random.PRNGKey(0), x, zq)
    chex_equal = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), params, params_f))
    assert chex_equal, "fused path must create the identical param tree"
    got = block.apply(params, x, zq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_res_moments_kernel_matches_reference(rng):
    """The stats-in-epilogue building block (norm+conv+residual with the
    next norm's moments emitted): kernel == reference composition for
    output AND moments, across row blocking."""
    from control_gic_tpu.ops.norm_conv import (
        _chain_forward, norm_conv_res_moments_reference)

    for h, w in [(16, 16), (32, 16)]:
        args = _inputs(rng, h=h, w=w)
        res = jnp.asarray(rng.normal(size=args[0].shape), args[0].dtype)
        want_out, want_mom = norm_conv_res_moments_reference(
            *args, res, act_swish=True)
        got_out, got_mom = _chain_forward(
            *args, res, None, act_swish=True, emit_mom=True,
            interpret=True)
        np.testing.assert_allclose(got_out, want_out, atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(got_mom, want_mom, atol=2e-3, rtol=1e-5)


def test_chain_kernel_variants_match_reference(rng):
    """Every static chain-kernel configuration (res x stats x moments)
    == the reference composition."""
    from control_gic_tpu.ops.fused_norm import _gn_stats
    from control_gic_tpu.ops.norm_conv import _chain_forward, chain_reference

    args = _inputs(rng, h=16, w=16)
    x = args[0]
    res = jnp.asarray(rng.normal(size=x.shape), x.dtype)
    mean, rstd = _gn_stats(x, 32)
    cg = x.shape[-1] // 32
    stats = (jnp.repeat(mean, cg, axis=1), jnp.repeat(rstd, cg, axis=1))
    for r in (None, res):
        for st in (None, stats):
            for em in (False, True):
                want = chain_reference(*args, res=r, stats=st,
                                       act_swish=True, emit_mom=em)
                got = _chain_forward(*args, r, st, act_swish=True,
                                     emit_mom=em, interpret=True)
                if em:
                    np.testing.assert_allclose(got[0], want[0],
                                               atol=2e-5, rtol=1e-5)
                    np.testing.assert_allclose(got[1], want[1],
                                               atol=2e-3, rtol=1e-5)
                else:
                    np.testing.assert_allclose(got, want,
                                               atol=2e-5, rtol=1e-5)


def test_chain_stats_consumption_matches_direct(rng):
    """Feeding a block's emitted moments to the next op's stats equals
    computing the stats directly from the tensor (the chaining
    contract, through stats_from_moments)."""
    from control_gic_tpu.ops.norm_conv import (chain_reference,
                                               spatial_norm_conv_mom,
                                               stats_from_moments)

    args = _inputs(rng, h=16, w=16)
    res = jnp.asarray(rng.normal(size=args[0].shape), args[0].dtype)
    h1, mom = spatial_norm_conv_mom(*args, res=res, emit_mom=True,
                                    use_fused=False)
    args2 = (h1,) + args[1:]
    stats = stats_from_moments(mom, h1.shape[1] * h1.shape[2])
    got = chain_reference(*args2, stats=stats, emit_mom=False)
    want = chain_reference(*args2, stats=None, emit_mom=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-4)


def test_res_moments_gradients_match_reference(rng):
    """custom-VJP backward (reference recompute) == direct grads of the
    reference, including gradient flow THROUGH the emitted moments."""
    from control_gic_tpu.ops.norm_conv import (
        _chain_custom, norm_conv_res_moments_reference)

    args = _inputs(rng, h=16, w=16)
    res = jnp.asarray(rng.normal(size=args[0].shape), args[0].dtype)
    fused = _chain_custom(True, True, False, True, True)

    def loss_f(f):
        def inner(*a):
            out, mom = f(*a)
            return jnp.sum(out * out) + 1e-3 * jnp.sum(mom)
        return inner

    g_ref = jax.grad(loss_f(lambda *a: norm_conv_res_moments_reference(
        *a, act_swish=True)), argnums=(0, 1, 8, 10))(*args, res)
    g_fus = jax.grad(loss_f(fused), argnums=(0, 1, 8, 10))(*args, res)
    for a, b in zip(g_ref, g_fus):
        np.testing.assert_allclose(b, a, atol=5e-4, rtol=1e-4)


def test_res_moments_public_op_fallback(rng):
    """spatial_norm_conv_res_moments: reference path off-TPU; moments
    equal a direct stats pass over the output (the chaining contract)."""
    from control_gic_tpu.ops.norm_conv import spatial_norm_conv_res_moments

    args = _inputs(rng, h=16, w=16)
    res = jnp.asarray(rng.normal(size=args[0].shape), args[0].dtype)
    out, mom = spatial_norm_conv_res_moments(*args, res)
    of = np.asarray(out, np.float32)
    np.testing.assert_allclose(mom[:, 0], of.sum(axis=(1, 2)), rtol=1e-5)
    np.testing.assert_allclose(mom[:, 1], (of * of).sum(axis=(1, 2)),
                               rtol=1e-5)


def test_resnet_block_chained_wiring(rng, monkeypatch):
    """ResnetBlock mom_in/emit_mom chained path == the plain block with
    the same params, and the emitted moments match a direct stats pass
    over the output (interpret-mode kernels)."""
    from control_gic_tpu.models.blocks import ResnetBlock

    x = jnp.asarray(rng.normal(size=(1, 16, 16, 128)), jnp.float32)
    zq = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32)
    blk = ResnetBlock(zq_cond=True)
    params = blk.init(jax.random.PRNGKey(0), x, zq)
    want = blk.apply(params, x, zq)

    monkeypatch.setenv("CONTROL_GIC_CHAIN", "interpret")
    got, mom = blk.apply(params, x, zq, emit_mom=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)
    of = np.asarray(got, np.float32)
    np.testing.assert_allclose(mom[:, 0], of.sum(axis=(1, 2)),
                               atol=1e-2, rtol=1e-4)
    # consuming those moments in the next block == direct stats
    want2 = blk.apply(params, jnp.asarray(want), zq)
    got2 = blk.apply(params, got, zq, mom_in=mom)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               atol=5e-4, rtol=2e-4)


def test_decoder_chained_trunk_wiring(rng, monkeypatch):
    """Full Decoder with CONTROL_GIC_CHAIN=interpret (moments threaded
    block-to-block through every non-attention trunk level and into
    norm_out) == the plain XLA decoder with the same params."""
    from control_gic_tpu.models.decoder import Decoder

    dec = Decoder(ch=128, ch_mult=(1, 2), num_res_blocks=1,
                  attn_resolutions=(), resolution=32)
    z = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32)
    zq = jnp.asarray(rng.normal(size=(1, 16, 16, 4)), jnp.float32)
    m_c = np.zeros((1, 4, 4), np.int32)
    m_c[0, :2] = 1
    m_m = np.zeros((1, 8, 8), np.int32)
    m_m[0, 4:6] = 1
    m_f = 1 - m_m.repeat(2, 1).repeat(2, 2) - m_c.repeat(4, 1).repeat(4, 2)
    masks = tuple(jnp.asarray(m) for m in (m_c, m_m, m_f))
    params = dec.init(jax.random.PRNGKey(1), z, zq, masks)
    want = dec.apply(params, z, zq, masks)

    monkeypatch.setenv("CONTROL_GIC_CHAIN", "interpret")
    got = dec.apply(params, z, zq, masks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=2e-4)


def test_plain_chain_kernel_variants_match_reference(rng):
    """The GroupNorm (encoder-side, modulate=False) chain kernel ==
    plain_chain_reference across res x stats x moments configs."""
    from control_gic_tpu.ops.fused_norm import _gn_stats
    from control_gic_tpu.ops.norm_conv import (_chain_forward_impl,
                                               plain_chain_reference)

    x, gs, gb, cw, cb = _plain_inputs(rng, h=16, w=16)
    res = jnp.asarray(rng.normal(size=x.shape), x.dtype)
    mean, rstd = _gn_stats(x, 32)
    cg = x.shape[-1] // 32
    stats = (jnp.repeat(mean, cg, axis=1), jnp.repeat(rstd, cg, axis=1))
    for r in (None, res):
        for st in (None, stats):
            for em in (False, True):
                want = plain_chain_reference(x, gs, gb, cw, cb, res=r,
                                             stats=st, act_swish=True,
                                             emit_mom=em)
                got = _chain_forward_impl(
                    x, None, gs, gb, None, None, None, None, cw, cb, r,
                    st, act_swish=True, emit_mom=em, modulate=False,
                    interpret=True)
                if em:
                    np.testing.assert_allclose(got[0], want[0],
                                               atol=2e-5, rtol=1e-5)
                    np.testing.assert_allclose(got[1], want[1],
                                               atol=2e-3, rtol=1e-5)
                else:
                    np.testing.assert_allclose(got, want,
                                               atol=2e-5, rtol=1e-5)


def test_encoder_chained_trunk_wiring(rng, monkeypatch):
    """Full Encoder with CONTROL_GIC_CHAIN=interpret (GroupNorm moments
    threaded across trunk blocks) == the plain XLA encoder."""
    from control_gic_tpu.models.encoder import Encoder

    enc = Encoder(ch=128, ch_mult=(1, 2, 2), num_res_blocks=2,
                  attn_resolutions=(), resolution=32, z_channels=4)
    x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)), jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), x)
    want = enc.apply(params, x)

    monkeypatch.setenv("CONTROL_GIC_CHAIN", "interpret")
    got = enc.apply(params, x)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   atol=5e-4, rtol=2e-4)
