"""Fused SpatialNorm: jnp reference == flax composition == Pallas kernel.

The Pallas path runs in interpret mode here (CPU suite); on TPU the same
kernel compiles natively. The custom-VJP plumbing is validated by
differentiating the interpret-mode fused op against the reference formula.
"""
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from control_gic_tpu.ops.fused_norm import (_fused_forward, _make_fused,
                                            group_norm_reference,
                                            spatial_norm_reference)


def _inputs(rng, b=2, h=8, w=8, c=64, z=4, dtype=jnp.float32):
    f = jnp.asarray(rng.normal(size=(b, h, w, c)), dtype)
    zq = jnp.asarray(rng.normal(size=(b, h, w, z)), dtype)
    gs = jnp.asarray(rng.normal(1.0, 0.1, c), jnp.float32)
    gb = jnp.asarray(rng.normal(0.0, 0.1, c), jnp.float32)
    wy = jnp.asarray(rng.normal(size=(z, c)) * 0.3, jnp.float32)
    by = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
    wb = jnp.asarray(rng.normal(size=(z, c)) * 0.3, jnp.float32)
    bb = jnp.asarray(rng.normal(size=c) * 0.1, jnp.float32)
    return f, zq, gs, gb, wy, by, wb, bb


def test_group_norm_reference_matches_flax(rng):
    x = jnp.asarray(rng.normal(2.0, 3.0, (2, 8, 8, 64)), jnp.float32)
    gs = jnp.asarray(rng.normal(1.0, 0.1, 64), jnp.float32)
    gb = jnp.asarray(rng.normal(0.0, 0.1, 64), jnp.float32)
    mod = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                       param_dtype=jnp.float32)
    want = mod.apply({"params": {"scale": gs, "bias": gb}}, x)
    got = group_norm_reference(x, gs, gb)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_reference_matches_flax_composition(rng):
    """spatial_norm_reference == GroupNorm + two 1x1 Convs + modulation."""
    f, zq, gs, gb, wy, by, wb, bb = _inputs(rng)
    normed = group_norm_reference(f, gs, gb)
    y = jnp.einsum("bhwz,zc->bhwc", zq, wy) + by
    bm = jnp.einsum("bhwz,zc->bhwc", zq, wb) + bb
    want = normed * y + bm
    got = spatial_norm_reference(f, zq, gs, gb, wy, by, wb, bb,
                                 act_swish=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_pallas_kernel_matches_reference(rng):
    for act in (False, True):
        for c in (64, 128):
            f, zq, gs, gb, wy, by, wb, bb = _inputs(rng, c=c)
            want = spatial_norm_reference(f, zq, gs, gb, wy, by, wb, bb,
                                          act_swish=act)
            got = _fused_forward(f, zq, gs, gb, wy, by, wb, bb, act,
                                 interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5, rtol=1e-5)


def test_pallas_kernel_bf16(rng):
    f, zq, gs, gb, wy, by, wb, bb = _inputs(rng, dtype=jnp.bfloat16)
    want = spatial_norm_reference(f, zq, gs, gb, wy, by, wb, bb,
                                  act_swish=True)
    got = _fused_forward(f, zq, gs, gb, wy, by, wb, bb, True,
                         interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_stats_only_path_matches_reference(rng):
    for act in (False, True):
        f, zq, gs, gb, wy, by, wb, bb = _inputs(rng, c=64)
        want = spatial_norm_reference(f, zq, gs, gb, wy, by, wb, bb,
                                      act_swish=act)
        fn = _make_fused(act, interpret=True, stats_only=True)
        got = fn(f, zq, gs, gb, wy, by, wb, bb)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_custom_vjp_grads_match_reference(rng):
    f, zq, gs, gb, wy, by, wb, bb = _inputs(rng, b=1, h=4, w=4, c=32)
    fused = _make_fused(True, interpret=True)
    args = (f, zq, gs, gb, wy, by, wb, bb)

    loss_fused = lambda *a: jnp.sum(jnp.square(fused(*a)))
    loss_ref = lambda *a: jnp.sum(jnp.square(
        spatial_norm_reference(*a, act_swish=True)))
    g_fused = jax.grad(loss_fused, argnums=tuple(range(8)))(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=1e-4, rtol=1e-3)


def test_spatial_norm_module_unchanged_tree(rng):
    """SpatialNorm keeps the param tree (norm_layer/conv_y/conv_b) and its
    unfused output equals the raw reference formula."""
    from control_gic_tpu.models.blocks import SpatialNorm
    f = jnp.asarray(rng.normal(size=(1, 8, 8, 64)), jnp.float32)
    zq = jnp.asarray(rng.normal(size=(1, 4, 4, 4)), jnp.float32)
    mod = SpatialNorm()
    v = mod.init(jax.random.PRNGKey(0), f, zq)
    p = v["params"]
    assert set(p) == {"norm_layer", "conv_y", "conv_b"}
    assert p["conv_y"]["kernel"].shape == (1, 1, 4, 64)
    out = mod.apply(v, f, zq, act="swish")
    zq_r = jnp.repeat(jnp.repeat(zq, 2, 1), 2, 2)
    want = spatial_norm_reference(
        f, zq_r, p["norm_layer"]["scale"], p["norm_layer"]["bias"],
        p["conv_y"]["kernel"][0, 0], p["conv_y"]["bias"],
        p["conv_b"]["kernel"][0, 0], p["conv_b"]["bias"], act_swish=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
