"""Unit tests for the numerics core against independent NumPy oracles."""
import numpy as np
import jax.numpy as jnp

from control_gic_tpu.ops import (
    nearest_resize, upsample_nearest, avg_pool, patch_entropy,
    triple_grain_router, grain_indices_from_masks,
    vq_lookup, vq_quantize, upsample2_conv3x3,
)


# ---------------------------------------------------------------- resample

def np_nearest(x, oh, ow):
    ih = (np.arange(oh) * x.shape[1]) // oh
    iw = (np.arange(ow) * x.shape[2]) // ow
    return x[:, ih][:, :, iw]


def test_nearest_resize_up_down(rng):
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    for oh, ow in [(16, 16), (32, 32), (128, 128), (256, 256), (48, 80)]:
        got = np.asarray(nearest_resize(jnp.asarray(x), oh, ow))
        np.testing.assert_array_equal(got, np_nearest(x, oh, ow))


def test_upsample_matches_resize(rng):
    x = rng.normal(size=(1, 16, 16)).astype(np.float32)
    up = np.asarray(upsample_nearest(jnp.asarray(x), 4))
    assert up.shape == (1, 64, 64)
    np.testing.assert_array_equal(
        up, np.asarray(nearest_resize(jnp.asarray(x), 64, 64)))
    # repeat semantics
    np.testing.assert_array_equal(up[0, :4, :4], np.full((4, 4), x[0, 0, 0]))


def test_avg_pool(rng):
    x = rng.normal(size=(2, 64, 64, 5)).astype(np.float32)
    got = np.asarray(avg_pool(jnp.asarray(x), 4))
    want = x.reshape(2, 16, 4, 16, 4, 5).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def _direct_up2_conv(x, k, b):
    import jax
    up = upsample_nearest(x, 2)
    out = jax.lax.conv_general_dilated(
        up, k, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + b


def test_upsample2_conv3x3_matches_direct(rng):
    """The subpixel reformulation is the same function as up2 -> 3x3 SAME
    conv (only f32 reassociation of summed kernel taps differs)."""
    for (n, h, w, c, co) in [(2, 8, 8, 16, 16), (1, 7, 5, 8, 12),
                             (1, 16, 24, 32, 32)]:
        x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(3, 3, c, co)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32))
        want = np.asarray(_direct_up2_conv(x, k, b))
        got = np.asarray(upsample2_conv3x3(x, k, b))
        assert got.shape == (n, 2 * h, 2 * w, co)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_upsample2_conv3x3_grad_matches(rng):
    import jax
    x = jnp.asarray(rng.normal(size=(1, 6, 6, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, 8, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
    g_sub = jax.grad(lambda *a: jnp.sum(jnp.tanh(
        upsample2_conv3x3(*a))), argnums=(0, 1, 2))(x, k, b)
    g_dir = jax.grad(lambda *a: jnp.sum(jnp.tanh(
        _direct_up2_conv(*a))), argnums=(0, 1, 2))(x, k, b)
    for gs, gd in zip(g_sub, g_dir):
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gd),
                                   rtol=2e-4, atol=2e-5)


def test_upsample_module_flag_paths_agree(rng, monkeypatch):
    """Upsample's subpixel and direct paths share one param tree and one
    function value."""
    import jax
    from control_gic_tpu.models.blocks import Upsample

    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    monkeypatch.setenv("CONTROL_GIC_SUBPIXEL", "0")
    v_dir = Upsample().init(jax.random.PRNGKey(0), x)
    y_dir = Upsample().apply(v_dir, x)
    monkeypatch.delenv("CONTROL_GIC_SUBPIXEL")
    v_sub = Upsample().init(jax.random.PRNGKey(0), x)
    y_sub = Upsample().apply(v_sub, x)
    assert jax.tree_util.tree_structure(v_dir) == \
        jax.tree_util.tree_structure(v_sub)
    for a, b in zip(jax.tree_util.tree_leaves(v_dir),
                    jax.tree_util.tree_leaves(v_sub)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(y_sub), np.asarray(y_dir),
                               rtol=2e-5, atol=2e-5)


# ----------------------------------------------------------------- entropy

def np_patch_entropy(x, p):
    b, h, w, _ = x.shape
    gray = 0.2989 * x[..., 0] + 0.5870 * x[..., 1] + 0.1140 * x[..., 2]
    pt = gray.reshape(b, h // p, p, w // p, p).transpose(0, 1, 3, 2, 4)
    pt = pt.reshape(b, h // p, w // p, p * p)
    bins = np.linspace(-1, 1, 32, dtype=np.float64)
    kern = np.exp(-0.5 * ((pt[..., None] - bins) / 0.01) ** 2)
    pdf = kern.mean(axis=-2)
    pdf = pdf / (pdf.sum(-1, keepdims=True) + 1e-40) + 1e-40
    return -(pdf * np.log(pdf)).sum(-1)


def test_patch_entropy_oracle(rng):
    x = rng.uniform(-1, 1, size=(2, 64, 64, 3)).astype(np.float32)
    for p in (8, 16):
        got = np.asarray(patch_entropy(jnp.asarray(x), p))
        assert got.shape == (2, 64 // p, 64 // p)
        assert np.isfinite(got).all()
        # f64 oracle: checks the math to the precision f32 compute allows
        want64 = np_patch_entropy(x.astype(np.float64), p)
        np.testing.assert_allclose(got, want64, rtol=2e-2, atol=2e-2)
        # f32 oracle: same precision, tight tolerance
        want32 = np_patch_entropy32(x, p)
        np.testing.assert_allclose(got, want32, rtol=2e-4, atol=2e-4)


def np_patch_entropy32(x, p):
    b, h, w, _ = x.shape
    f = np.float32
    gray = (f(0.2989) * x[..., 0] + f(0.5870) * x[..., 1]
            + f(0.1140) * x[..., 2]).astype(f)
    pt = gray.reshape(b, h // p, p, w // p, p).transpose(0, 1, 3, 2, 4)
    pt = pt.reshape(b, h // p, w // p, p * p)
    bins = np.linspace(-1, 1, 32, dtype=f)
    kern = np.exp(f(-0.5) * ((pt[..., None] - bins) / f(0.01)) ** 2).astype(f)
    pdf = kern.mean(axis=-2, dtype=f)
    pdf = (pdf / (pdf.sum(-1, keepdims=True, dtype=f) + f(1e-40))).astype(f)
    out = np.where(pdf > 1e-37, pdf * np.log(np.maximum(pdf, f(1e-37))), f(0))
    return -out.sum(-1, dtype=f)


def test_patch_entropy_flat_patch_low_entropy():
    # A constant patch concentrates mass in one bin -> near-zero entropy;
    # uniform noise spreads mass -> higher entropy.
    x = np.zeros((1, 32, 32, 3), dtype=np.float32)
    x[:, 16:, :, :] = np.random.default_rng(1).uniform(-1, 1, (1, 16, 32, 3))
    e = np.asarray(patch_entropy(jnp.asarray(x), 16))
    # constant patch at 0 splits mass over the two nearest bins -> ~ln 2
    assert e[0, 0, 0] < 0.8
    assert e[0, 1, 0] > 1.5
    assert e[0, 1, 0] > e[0, 0, 0] + 0.5


# ------------------------------------------------------------------ router

def np_router_mode0(e16, e8, rc, rm):
    """Independent oracle for the dense mode-0 path."""
    up2 = lambda m: m.repeat(2, axis=1).repeat(2, axis=2)
    up4 = lambda m: m.repeat(4, axis=1).repeat(4, axis=2)
    n16 = e16.size
    n8 = e8.size
    k_c = round(n16 * rc)
    thr_c = np.sort(e16.reshape(-1))[k_c - 1 if k_c else 0]
    gate_c = e16 < thr_c
    not_c = ~up2(gate_c)
    masked8 = e8 * not_c
    k_m = round(4 * n16 * rc + n8 * rm)
    thr_m = np.sort(masked8.reshape(-1))[k_m - 1 if k_m else 0]
    gate_m = (e8 < thr_m) & not_c
    gate_f = ~(up4(gate_c) | up2(gate_m))
    return gate_c.astype(np.int32), gate_m.astype(np.int32), gate_f.astype(np.int32)


def test_router_mode0_oracle(rng):
    e16 = rng.uniform(0, 4, size=(1, 16, 16)).astype(np.float32)
    e8 = rng.uniform(0, 4, size=(1, 32, 32)).astype(np.float32)
    out = triple_grain_router(jnp.asarray(e16), jnp.asarray(e8), 0.1, 0.4)
    oc, om, of = np_router_mode0(e16, e8, 0.1, 0.4)
    assert out.mode == 0
    np.testing.assert_array_equal(np.asarray(out.mask_coarse), oc)
    np.testing.assert_array_equal(np.asarray(out.mask_medium), om)
    np.testing.assert_array_equal(np.asarray(out.mask_fine), of)


def test_router_partition_of_unity(rng):
    """coarse*16 + medium*4 + fine pixel coverage must tile the fine grid."""
    e16 = rng.uniform(0, 4, size=(2, 16, 16)).astype(np.float32)
    e8 = rng.uniform(0, 4, size=(2, 32, 32)).astype(np.float32)
    for rc, rm in [(0.1, 0.4), (0.0, 0.8), (0.3, 0.0), (0.5, 0.5),
                   (1.0, 0.0), (0.0, 1.0), (0.0, 0.0), (0.301, 0.599)]:
        out = triple_grain_router(jnp.asarray(e16), jnp.asarray(e8), rc, rm)
        cover = (np.asarray(upsample_nearest(out.mask_coarse, 4))
                 + np.asarray(upsample_nearest(out.mask_medium, 2))
                 + np.asarray(out.mask_fine))
        np.testing.assert_array_equal(cover, np.ones_like(cover))


def test_router_modes():
    e16 = jnp.zeros((1, 16, 16))
    e8 = jnp.zeros((1, 32, 32))
    cases = {
        (0.1, 0.4): 0, (0.0, 0.8): 1, (0.3, 0.0): 2, (0.5, 0.5): 3,
        (1.0, 0.0): 4, (0.0, 1.0): 5, (0.0, 0.0): 6,
    }
    for (rc, rm), want in cases.items():
        assert triple_grain_router(e16, e8, rc, rm).mode == want


def test_router_ratio_realization(rng):
    """Requested (0.1, 0.4) on tie-free entropies: realized counts come out
    close to the requested ratios (survey notes slight deviation only on
    ties; random floats are tie-free)."""
    e16 = rng.uniform(0, 4, size=(1, 16, 16)).astype(np.float32)
    e8 = rng.uniform(0, 4, size=(1, 32, 32)).astype(np.float32)
    out = triple_grain_router(jnp.asarray(e16), jnp.asarray(e8), 0.1, 0.4)
    nc = int(np.asarray(out.mask_coarse).sum())
    nm = int(np.asarray(out.mask_medium).sum())
    # strict < of the k-th smallest -> k-1 items below (tie-free)
    assert nc == round(256 * 0.1) - 1
    assert nc * 4 + nm == round(4 * 256 * 0.1 + 1024 * 0.4) - 1


def test_grain_indices(rng):
    e16 = rng.uniform(0, 4, size=(1, 16, 16)).astype(np.float32)
    e8 = rng.uniform(0, 4, size=(1, 32, 32)).astype(np.float32)
    out = triple_grain_router(jnp.asarray(e16), jnp.asarray(e8), 0.1, 0.4)
    idx = np.asarray(grain_indices_from_masks(out))
    assert idx.shape == (1, 64, 64)
    assert set(np.unique(idx)) <= {0, 1, 2}
    # fine positions marked 2, coarse 0, medium 1
    np.testing.assert_array_equal(
        (idx == 2).astype(np.int32), np.asarray(out.mask_fine))


# --------------------------------------------------------------------- VQ

def test_vq_lookup_bruteforce(rng):
    z = rng.normal(size=(2, 8, 8, 4)).astype(np.float32)
    cb = rng.normal(size=(64, 4)).astype(np.float32)
    got = np.asarray(vq_lookup(jnp.asarray(z), jnp.asarray(cb)))
    d = ((z.reshape(-1, 1, 4) - cb.reshape(1, -1, 4)) ** 2).sum(-1)
    want = d.argmin(-1).reshape(2, 8, 8)
    np.testing.assert_array_equal(got, want)


def test_vq_tie_break_first_index():
    cb = jnp.asarray(np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32))
    z = jnp.asarray(np.array([[[[1.0, 0.0]]]], np.float32))
    assert int(vq_lookup(z, cb)[0, 0, 0]) == 0


def test_vq_quantize_counts_and_loss(rng):
    z = rng.normal(size=(1, 4, 4, 4)).astype(np.float32)
    cb = rng.normal(size=(16, 4)).astype(np.float32)
    res = vq_quantize(jnp.asarray(z), jnp.asarray(cb))
    assert int(res.counts.sum()) == 16
    hist = np.bincount(np.asarray(res.indices).reshape(-1), minlength=16)
    np.testing.assert_array_equal(np.asarray(res.counts), hist)
    zq = np.asarray(res.z_q)
    np.testing.assert_allclose(
        zq.reshape(-1, 4), cb[np.asarray(res.indices).reshape(-1)], rtol=1e-6)
    d = ((z.reshape(-1, 4) - zq.reshape(-1, 4)) ** 2).mean()
    np.testing.assert_allclose(float(res.loss), d * 1.25, rtol=1e-5)


def test_vq_straight_through_gradient(rng):
    import jax
    z = jnp.asarray(rng.normal(size=(1, 2, 2, 4)).astype(np.float32))
    cb = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))

    def f(z):
        return jnp.sum(vq_quantize(z, cb).z_q)

    g = jax.grad(f)(z)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(np.asarray(g)))
