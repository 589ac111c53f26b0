"""Partition-map renderers, discriminator norm variants, simple metrics."""
import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.models.discriminator import (ActNorm, NLayerDiscriminator,
                                                  actnorm_data_init)
from control_gic_tpu.utils.draw import (COLOR_DICT, draw_partition_map,
                                        draw_partition_map_color)


def test_draw_partition_map_lines(rng):
    imgs = rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32) + 0.1
    idx = np.full((1, 16, 16), 2, np.int64)        # all fine
    out = draw_partition_map(imgs, idx, line_value=0.0)
    # every fine-cell border row/col is painted
    assert (out[0, ::4, :, :] == 0.0).all()
    assert (out[0, :, ::4, :] == 0.0).all()
    # interior pixels untouched
    assert (out[0, 1, 1] == imgs[0, 1, 1]).all()


def test_draw_color_blend_extremes(rng):
    imgs = rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32)
    idx = np.zeros((2, 8, 8), np.int64)
    idx[1, :, :] = 2
    out = draw_partition_map_color(imgs, idx, scaler=1.0)
    assert out.shape == (2, 32, 32, 3)
    # scaler=1: pure colormap; index 0 -> low color, 2 -> high color
    low = np.asarray(COLOR_DICT["blue"], np.float32) / 255.0
    high = np.asarray(COLOR_DICT["red"], np.float32) / 255.0
    np.testing.assert_allclose(out[0, 0, 0], low, atol=1e-6)
    np.testing.assert_allclose(out[1, 0, 0], high, atol=1e-6)
    # scaler=0: min-max normalized image only
    out0 = draw_partition_map_color(imgs, idx, scaler=0.0)
    assert abs(out0[0].min()) < 1e-6 and abs(out0[0].max() - 1.0) < 1e-6


def test_simple_metrics(rng):
    from control_gic_tpu.utils.metrics import dssim, l2, psnr, ssim
    a = rng.uniform(0, 1, (32, 32, 3))
    assert psnr(a, a) == float("inf")
    assert l2(a, a) == 0.0
    assert abs(ssim(a, a) - 1.0) < 1e-12
    assert abs(dssim(a, a)) < 1e-12
    b = np.clip(a + rng.normal(0, 0.1, a.shape), 0, 1)
    assert 0.0 < ssim(a, b) < 1.0
    assert 0.0 < dssim(a, b) < 0.5
    assert l2(a, b) > 0
    # DSSIM ordering: more noise -> larger dissimilarity
    c = np.clip(a + rng.normal(0, 0.3, a.shape), 0, 1)
    assert dssim(a, c) > dssim(a, b)


def test_actnorm_identity_init_and_data_init(rng):
    x = jnp.asarray(rng.normal(3.0, 2.0, (4, 8, 8, 5)), jnp.float32)
    mod = ActNorm()
    variables = mod.init(jax.random.PRNGKey(0), x)
    # default params: identity transform
    np.testing.assert_allclose(np.asarray(mod.apply(variables, x)),
                               np.asarray(x), rtol=1e-6)
    # data init (reference util.py:22-41): output ~ zero mean, unit std
    loc, scale = actnorm_data_init(x)
    y = np.asarray(scale * (x + loc)).reshape(-1, 5)
    np.testing.assert_allclose(y.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(0, ddof=1), 1.0, atol=1e-3)


def test_discriminator_actnorm_variant(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    disc = NLayerDiscriminator(ndf=16, n_layers=2, use_actnorm=True)
    variables = disc.init(jax.random.PRNGKey(0), x)
    # ActNorm variant: no batch_stats collection, convs keep their bias
    assert "batch_stats" not in variables
    assert "bias" in variables["params"]["conv1"]
    out = disc.apply(variables, x, train=True)
    # 32 -> conv0 s2 -> 16 -> conv1 s2 -> 8 -> two k4 s1 p1 convs -> 6
    assert out.shape == (2, 6, 6, 1)
    assert np.isfinite(np.asarray(out)).all()

    # BatchNorm variant unchanged: biasless inner convs + batch_stats
    disc_bn = NLayerDiscriminator(ndf=16, n_layers=2)
    v_bn = disc_bn.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in v_bn
    assert "bias" not in v_bn["params"]["conv1"]
