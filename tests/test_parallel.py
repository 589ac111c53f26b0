"""Multi-device tests on the virtual 8-device CPU mesh: data-parallel
training step, per-sample routing equivalence, tiled high-res codec."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from control_gic_tpu.models.cgic import CGIC, CGICConfig
from control_gic_tpu.ops import triple_grain_router
from control_gic_tpu.parallel.mesh import data_sharding, make_mesh, shard_batch

TINY = CGICConfig(n_embed=32, embed_dim=4, z_channels=4, ch=32,
                  ch_mult=(1, 1, 2, 2, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=64)


def test_eight_virtual_devices():
    assert jax.device_count() == 8


def test_per_sample_router_matches_solo(rng):
    """Batched per-sample routing == routing each sample alone (the
    property tile batching relies on)."""
    e16 = rng.uniform(0, 4, size=(3, 4, 4)).astype(np.float32)
    e8 = rng.uniform(0, 4, size=(3, 8, 8)).astype(np.float32)
    batched = triple_grain_router(jnp.asarray(e16), jnp.asarray(e8),
                                  0.1, 0.4, per_sample=True)
    for i in range(3):
        solo = triple_grain_router(jnp.asarray(e16[i:i + 1]),
                                   jnp.asarray(e8[i:i + 1]), 0.1, 0.4)
        np.testing.assert_array_equal(np.asarray(batched.mask_coarse[i]),
                                      np.asarray(solo.mask_coarse[0]))
        np.testing.assert_array_equal(np.asarray(batched.mask_medium[i]),
                                      np.asarray(solo.mask_medium[0]))
        np.testing.assert_array_equal(np.asarray(batched.mask_fine[i]),
                                      np.asarray(solo.mask_fine[0]))


def test_tiled_codec_matches_solo_tiles(rng):
    """Tiled compression of a 128x96 image with 64px tiles: every tile's
    streams equal a solo encode of that tile; stitching reassembles."""
    from control_gic_tpu.codec import CGICCodec
    from control_gic_tpu.parallel.tiling import compress_tiled, tile_grid

    model = CGIC(TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), 0.1, 0.4)
    codec = CGICCodec(model, variables,
                      np.ones(TINY.n_embed, np.int64))
    img = rng.uniform(0, 1, (128, 96, 3)).astype(np.float32)

    rec, bpp, bundles = compress_tiled(codec, img, 0.1, 0.4, tile=64)
    assert rec.shape == img.shape
    assert np.isfinite(rec).all()
    tiles = tile_grid(128, 96, 64)
    assert len(bundles) == len(tiles)

    # solo-tile parity for the first full tile
    y, x, th, tw = tiles[0]
    solo = codec.encode(img[y:y + th, x:x + tw], 0.1, 0.4)
    # find the matching bundle (same grid order)
    assert bundles[0].streams == solo.streams
    # reconstruction patch parity
    rec_solo = codec.decode(solo)
    np.testing.assert_allclose(rec[y:y + th, x:x + tw], rec_solo,
                               atol=1e-5, rtol=1e-5)
    # bpp accounting: totals over original pixels
    total_bits = sum(b.num_bytes * 8 for b in bundles)
    assert bpp == pytest.approx(total_bits / (128 * 96))

    # device-packed tile streams are byte-identical to the host path
    rec_dp, bpp_dp, bundles_dp = compress_tiled(codec, img, 0.1, 0.4,
                                                tile=64, device_pack=True)
    assert bpp_dp == pytest.approx(bpp)
    for a, b in zip(bundles, bundles_dp):
        assert a.streams == b.streams
    np.testing.assert_allclose(rec_dp, rec, atol=1e-5, rtol=1e-5)


def test_tiled_many_matches_per_image(rng):
    """compress_tiled_many (pipelined across shape groups + images) is
    byte- and pixel-identical to compress_tiled per image, mixed sizes."""
    from control_gic_tpu.codec import CGICCodec
    from control_gic_tpu.parallel.tiling import (compress_tiled,
                                                 compress_tiled_many)

    model = CGIC(TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), 0.1, 0.4)
    codec = CGICCodec(model, variables, np.ones(TINY.n_embed, np.int64))
    images = [rng.uniform(0, 1, (128, 96, 3)).astype(np.float32),
              rng.uniform(0, 1, (100, 130, 3)).astype(np.float32),
              rng.uniform(0, 1, (128, 96, 3)).astype(np.float32)]

    many = compress_tiled_many(codec, images, 0.1, 0.4, tile=64,
                               device_pack=True)
    assert len(many) == len(images)
    for img, (rec_m, bpp_m, bundles_m) in zip(images, many):
        rec_1, bpp_1, bundles_1 = compress_tiled(codec, img, 0.1, 0.4,
                                                 tile=64, device_pack=True)
        assert rec_m.shape == img.shape
        assert bpp_m == pytest.approx(bpp_1)
        assert [b.streams for b in bundles_m] == \
            [b.streams for b in bundles_1]
        np.testing.assert_allclose(rec_m, rec_1, atol=1e-5, rtol=1e-5)


def test_tiled_device_matches_tiled(rng):
    """compress_tiled_device (device-side slicing + stitching, threaded,
    wire-minimal) emits byte-identical streams/bpp to compress_tiled and a
    reconstruction equal up to the uint8 PNG quantization."""
    from control_gic_tpu.codec import CGICCodec
    from control_gic_tpu.parallel.tiling import (compress_tiled,
                                                 compress_tiled_device)

    model = CGIC(TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), 0.1, 0.4)
    codec = CGICCodec(model, variables, np.ones(TINY.n_embed, np.int64))
    images = [rng.uniform(0, 1, (128, 96, 3)).astype(np.float32),
              rng.uniform(0, 1, (100, 130, 3)).astype(np.float32)]

    dev = compress_tiled_device(codec, images, 0.1, 0.4, tile=64,
                                out_uint8=False, threads=True)
    assert len(dev) == len(images)
    for img, (rec_d, bpp_d, bundles_d) in zip(images, dev):
        rec_1, bpp_1, bundles_1 = compress_tiled(codec, img, 0.1, 0.4,
                                                 tile=64, device_pack=True)
        assert rec_d.shape == img.shape
        assert bpp_d == pytest.approx(bpp_1)
        assert [b.streams for b in bundles_d] == \
            [b.streams for b in bundles_1]
        np.testing.assert_allclose(rec_d, rec_1, atol=1e-5, rtol=1e-5)

    # uint8 output mode: quantized exactly like cli.common.save_png
    dev8 = compress_tiled_device(codec, images[:1], 0.1, 0.4, tile=64,
                                 out_uint8=True, threads=False)
    rec8 = dev8[0][0]
    assert rec8.dtype == np.uint8
    want = (np.clip(dev[0][0], 0.0, 1.0) * 255).astype(np.uint8)
    diff = np.abs(rec8.astype(np.int16) - want.astype(np.int16))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3

    # the device-unpack receiver variant stays pixel/byte-identical to
    # the host default (round-5 robustness default: host receiver; the
    # device path remains fully supported and covered here)
    host = compress_tiled_device(codec, images, 0.1, 0.4, tile=64,
                                 out_uint8=False, threads=True,
                                 device_unpack=True)
    for (rec_d, bpp_d, bun_d), (rec_h, bpp_h, bun_h) in zip(dev, host):
        assert bpp_d == pytest.approx(bpp_h)
        assert [b.streams for b in bun_d] == [b.streams for b in bun_h]
        np.testing.assert_allclose(rec_d, rec_h, atol=1e-6)


def test_data_parallel_train_step_runs(rng):
    """One fused train step over the 8-device mesh: state advances, metrics
    finite, codebook counters accumulate the global batch."""
    from control_gic_tpu.train import TrainConfig, Trainer, create_train_state

    mesh = make_mesh()
    train_cfg = TrainConfig()
    trainer = Trainer(TINY, train_cfg, mesh=mesh,
                      data_sharding=data_sharding(mesh))
    state = create_train_state(jax.random.PRNGKey(0), TINY, train_cfg,
                               image_size=64)
    batch = rng.uniform(-1, 1, (8, 64, 64, 3)).astype(np.float32)
    x = shard_batch(mesh, batch)
    state, metrics = trainer.train_step(state, x)
    assert int(state.step) == 1
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, v)
    # every latent token counted once: 8 images * 16*16 tokens
    assert int(state.codebook_counts.sum()) == 8 * 16 * 16
    assert int(state.ema_num_updates) == 1

    # second step: EMA decay path + counter accumulation
    state2, _ = trainer.train_step(state, x)
    assert int(state2.codebook_counts.sum()) == 2 * 8 * 16 * 16


def test_make_mesh_nd_nonsquare():
    """n-D mesh factorization handles non-square device counts
    (VERDICT r3 item 8: 8 devices / 2 axes used to attempt a 3x3 reshape)."""
    from control_gic_tpu.parallel.mesh import _balanced_shape

    m = make_mesh(8, axis_names=("data", "model"))
    assert m.devices.shape == (4, 2)
    m = make_mesh(4, axis_names=("a", "b"))
    assert m.devices.shape == (2, 2)
    m = make_mesh(6, axis_names=("a", "b"))
    assert m.devices.shape == (3, 2)
    m = make_mesh(8, axis_names=("a", "b", "c"))
    assert m.devices.shape == (2, 2, 2)
    assert _balanced_shape(7, 2) == (7, 1)
    assert _balanced_shape(12, 2) == (4, 3)
    for n in range(1, 33):
        for k in (1, 2, 3):
            shape = _balanced_shape(n, k)
            assert len(shape) == k and int(np.prod(shape)) == n, (n, k, shape)


def test_disc_warmup_and_adaptive_weight(rng):
    """Opt-in GAN knobs: before disc_start the discriminator params are
    frozen and the generator's g-term contributes nothing; the adaptive
    weight yields a finite positive scale. Defaults replicate the
    reference's effective constants (the knobs replicate its dead code,
    vqperceptual.py:13-16,67-78)."""
    import dataclasses

    from control_gic_tpu.train import TrainConfig, Trainer, create_train_state
    from control_gic_tpu.train.losses import LossConfig

    cfg = TrainConfig(loss=LossConfig(disc_start=2, adaptive_g_weight=True))
    trainer = Trainer(TINY, cfg)
    state = create_train_state(jax.random.PRNGKey(0), TINY, cfg,
                               image_size=64)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    d0 = state.disc_params
    state, m = trainer.train_step(state, x)
    # step 0 < disc_start: zero disc grads -> disc params unchanged
    same = jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), d0, state.disc_params))
    assert same, "discriminator must be frozen before disc_start"
    assert np.isfinite(float(m["train/total_loss"]))

    # past disc_start the discriminator trains
    state = state.replace(step=jnp.asarray(5, state.step.dtype))
    d1 = state.disc_params
    state, m = trainer.train_step(state, x)
    changed = not jax.tree_util.tree_all(jax.tree_util.tree_map(
        lambda a, b: jnp.array_equal(a, b), d1, state.disc_params))
    assert changed, "discriminator must train after disc_start"
    assert np.isfinite(float(m["train/total_loss"]))
