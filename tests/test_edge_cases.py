"""Edge-case hardening: entropy ties, minimal images, invalid ratios."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from control_gic_tpu.codec import CGICCodec
from control_gic_tpu.models.cgic import CGIC, CGICConfig
from control_gic_tpu.ops import triple_grain_router, upsample_nearest

TINY = CGICConfig(n_embed=32, embed_dim=4, z_channels=4, ch=32,
                  ch_mult=(1, 1, 2, 2, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=64)


def test_router_all_ties():
    """Constant image -> identical entropies everywhere. Strict `<` means
    nothing clears the threshold: every region falls through to fine."""
    e16 = jnp.ones((1, 4, 4))
    e8 = jnp.ones((1, 8, 8))
    out = triple_grain_router(e16, e8, 0.3, 0.4)
    assert int(out.mask_coarse.sum()) == 0
    assert int(out.mask_medium.sum()) == 0
    assert int(out.mask_fine.sum()) == 16 * 16
    # partition still tiles
    cover = (np.asarray(upsample_nearest(out.mask_coarse, 4))
             + np.asarray(upsample_nearest(out.mask_medium, 2))
             + np.asarray(out.mask_fine))
    np.testing.assert_array_equal(cover, 1)


def test_invalid_ratios_rejected():
    e16 = jnp.zeros((1, 4, 4))
    e8 = jnp.zeros((1, 8, 8))
    for rc, rm in [(-0.1, 0.5), (0.7, 0.7), (1.2, 0.0)]:
        with pytest.raises(ValueError, match="invalid grain ratios"):
            triple_grain_router(e16, e8, rc, rm)


@pytest.fixture(scope="module")
def tiny_codec():
    model = CGIC(TINY)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), 0.1, 0.4)
    return CGICCodec(model, variables, np.ones(TINY.n_embed, np.int64))


def test_constant_image_roundtrip(tiny_codec, tmp_path):
    """All-ties image: everything routes fine (mode 0 with empty coarse and
    medium streams — the empty-file contract must round-trip)."""
    img = np.full((64, 64, 3), 0.5, np.float32)
    rec, bpp, enc = tiny_codec.compress(img, 0.1, 0.4,
                                        out_dir=str(tmp_path / "c"))
    assert enc.streams["indices_coarse"] == b""     # empty-stream contract
    assert enc.streams["indices_medium"] == b""
    assert np.isfinite(rec).all()
    assert bpp > 0


def test_minimal_16px_image(tiny_codec):
    """Smallest legal input: one 16px patch -> 1x1 coarse grid."""
    img = np.random.default_rng(0).uniform(0, 1, (16, 16, 3)) \
        .astype(np.float32)
    enc = tiny_codec.encode(img, 0.1, 0.4)
    assert enc.latent_hw == (4, 4)
    rec = tiny_codec.decode(enc)
    assert rec.shape == (16, 16, 3)
    assert np.isfinite(rec).all()
