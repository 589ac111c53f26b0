"""Fused sharded codec round-trip == unsharded codec round-trip."""
import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.codec import CGICCodec
from control_gic_tpu.models.cgic import CGIC, CGICConfig
from control_gic_tpu.parallel.mesh import make_mesh
from control_gic_tpu.parallel.spatial_codec import compress_spatial

CFG = CGICConfig(n_embed=32, embed_dim=4, z_channels=4, ch=32,
                 ch_mult=(1, 2, 2, 4, 4), num_res_blocks=1,
                 attn_resolutions=(8,), resolution=128)


def test_spatial_codec_matches_unsharded(rng):
    model = CGIC(CFG)
    x0 = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, 0.1, 0.4)
    codec = CGICCodec(model, variables, np.arange(1, CFG.n_embed + 1))

    img = rng.uniform(0, 1, (128, 128, 3)).astype(np.float32)
    solo = codec.encode(img, 0.1, 0.4)
    rec_solo = codec.decode(solo)

    mesh = make_mesh(2)
    rec, bpp, enc = compress_spatial(codec, img, 0.1, 0.4, mesh)

    # identical bitstreams -> identical bpp
    assert enc.streams == solo.streams
    assert bpp == solo.bpp
    # reconstructions agree to sharded-numerics tolerance
    np.testing.assert_allclose(rec, rec_solo, atol=2e-4, rtol=2e-3)


def test_spatial_codec_single_shard_streams_identical(rng):
    """n=1 mesh takes the collective-free specialized encoder/decoder and
    must keep BYTE-IDENTICAL streams (router mask parity is exact)."""
    model = CGIC(CFG)
    x0 = jnp.zeros((1, 128, 128, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, 0.1, 0.4)
    codec = CGICCodec(model, variables, np.arange(1, CFG.n_embed + 1))

    img = rng.uniform(0, 1, (128, 128, 3)).astype(np.float32)
    solo = codec.encode(img, 0.1, 0.4)
    rec_solo = codec.decode(solo)

    mesh = make_mesh(1)
    rec, bpp, enc = compress_spatial(codec, img, 0.1, 0.4, mesh)
    assert enc.streams == solo.streams
    assert bpp == solo.bpp
    np.testing.assert_allclose(rec, rec_solo, atol=2e-4, rtol=2e-3)
