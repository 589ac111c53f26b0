"""Sharded single-pass decoder == unsharded flax decoder, same params."""
import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.models.decoder import Decoder
from control_gic_tpu.parallel.mesh import make_mesh
from control_gic_tpu.parallel.spatial_decoder import decode_spatial_sharded

CH = 32
CH_MULT = (1, 2, 2, 4, 4)
RES = 64          # image res -> latent 16
ZC = 4


def test_sharded_decoder_matches_unsharded(rng):
    dec = Decoder(ch=CH, out_ch=3, ch_mult=CH_MULT, num_res_blocks=1,
                  attn_resolutions=(8,), resolution=RES)
    hl = RES // 4
    z = jnp.asarray(rng.normal(size=(1, hl, hl, ZC)).astype(np.float32))
    zq = jnp.asarray(rng.normal(size=(1, hl, hl, ZC)).astype(np.float32))
    m_c = (rng.random((1, hl // 4, hl // 4)) < 0.3).astype(np.int32)
    m_m = ((rng.random((1, hl // 2, hl // 2)) < 0.5).astype(np.int32)
           * (1 - m_c.repeat(2, 1).repeat(2, 2)))
    m_f = 1 - m_c.repeat(4, 1).repeat(4, 2) - m_m.repeat(2, 1).repeat(2, 2)
    masks = (jnp.asarray(m_c), jnp.asarray(m_m), jnp.asarray(m_f))

    variables = dec.init(jax.random.PRNGKey(0), z, zq, masks)
    want = dec.apply(variables, z, zq, masks)

    mesh = make_mesh(4)
    got = decode_spatial_sharded(
        mesh, variables["params"], z, zq, masks,
        ch=CH, ch_mult=CH_MULT, num_res_blocks=1,
        attn_resolutions=(8,), resolution=RES)

    assert got.shape == want.shape == (1, RES, RES, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-3)


def test_single_shard_specialization_matches_unsharded(rng):
    """Mesh axis size 1 takes the collective-free plain-jit path
    (spatial_decoder._decode_fn_cached) and must still equal the flax
    decoder exactly — the round-5 single-chip overhead fix."""
    dec = Decoder(ch=CH, out_ch=3, ch_mult=CH_MULT, num_res_blocks=1,
                  attn_resolutions=(8,), resolution=RES)
    hl = RES // 4
    z = jnp.asarray(rng.normal(size=(1, hl, hl, ZC)).astype(np.float32))
    zq = jnp.asarray(rng.normal(size=(1, hl, hl, ZC)).astype(np.float32))
    m_c = (rng.random((1, hl // 4, hl // 4)) < 0.3).astype(np.int32)
    m_m = ((rng.random((1, hl // 2, hl // 2)) < 0.5).astype(np.int32)
           * (1 - m_c.repeat(2, 1).repeat(2, 2)))
    m_f = 1 - m_c.repeat(4, 1).repeat(4, 2) - m_m.repeat(2, 1).repeat(2, 2)
    masks = (jnp.asarray(m_c), jnp.asarray(m_m), jnp.asarray(m_f))

    variables = dec.init(jax.random.PRNGKey(0), z, zq, masks)
    want = dec.apply(variables, z, zq, masks)

    mesh = make_mesh(1)
    got = decode_spatial_sharded(
        mesh, variables["params"], z, zq, masks,
        ch=CH, ch_mult=CH_MULT, num_res_blocks=1,
        attn_resolutions=(8,), resolution=RES)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-3)
