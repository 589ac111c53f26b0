"""Sharded single-pass encoder == unsharded CGIC.encode, same params."""
import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.models.cgic import CGIC, CGICConfig
from control_gic_tpu.parallel.mesh import make_mesh
from control_gic_tpu.parallel.spatial_encoder import encode_spatial_sharded

CFG = CGICConfig(n_embed=32, embed_dim=4, z_channels=4, ch=32,
                 ch_mult=(1, 2, 2, 4, 4), num_res_blocks=1,
                 attn_resolutions=(8,), resolution=128)


def test_sharded_encoder_matches_unsharded(rng):
    model = CGIC(CFG)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 128, 128, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, 0.1, 0.4)

    enc = model.apply(variables, x, 0.1, 0.4, method=CGIC.encode)

    mesh = make_mesh(2)   # 128 = 64 * 2 shards
    idx, masks = encode_spatial_sharded(
        mesh, variables["params"]["encoder"],
        variables["params"]["quant_conv"],
        variables["params"]["codebook"], x, 0.1, 0.4,
        ch=CFG.ch, ch_mult=CFG.ch_mult, num_res_blocks=CFG.num_res_blocks,
        attn_resolutions=CFG.attn_resolutions, resolution=CFG.resolution)

    np.testing.assert_array_equal(np.asarray(masks[0]),
                                  np.asarray(enc.router.mask_coarse))
    np.testing.assert_array_equal(np.asarray(masks[1]),
                                  np.asarray(enc.router.mask_medium))
    np.testing.assert_array_equal(np.asarray(masks[2]),
                                  np.asarray(enc.router.mask_fine))
    # index grids: float-tolerant check — identical argmin except where the
    # latent sits near a codebook tie; require exact match
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(enc.indices))
