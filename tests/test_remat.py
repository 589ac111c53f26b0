"""Rematerialization: same params, same outputs and gradients."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.models.cgic import CGIC, CGICConfig

TINY = CGICConfig(n_embed=32, embed_dim=4, z_channels=4, ch=32,
                  ch_mult=(1, 1, 2, 2, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=64)


def test_remat_same_forward_and_grad(rng):
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    base = CGIC(TINY)
    variables = base.init(jax.random.PRNGKey(0), x, 0.1, 0.4)
    rem = CGIC(dataclasses.replace(TINY, remat=True))

    def loss(model, params):
        rec, enc = model.apply({"params": params}, x, 0.1, 0.4)
        return jnp.mean(jnp.square(rec - x)) + enc.emb_loss

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(rem, p))(variables["params"])
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    for (p0, a), (p1, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=str(p0))
