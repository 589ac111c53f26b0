"""Model-layer tests: shapes on a tiny config, exact param-count parity with
the reference architecture on the full config (via eval_shape — no alloc)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from control_gic_tpu.models import CGIC, CGICConfig

TINY = CGICConfig(n_embed=32, embed_dim=4, z_channels=4, ch=32,
                  ch_mult=(1, 1, 2, 2, 2), num_res_blocks=1,
                  attn_resolutions=(8,), resolution=64)
FULL = CGICConfig()


def _leaf_count(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def test_param_count_parity_full_config():
    """Exact parity with the reference (verified by torch CPU instantiation
    of configs/config_inference.yaml): encoder 52,351,116; decoder
    78,003,715; quant/post_quant conv 20 each; codebook 4,096; total
    130,358,967 (inference.py prints 130.36 M)."""
    model = CGIC(FULL)
    x = jax.ShapeDtypeStruct((1, 256, 256, 3), jnp.float32)
    vars_shape = jax.eval_shape(
        lambda k, xx: model.init(k, xx, 0.1, 0.4), jax.random.PRNGKey(0), x)
    params = vars_shape["params"]
    counts = {k: _leaf_count(v) for k, v in params.items()}
    assert counts["encoder"] == 52_351_116, counts
    assert counts["decoder"] == 78_003_715, counts
    assert counts["quant_conv"] == 20
    assert counts["post_quant_conv"] == 20
    assert counts["codebook"] == 4_096
    assert _leaf_count(params) == 130_358_967


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = CGIC(TINY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, 0.1, 0.4)
    return model, variables


def test_forward_shapes(tiny_model_and_params, rng):
    model, variables = tiny_model_and_params
    x = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32))
    rec, enc = model.apply(variables, x, 0.1, 0.4)
    assert rec.shape == (2, 64, 64, 3)
    assert enc.quant.shape == (2, 16, 16, 4)
    assert enc.indices.shape == (2, 16, 16)
    assert enc.router.mask_coarse.shape == (2, 4, 4)
    assert enc.router.mask_medium.shape == (2, 8, 8)
    assert enc.router.mask_fine.shape == (2, 16, 16)
    assert enc.grain_indices.shape == (2, 16, 16)
    assert enc.router.mode == 0
    assert np.isfinite(np.asarray(rec)).all()
    assert int(enc.counts.sum()) == 2 * 16 * 16


def test_decode_indices_matches_decode(tiny_model_and_params, rng):
    """Receiver-side decode from indices == sender-side decode from quant
    (the straight-through quant equals the codebook rows at eval)."""
    model, variables = tiny_model_and_params
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    rec, enc = model.apply(variables, x, 0.1, 0.4)
    rec2 = model.apply(variables, enc.indices, enc.router.masks,
                       method=CGIC.decode_indices)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2),
                               rtol=1e-5, atol=1e-5)


def test_mode_specializations_compile(tiny_model_and_params, rng):
    model, variables = tiny_model_and_params
    x = jnp.asarray(rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32))
    for rc, rm in [(0.0, 0.8), (1.0, 0.0), (0.0, 0.0)]:
        rec, enc = model.apply(variables, x, rc, rm)
        assert rec.shape == (1, 64, 64, 3)
        assert np.isfinite(np.asarray(rec)).all()
