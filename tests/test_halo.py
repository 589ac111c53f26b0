"""Spatial-parallel conv equivalence: H-sharded halo conv == unsharded conv."""
import numpy as np
import jax
import jax.numpy as jnp

from control_gic_tpu.parallel.halo import sharded_conv2d_same
from control_gic_tpu.parallel.mesh import make_mesh


def test_halo_conv_matches_unsharded(rng):
    mesh = make_mesh(4, axis_names=("data",))
    x = rng.normal(size=(2, 32, 16, 8)).astype(np.float32)
    k = rng.normal(size=(3, 3, 8, 5)).astype(np.float32) * 0.1
    b = rng.normal(size=(5,)).astype(np.float32)

    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = sharded_conv2d_same(mesh, jnp.asarray(x), jnp.asarray(k),
                              jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_halo_conv_5x5(rng):
    mesh = make_mesh(4, axis_names=("data",))
    x = rng.normal(size=(1, 64, 8, 4)).astype(np.float32)
    k = rng.normal(size=(5, 5, 4, 4)).astype(np.float32) * 0.1
    b = np.zeros(4, np.float32)
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(k), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = sharded_conv2d_same(mesh, jnp.asarray(x), jnp.asarray(k),
                              jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
