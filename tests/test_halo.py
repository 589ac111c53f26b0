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


def test_halo_subpixel_upsample_matches_unsharded(rng):
    """H-sharded subpixel upsample+conv == unsharded upsample2_conv3x3
    bit-exactly (identical op sequence, halo rows supply the boundary)."""
    from functools import partial
    from jax.sharding import PartitionSpec as P

    from control_gic_tpu.ops.resample import upsample2_conv3x3
    from control_gic_tpu.parallel.halo import halo_upsample2_conv3x3

    mesh = make_mesh(4, axis_names=("data",))
    x = rng.normal(size=(2, 16, 12, 8)).astype(np.float32)
    k = rng.normal(size=(3, 3, 8, 6)).astype(np.float32) * 0.1
    b = rng.normal(size=(6,)).astype(np.float32)

    want = upsample2_conv3x3(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b))
    fn = jax.shard_map(
        partial(halo_upsample2_conv3x3, axis_name="data"),
        mesh=mesh,
        in_specs=(P(None, "data", None, None), P(), P()),
        out_specs=P(None, "data", None, None))
    got = fn(jnp.asarray(x), jnp.asarray(k), jnp.asarray(b))
    assert got.shape == (2, 32, 24, 6)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
