"""Orbax checkpoint save/restore round-trip on a small pytree."""
import numpy as np
import jax.numpy as jnp

from control_gic_tpu.utils.checkpoint import (latest_step, restore_checkpoint,
                                              save_checkpoint)


def test_save_restore_roundtrip(tmp_path, rng):
    state = {
        "params": {"w": jnp.asarray(rng.normal(size=(4, 4)), jnp.float32),
                   "b": jnp.zeros((4,))},
        "counts": jnp.asarray(np.arange(8), jnp.uint32),
        "step": jnp.asarray(7, jnp.int32),
    }
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, 7, state, wait=True)
    save_checkpoint(d, 9, state, wait=True)
    assert latest_step(d) == 9

    restored = restore_checkpoint(d, step=7, template=state)
    np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                  np.asarray(state["params"]["w"]))
    np.testing.assert_array_equal(np.asarray(restored["counts"]),
                                  np.asarray(state["counts"]))
    assert int(restored["step"]) == 7
