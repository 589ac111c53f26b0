"""Orbax checkpointing for TrainState / codec variables.

Replaces the reference's Lightning ModelCheckpoint (every 2000 steps,
keep-all, config_train.yaml:18-22). The codebook-usage counters ride in the
state pytree, so the Huffman frequency table survives restore exactly as the
reference's embedding_counter does in its .ckpt (inference.py:137-139).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _manager(directory: str, keep: Optional[int] = None) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(
        max_to_keep=keep, create=True, enable_async_checkpointing=True)
    return ocp.CheckpointManager(os.path.abspath(directory), options=options)


def save_checkpoint(directory: str, step: int, state: Any,
                    keep: Optional[int] = None, wait: bool = False) -> None:
    mgr = _manager(directory, keep)
    mgr.save(step, args=ocp.args.StandardSave(state))
    if wait:
        mgr.wait_until_finished()
    mgr.close()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    mgr = _manager(directory)
    step = mgr.latest_step()
    mgr.close()
    return step


def restore_checkpoint(directory: str, step: Optional[int] = None,
                       template: Any = None) -> Any:
    """Restore a pytree; `template` (abstract or concrete) fixes structure
    and shardings. Auto-restores the latest step when step is None."""
    mgr = _manager(directory)
    if step is None:
        step = mgr.latest_step()
        if step is None:
            mgr.close()
            raise FileNotFoundError(f"no checkpoints in {directory}")
    if template is not None:
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct
                                          if hasattr(ocp.utils, "to_shape_dtype_struct")
                                          else (lambda x: x), template)
        restored = mgr.restore(step,
                               args=ocp.args.StandardRestore(abstract))
    else:
        restored = mgr.restore(step)
    mgr.close()
    return restored
