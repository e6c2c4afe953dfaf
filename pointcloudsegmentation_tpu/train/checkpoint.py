"""Orbax checkpointing: per-epoch saves with retention, replacing the
reference's ``tf.train.Saver(max_to_keep=500)`` + ``model{epoch}.ckpt``
(train_gpn_scannet_new.py:218-220) and manual --restore flags (:278-281)."""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 500):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True))

    def save(self, epoch: int, state: Any) -> None:
        # snapshot to host first: the live state's buffers may be donated by
        # the next train step before an async save completes
        import numpy as np

        host_state = jax.tree_util.tree_map(np.asarray, state)
        self._mgr.save(epoch, args=ocp.args.StandardSave(host_state))
        self._mgr.wait_until_finished()

    def restore(self, state_like: Any,
                epoch: Optional[int] = None) -> Any:
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
            state_like)
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract))

    def latest_epoch(self) -> Optional[int]:
        return self._mgr.latest_step()
