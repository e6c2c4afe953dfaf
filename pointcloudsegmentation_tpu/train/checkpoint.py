"""Orbax checkpointing: per-epoch saves with retention plus best-mIoU
retention, replacing the reference's ``tf.train.Saver(max_to_keep=500)`` +
``model{epoch}.ckpt`` (train_gpn_scannet_new.py:218-220) and manual
--restore flags (:278-281).

The reference keeps every epoch so the best one is always recoverable after
the fact; here the best-k checkpoints by eval mIoU are additionally retained
in a ``best/`` subdirectory regardless of the per-epoch retention window
(SURVEY.md §5 rebuild target), and saves are ASYNC: the state is snapshotted
to host numpy first (the live buffers may be donated by the next train step),
so the Orbax background write never blocks the epoch loop.  ``wait()`` (or
any restore/query) drains pending writes.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 500, best_keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep,
                                                 create=True))
        # separate best-k tree: the per-epoch window above may retire the
        # best epoch long before training ends
        self._best_mgr = ocp.CheckpointManager(
            os.path.join(self._dir, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=best_keep,
                best_fn=lambda m: m["miou"],
                best_mode="max",
                create=True))

    def save(self, epoch: int, state: Any,
             metrics: Optional[Dict[str, float]] = None) -> None:
        # snapshot to host first: the live state's buffers may be donated by
        # the next train step before the async save completes
        import numpy as np

        host_state = jax.tree_util.tree_map(np.asarray, state)
        self._mgr.save(epoch, args=ocp.args.StandardSave(host_state),
                       metrics=metrics)
        if metrics is not None and "miou" in metrics:
            self._best_mgr.save(
                epoch, args=ocp.args.StandardSave(host_state),
                metrics={"miou": float(metrics["miou"])})

    def wait(self) -> None:
        """Drain pending async writes (call once at the end of training)."""
        self._mgr.wait_until_finished()
        self._best_mgr.wait_until_finished()

    def _abstract(self, state_like: Any):
        return jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(jnp.shape(x), x.dtype),
            state_like)

    def restore(self, state_like: Any,
                epoch: Optional[int] = None) -> Any:
        self._mgr.wait_until_finished()
        step = epoch if epoch is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self._dir}")
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(self._abstract(state_like)))

    def restore_best(self, state_like: Any) -> Any:
        """Restore the highest-mIoU checkpoint seen so far."""
        self._best_mgr.wait_until_finished()
        step = self._best_mgr.best_step()
        if step is None:
            raise FileNotFoundError(f"no best checkpoint in {self._dir}")
        return self._best_mgr.restore(
            step, args=ocp.args.StandardRestore(self._abstract(state_like)))

    def latest_epoch(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def best_epoch(self) -> Optional[int]:
        self._best_mgr.wait_until_finished()
        return self._best_mgr.best_step()
