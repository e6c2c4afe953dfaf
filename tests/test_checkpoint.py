"""Checkpoint save/restore round-trip (orbax wrapper; the reference's
per-epoch Saver + --restore path, train_gpn_scannet_new.py:218-220,278-281).

The manager operates on pytrees — these tests exercise it with a small
synthetic TrainState (the full-Trainer integration is covered by the slow
end-to-end trainer tests), keeping the suite CI-fast.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pointcloudsegmentation_tpu.train.checkpoint import CheckpointManager
from pointcloudsegmentation_tpu.train.loop import TrainState


def small_state(seed: int, step: int = 0) -> TrainState:
    key = jax.random.PRNGKey(seed)
    params = {"dense": {"kernel": jax.random.normal(key, (8, 4)),
                        "bias": jnp.zeros((4,))}}
    tx = optax.adam(1e-3)
    return TrainState(step=jnp.asarray(step, jnp.int32), params=params,
                      opt_state=tx.init(params))


def assert_states_equal(a: TrainState, b: TrainState):
    for x, y in zip(jax.tree_util.tree_leaves(a),
                    jax.tree_util.tree_leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_checkpoint_roundtrip(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=3)
    s0 = small_state(0, step=10)
    s1 = small_state(1, step=20)
    mgr.save(0, s0)
    mgr.save(1, s1)
    assert mgr.latest_epoch() == 1

    fresh = small_state(99)
    restored = mgr.restore(fresh)          # latest
    assert_states_equal(restored, s1)
    assert int(restored.step) == 20

    older = mgr.restore(fresh, epoch=0)    # explicit epoch
    assert_states_equal(older, s0)
    assert int(older.step) == 10


def test_checkpoint_retention(tmp_path):
    """max_to_keep drops the oldest epochs (Saver(max_to_keep=...) parity)."""
    mgr = CheckpointManager(str(tmp_path), keep=2)
    for e in range(4):
        mgr.save(e, small_state(e, step=e))
    assert mgr.latest_epoch() == 3
    fresh = small_state(99)
    assert int(mgr.restore(fresh, epoch=3).step) == 3
    assert int(mgr.restore(fresh, epoch=2).step) == 2
    with pytest.raises(Exception):
        mgr.restore(fresh, epoch=0)  # retired by retention


def test_restore_empty_dir_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        mgr.restore(small_state(0))
    with pytest.raises(FileNotFoundError):
        mgr.restore_best(small_state(0))


def test_best_miou_retention(tmp_path):
    """The best-mIoU checkpoint survives even after per-epoch retention
    retires it (SURVEY §5: per-epoch + best-mIoU retention)."""
    mgr = CheckpointManager(str(tmp_path), keep=2, best_keep=1)
    mious = [0.2, 0.9, 0.5, 0.4, 0.3]  # best at epoch 1
    for e, m in enumerate(mious):
        mgr.save(e, small_state(e, step=e), metrics={"miou": m})
    mgr.wait()
    assert mgr.latest_epoch() == 4
    assert mgr.best_epoch() == 1
    fresh = small_state(99)
    # epoch 1 retired from the per-epoch window (keep=2)...
    with pytest.raises(Exception):
        mgr.restore(fresh, epoch=1)
    # ...but recoverable via the best tree
    best = mgr.restore_best(fresh)
    assert int(best.step) == 1
    assert_states_equal(best, small_state(1, step=1))


def test_best_reopen_across_sessions(tmp_path):
    """--restore-best works from a fresh manager over an existing dir."""
    mgr = CheckpointManager(str(tmp_path), keep=2, best_keep=1)
    for e, m in enumerate([0.1, 0.8, 0.2]):
        mgr.save(e, small_state(e, step=e), metrics={"miou": m})
    mgr.wait()
    reopened = CheckpointManager(str(tmp_path), keep=2, best_keep=1)
    assert reopened.best_epoch() == 1
    assert int(reopened.restore_best(small_state(99)).step) == 1


def test_multihost_helpers_single_process():
    from pointcloudsegmentation_tpu.parallel import (global_mesh,
                                                     local_batch_to_global)
    mesh = global_mesh()
    assert mesh.size == 8
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    g = local_batch_to_global(batch, mesh)
    assert g["x"].shape == (8, 2)
    np.testing.assert_allclose(np.asarray(g["x"]), batch["x"])
