"""Checkpoint save/restore round-trip (orbax wrapper; the reference's
per-epoch Saver + --restore path, train_gpn_scannet_new.py:218-220,278-281).
"""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloudsegmentation_tpu.data import toy
from pointcloudsegmentation_tpu.train import Trainer, s3dis_config
from pointcloudsegmentation_tpu.train.checkpoint import CheckpointManager


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = s3dis_config(data_num_points=256, data_caps=(128, 32),
                       optim_epoch_steps=5)
    trainer = Trainer(cfg, search_chunk=128)
    key = jax.random.PRNGKey(0)
    batches = list(toy.toy_batches(2, batch_size=1, num_points=256,
                                   kind="room"))
    state = trainer.init_state(key, batches[0])
    state, _ = trainer.train_step(state, batches[0], key)

    mgr = CheckpointManager(str(tmp_path), keep=3)
    mgr.save(0, state)
    step0 = int(state.step)
    state2, _ = trainer.train_step(state, batches[1], key)
    mgr.save(1, state2)
    assert mgr.latest_epoch() == 1

    fresh = trainer.init_state(key, batches[0])
    restored = mgr.restore(fresh)          # latest
    r_leaves = jax.tree_util.tree_leaves(restored.params)
    w_leaves = jax.tree_util.tree_leaves(state2.params)
    for r, w in zip(r_leaves, w_leaves):
        np.testing.assert_allclose(np.asarray(r), np.asarray(w))
    assert int(restored.step) == int(state2.step)

    older = mgr.restore(fresh, epoch=0)    # explicit epoch
    assert int(older.step) == step0


def test_multihost_helpers_single_process():
    from pointcloudsegmentation_tpu.parallel import (global_mesh,
                                                     local_batch_to_global)
    mesh = global_mesh()
    assert mesh.size == 8
    batch = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    g = local_batch_to_global(batch, mesh)
    assert g["x"].shape == (8, 2)
    np.testing.assert_allclose(np.asarray(g["x"]), batch["x"])
