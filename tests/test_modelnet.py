"""ModelNet40 classification end-to-end smoke: GPN class model + head train
a few steps on synthetic clouds; loss decreases; eval metrics computed."""
import jax
import numpy as np

from pointcloudsegmentation_tpu.data.batching import pad_block, stack_blocks
from pointcloudsegmentation_tpu.data.modelnet import normalize_cloud
from pointcloudsegmentation_tpu.train import Trainer, modelnet40_config


def synthetic_cloud(rng, label, n=256):
    # class = elongation direction (separable geometry)
    xyz = rng.randn(n, 3).astype(np.float32)
    xyz[:, label % 3] *= 3.0
    return normalize_cloud(xyz)


def make_batches(rng, num_batches, batch_size, n=256, num_classes=4):
    out = []
    for _ in range(num_batches):
        blocks = []
        for _ in range(batch_size):
            label = rng.randint(0, num_classes)
            xyz = synthetic_cloud(rng, label, n)
            feats = np.tile(xyz, (1, 3)).astype(np.float32)  # 9-dim stand-in
            blocks.append(pad_block(xyz, feats,
                                    np.full(n, label, np.int32), n))
        out.append(stack_blocks(blocks))
    return out


def test_modelnet_classification_trains(rng):
    cfg = modelnet40_config(data_num_points=256, data_num_classes=4,
                            data_caps=(128, 32), optim_epoch_steps=10)
    trainer = Trainer(cfg, search_chunk=128)
    key = jax.random.PRNGKey(0)
    batches = make_batches(rng, 6, batch_size=4)
    state = trainer.init_state(key, batches[0])
    losses = []
    for epoch in range(5):
        for b in batches:
            state, m = trainer.train_step(state, b, key)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    # metrics shape: per-cloud (batch) counts
    assert int(m["count"]) == 4
