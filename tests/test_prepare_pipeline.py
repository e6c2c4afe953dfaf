"""End-to-end offline-prep smoke test: a synthetic "raw room" fixture runs
through the real S3DIS ingestion path — raw room pkl -> scripts/prepare_data
CLI -> sampled-block pkl -> provider read_fn -> one Trainer step — proving
the offline pipeline (reference s3dis_util.py:140-241 prepare_* +
train_graph_pool_new.py:248-275 read_fn) without any external data.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def raw_room(tmp_path, rng):
    """Synthetic raw room: a 6 x 4 m floor plane + two walls + clutter,
    xyz+rgb in the raw S3DIS frame (absolute coords, rgb 0..255)."""
    from pointcloudsegmentation_tpu.data import io_util

    n = 6000
    floor = np.stack([rng.uniform(0, 6, n // 2),
                      rng.uniform(0, 4, n // 2),
                      0.02 * rng.randn(n // 2)], 1)
    wall = np.stack([rng.uniform(0, 6, n // 4),
                     0.03 * rng.randn(n // 4),
                     rng.uniform(0, 2.8, n // 4)], 1)
    rest = np.stack([rng.uniform(0, 6, n - n // 2 - n // 4),
                     rng.uniform(0, 4, n - n // 2 - n // 4),
                     rng.uniform(0, 2.8, n - n // 2 - n // 4)], 1)
    xyz = np.concatenate([floor, wall, rest], 0).astype(np.float32)
    rgb = rng.randint(0, 256, (n, 3)).astype(np.float32)
    labels = np.concatenate([np.zeros(n // 2), np.ones(n // 4),
                             rng.randint(2, 13, n - n // 2 - n // 4)]
                            ).astype(np.int32)
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    path = str(raw_dir / "Area_1_office_1.pkl")
    io_util.save_room_pkl(path, np.concatenate([xyz, rgb], 1), labels)
    return str(raw_dir), path


def test_raw_room_through_prepare_cli_and_trainer(tmp_path, raw_room):
    raw_dir, _ = raw_room
    out_dir = str(tmp_path / "sampled")

    # the REAL CLI, as a user would run it
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "prepare_data.py"),
         "s3dis", "--raw-dir", raw_dir, "--out-dir", out_dir,
         "--workers", "1"],
        capture_output=True, text=True, timeout=300, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    pkls = [f for f in os.listdir(out_dir) if f.endswith(".pkl")]
    assert pkls, "prepare_data produced no room pkls"

    # sampled blocks satisfy the training contract
    from pointcloudsegmentation_tpu.data import s3dis
    from pointcloudsegmentation_tpu.data.batching import (pad_block,
                                                          stack_blocks)

    blocks = s3dis.blocks_from_room_pkl(
        "train", os.path.join(out_dir, pkls[0]),
        rng=np.random.RandomState(0))
    assert blocks, "no blocks sampled from the prepared room"
    for b in blocks:
        assert b["xyz"].shape[1] == 3 and b["feats"].shape[1] == 3
        assert (b["labels"] >= 0).all() and (b["labels"] < 13).all()
        # normalize_block centers each block on its footprint
        assert abs(b["xyz"][:, :2]).max() <= 1.5 + 1e-3
        assert b["xyz"][:, 2].min() >= -1e-3

    # one real train step on the prepared data (tiny arch: CPU-compilable)
    import jax

    from pointcloudsegmentation_tpu.train import Trainer, s3dis_config

    num_points = 512
    cfg = s3dis_config(model="tiny_s3dis", data_num_points=num_points,
                       data_caps=(256, 64), data_feat_dim=3,
                       optim_epoch_steps=10)
    padded = [pad_block(b["xyz"], b["feats"], b["labels"], num_points)
              for b in blocks[:2]]
    batch = stack_blocks(padded)
    trainer = Trainer(cfg, search_chunk=256)
    rng_j = jax.random.PRNGKey(0)
    state = trainer.init_state(rng_j, batch)
    state, metrics = trainer.train_step(state, batch, rng_j)
    assert np.isfinite(float(metrics["loss"]))
