"""Frozen-params eval-time search parity: windowed vs exact (VERDICT r4 #3).

scripts/interpolate.py historically defaulted eval to the EXACT global
search, justified by training-time recall numbers — but the decision the
rationale needs is the EVAL-TIME mIoU delta at frozen parameters.  This
harness measures it: train the flagship ONCE on synthetic S3DIS-like rooms
(production windowed path), then run the SAME parameters through the full
scene-eval pipeline (eval_scene_probs block sweep + Gaussian k-NN
interpolation onto the dense cloud) twice — once with the windowed search,
once with the exact global search — and report both mIoUs and both
eval wall-clocks.

Reference analog: interpolate.py:121-168 (eval_room_probs + interpolation),
which always ran the same search as training.

Usage (TPU, ~6 min): python scripts/eval_parity.py --epochs 10
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from pointcloudsegmentation_tpu.utils import cache as _cache
_cache.enable()

from pointcloudsegmentation_tpu.data import batching, synth_rooms  # noqa: E402
from pointcloudsegmentation_tpu.eval import (eval_scene_probs,  # noqa: E402
                                             interpolate_to_dense,
                                             scene_iou)
from pointcloudsegmentation_tpu.train import Trainer, s3dis_config  # noqa: E402
from pointcloudsegmentation_tpu.utils.logging import get_logger  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-rooms", type=int, default=10)
    p.add_argument("--test-rooms", type=int, default=4)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--num-points", type=int, default=8192)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="results/eval_parity.json")
    args = p.parse_args()
    log = get_logger("pcs_tpu.eval_parity")

    rng_np = np.random.RandomState(args.seed)
    train_blocks = synth_rooms.room_blocks(rng_np, args.train_rooms,
                                           model="train")
    # held-out rooms kept as SCENES: blocks + dense ground truth
    test_rooms = [synth_rooms.room_blocks(np.random.RandomState(10_000 + i),
                                          1, model="test", with_mins=True)
                  for i in range(args.test_rooms)]

    cfg = s3dis_config(data_num_points=args.num_points,
                       optim_epoch_steps=max(
                           1, len(train_blocks) // args.batch))
    trainer = Trainer(cfg, search_chunk=2048)
    rng = jax.random.PRNGKey(args.seed)

    def batches(blocks, train):
        order = (rng_np.permutation(len(blocks)) if train
                 else np.arange(len(blocks)))
        padded = [batching.pad_block(blocks[i]["xyz"], blocks[i]["feats"],
                                     blocks[i]["labels"], args.num_points,
                                     rng=rng_np) for i in order]
        return [batching.stack_blocks(padded[i:i + args.batch], args.batch,
                                      rng=rng_np, pad_masked=not train)
                for i in range(0, len(padded), args.batch)]

    state = trainer.init_state(rng, batches(train_blocks[:args.batch],
                                            False)[0])
    for epoch in range(args.epochs):
        t0 = time.time()
        for b in batches(train_blocks, train=True):
            state, m = trainer.train_step(state, b, rng)
        log.info("epoch %d loss %.4f (%.1fs)", epoch, float(m["loss"]),
                 time.time() - t0)

    # frozen params -> two eval arms.  PCS_DISABLE_WINDOWED is read at
    # trace time, so each arm builds a fresh model (same params tree).
    results = {"config": vars(args)}
    for arm in ("windowed", "exact"):
        if arm == "exact":
            os.environ["PCS_DISABLE_WINDOWED"] = "1"
        else:
            os.environ.pop("PCS_DISABLE_WINDOWED", None)
        arm_trainer = Trainer(cfg, search_chunk=2048)
        apply_fn = jax.jit(lambda p_, x, f, m_: arm_trainer.model.apply(
            p_, x, f, m_, False))
        mious, eval_s, npts = [], 0.0, 0
        for si, room in enumerate(test_rooms):
            blocks = []
            for b in room:
                pb = batching.pad_block(b["xyz"], b["feats"], b["labels"],
                                        args.num_points)
                pb["block_min"] = b.get("block_min",
                                        np.zeros(3, np.float32))
                blocks.append(pb)
            dense_xyz = np.concatenate(
                [b["xyz"][b["mask"]] + b["block_min"] for b in blocks], 0)
            dense_labels = np.concatenate(
                [b["labels"][b["mask"]] for b in blocks], 0)
            if si == 0:  # warm compile outside the timer
                eval_scene_probs(apply_fn, state.params, blocks)
            t0 = time.perf_counter()
            sxyz, probs = eval_scene_probs(apply_fn, state.params, blocks)
            qprobs = interpolate_to_dense(sxyz, probs, dense_xyz, k=6)
            eval_s += time.perf_counter() - t0
            npts += len(dense_xyz)
            res = scene_iou(dense_labels, qprobs.argmax(1),
                            cfg.data.num_classes)
            mious.append(float(res["miou"]))
        results[arm] = {"miou_per_scene": mious,
                        "miou": float(np.mean(mious)),
                        "eval_points_per_sec": npts / eval_s}
        log.info("[%s] mean scene mIoU %.4f, eval %.0f points/s", arm,
                 results[arm]["miou"], results[arm]["eval_points_per_sec"])
    os.environ.pop("PCS_DISABLE_WINDOWED", None)
    results["delta_miou"] = (results["windowed"]["miou"]
                             - results["exact"]["miou"])
    results["speedup"] = (results["windowed"]["eval_points_per_sec"]
                          / results["exact"]["eval_points_per_sec"])
    log.info("EVAL PARITY delta (windowed - exact): %+.4f | windowed %.2fx "
             "faster", results["delta_miou"], results["speedup"])
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    log.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
