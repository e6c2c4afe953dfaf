"""Windowed-vs-exact mIoU parity A/B (VERDICT r2 #2).

The production training path uses the Morton-windowed approximate neighbor
search (recall_target=0.8 selection, overflow slots + tile-shared pools);
its per-band recall on hardware is 94.6-98.1% (scripts/verify_search_recall).
This harness measures what that approximation costs in ACCURACY: train the
flagship twice on the SAME high-fidelity synthetic S3DIS-like rooms
(data/synth_rooms.py — surface-sampled planes, thin columns, furniture at
real densities; the geometry that stresses Morton locality) — once with the
windowed path, once with the exact global search (PCS_DISABLE_WINDOWED=1,
the eval default of scripts/interpolate.py) — and report the test-mIoU
delta.  The parity contract (BASELINE.md) is |delta| <= 0.03 mIoU.

Blocks go through the REAL offline prep (s3dis.prepare_room) and the real
Trainer, so the A/B covers search + conv + pooling end to end.  Both arms
share identical block sets, init seed, and batch order.

Reference analog: the real S3DIS training runs this de-risks
(train_graph_pool_new.py:286, train_util.py:4-68).

Usage (TPU, ~10 min):
  python scripts/parity_ab.py --epochs 12 --train-rooms 10 --test-rooms 4
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

from pointcloudsegmentation_tpu.data import batching, synth_rooms
from pointcloudsegmentation_tpu.train import Trainer, s3dis_config
from pointcloudsegmentation_tpu.train.metrics import MetricAccumulator
from pointcloudsegmentation_tpu.utils.logging import get_logger


def make_batches(blocks, num_points, batch, rng, train):
    """Pad blocks and group into [B, ...] batches (train: shuffled)."""
    order = rng.permutation(len(blocks)) if train else np.arange(len(blocks))
    padded = [batching.pad_block(blocks[i]["xyz"], blocks[i]["feats"],
                                 blocks[i]["labels"], num_points, rng=rng)
              for i in order]
    out = []
    for i in range(0, len(padded), batch):
        out.append(batching.stack_blocks(padded[i:i + batch], batch,
                                         rng=rng, pad_masked=not train))
    return out


def scannetify(blocks, rng):
    """Map synthetic S3DIS-like blocks onto the ScanNet training contract
    (train_gpn_scannet_new.py:66-88): NO input colors (feat_dim 0), labels
    shifted up by 1 with label 0 = unannotated/ignored (3% of points)."""
    out = []
    for b in blocks:
        lbl = b["labels"].astype(np.int32) + 1
        lbl[rng.rand(len(lbl)) < 0.03] = 0
        out.append({"xyz": b["xyz"],
                    "feats": np.zeros((len(lbl), 0), np.float32),
                    "labels": lbl})
    return out


def run_arm(arm, train_blocks, test_blocks, args, log):
    if arm == "exact":
        os.environ["PCS_DISABLE_WINDOWED"] = "1"
    else:
        os.environ.pop("PCS_DISABLE_WINDOWED", None)

    from pointcloudsegmentation_tpu.train import scannet_config

    steps = max(1, len(train_blocks) // args.batch)
    if args.config == "scannet":
        # synthetic rooms carry 13 classes; keep ScanNet's ignore-label-0
        # + shift semantics but size the head to the data
        cfg = scannet_config(model=args.model or "pointnet_scannet",
                             data_num_points=args.num_points,
                             data_num_classes=13,
                             optim_epoch_steps=steps)
    else:
        cfg = s3dis_config(model=args.model or "pointnet_s3dis",
                           data_num_points=args.num_points,
                           optim_epoch_steps=steps)
    trainer = Trainer(cfg, search_chunk=min(2048, args.num_points))
    rng = jax.random.PRNGKey(args.seed)
    nprng = np.random.RandomState(args.seed)
    test_batches = make_batches(test_blocks, args.num_points, args.batch,
                                np.random.RandomState(0), train=False)
    state = trainer.init_state(
        rng, make_batches(train_blocks[:args.batch], args.num_points,
                          args.batch, np.random.RandomState(0), False)[0])
    curve = []
    best = 0.0
    for epoch in range(args.epochs):
        t0 = time.time()
        batches = make_batches(train_blocks, args.num_points, args.batch,
                               nprng, train=True)
        for b in batches:
            state, _ = trainer.train_step(state, b, rng)
        acc = MetricAccumulator(cfg.data.num_classes)
        for b in test_batches:
            _, m = trainer.eval_step(state, b, rng)
            acc.update(m["cm"], m["loss"])
        res = acc.result()
        curve.append({"epoch": epoch, "miou": float(res["miou"]),
                      "oacc": float(res["oacc"])})
        best = max(best, float(res["miou"]))
        log.info("[%s] epoch %d: test mIoU %.4f oAcc %.4f (%.1fs)", arm,
                 epoch, res["miou"], res["oacc"], time.time() - t0)
    return {"curve": curve, "final_miou": curve[-1]["miou"],
            "best_miou": best}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train-rooms", type=int, default=10)
    p.add_argument("--test-rooms", type=int, default=4)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch", type=int, default=4)
    p.add_argument("--num-points", type=int, default=8192)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--model", type=str, default=None,
                   help="registry key (e.g. ecd_s3dis to A/B the "
                        "edge-conv family through the same harness); "
                        "default: the config's flagship")
    p.add_argument("--config", choices=["s3dis", "scannet"],
                   default="s3dis",
                   help="scannet: no input colors, labels shifted +1 with "
                        "0 = ignore (the reference ScanNet recipe, "
                        "train_gpn_scannet_new.py:66-88)")
    p.add_argument("--arms", nargs="*", default=["windowed", "exact"])
    p.add_argument("--hard", action="store_true",
                   help="hard synthetic regime: scanner density gradient, "
                        "occlusion dropout, speckle, rarer minority "
                        "classes, 2-room scenes (blocks straddle rooms)")
    p.add_argument("--out", type=str, default="results/parity_ab.json")
    args = p.parse_args()
    log = get_logger("pcs_tpu.parity_ab")

    gen_kw = dict(hard=True, rooms_per_scene=2) if args.hard else {}
    rng = np.random.RandomState(args.seed)
    train_blocks = synth_rooms.room_blocks(rng, args.train_rooms,
                                           model="train", **gen_kw)
    test_blocks = synth_rooms.room_blocks(np.random.RandomState(10_000),
                                          args.test_rooms, model="test",
                                          **gen_kw)
    if args.config == "scannet":
        train_blocks = scannetify(train_blocks, rng)
        test_blocks = scannetify(test_blocks, np.random.RandomState(10_001))
    log.info("blocks: %d train / %d test; median points %d", len(train_blocks),
             len(test_blocks),
             int(np.median([len(b["xyz"]) for b in train_blocks])))

    results = {"config": vars(args)}
    for arm in args.arms:
        log.info("=== arm: %s ===", arm)
        results[arm] = run_arm(arm, train_blocks, test_blocks, args, log)
    if "windowed" in results and "exact" in results:
        delta = results["windowed"]["final_miou"] - results["exact"]["final_miou"]
        results["delta_final_miou"] = delta
        results["delta_best_miou"] = (results["windowed"]["best_miou"]
                                      - results["exact"]["best_miou"])
        log.info("PARITY delta (windowed - exact): final %+.4f best %+.4f",
                 delta, results["delta_best_miou"])
    Path(args.out).parent.mkdir(parents=True, exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    log.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
