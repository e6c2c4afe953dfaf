"""Training CLI — the single driver replacing the reference's per-experiment
``train_*.py`` scripts (SURVEY.md §2.7).

Examples:
  python -m pointcloudsegmentation_tpu.train.cli --config s3dis \
      --data-dir data/S3DIS/sampled_train --epochs 100
  python -m pointcloudsegmentation_tpu.train.cli --config s3dis --synthetic \
      --epochs 2 --steps-per-epoch 50        # no dataset required
"""
from __future__ import annotations

import argparse
import glob
import os
from functools import partial
from typing import Optional

import jax
import numpy as np

from ..data import s3dis, toy
from ..data.provider import Provider
from ..parallel import make_mesh
from ..utils.logging import get_logger
from . import config as config_lib
from .checkpoint import CheckpointManager
from .loop import Trainer

CONFIGS = {
    "s3dis": config_lib.s3dis_config,
    "scannet": config_lib.scannet_config,
    "semantic3d": config_lib.semantic3d_config,
    "modelnet40": config_lib.modelnet40_config,
}


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", choices=sorted(CONFIGS), default="s3dis")
    p.add_argument("--model", type=str, default=None,
                   help="override model registry key (e.g. ecd_s3dis)")
    p.add_argument("--data-dir", type=str, default=None)
    p.add_argument("--test-data-dir", type=str, default=None)
    p.add_argument("--synthetic", action="store_true",
                   help="train on synthetic blocks (smoke/bench)")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--batch-size", type=int, default=None,
                   help="global batch (blocks); default = #devices")
    p.add_argument("--num-points", type=int, default=None)
    p.add_argument("--lr-init", type=float, default=None)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--restore", action="store_true")
    p.add_argument("--restore-epoch", type=int, default=None)
    p.add_argument("--restore-best", action="store_true",
                   help="restore the highest-mIoU checkpoint instead of "
                        "the latest epoch")
    p.add_argument("--log-file", type=str, default=None)
    p.add_argument("--metrics-file", type=str, default=None,
                   help="per-epoch metrics JSONL (default: alongside "
                        "--log-file / --checkpoint-dir); consumed by "
                        "scripts/analysis_compare.py")
    p.add_argument("--eval", action="store_true",
                   help="evaluate only (restore + test epoch)")
    p.add_argument("--no-mesh", action="store_true",
                   help="single-device mode (skip mesh sharding)")
    p.add_argument("--use-diffusion", type=int, default=0, metavar="STEPS",
                   help="probs-diffusion smoothing steps "
                        "(train_graph_pool.py --use_diffusion)")
    p.add_argument("--ablate-feats", choices=["none", "zero", "drop-rgb",
                                              "drop-covars"], default="none",
                   help="feature-ablation retraining (the reference's "
                        "train_feats_compare*.py experiments)")
    return p.parse_args(argv)


def build_cfg(args) -> config_lib.TrainConfig:
    over = {}
    if args.model:
        over["model"] = args.model
    if args.epochs:
        over["num_epochs"] = args.epochs
    if args.num_points:
        over["data_num_points"] = args.num_points
    if args.lr_init:
        over["optim_lr_init"] = args.lr_init
    if args.steps_per_epoch:
        over["optim_epoch_steps"] = args.steps_per_epoch
    if args.checkpoint_dir:
        over["checkpoint_dir"] = args.checkpoint_dir
    if args.use_diffusion:
        over["diffusion_steps"] = args.use_diffusion
    return CONFIGS[args.config](**over)


def _ablate(batch, mode):
    if mode == "none":
        return batch
    feats = batch["feats"]
    if mode == "zero":
        feats = np.zeros_like(feats)
    elif mode == "drop-rgb":
        feats = np.concatenate([np.zeros_like(feats[..., :3]),
                                feats[..., 3:]], -1)
    elif mode == "drop-covars":
        feats = feats.copy()
        feats[..., 3:] = 0
    out = dict(batch)
    out["feats"] = feats
    return out


def _read_fn_for(cfg, config_name: str):
    """Per-dataset Provider read_fn — the reference's per-trainer
    read_fn/fill_feed_dict choices (SURVEY.md §2.7)."""
    from ..data import modelnet, scannet, semantic3d

    d = cfg.data
    if cfg.model == "dense_semantic3d":
        return semantic3d.dense_blocks_from_pkl
    if cfg.model == "context_semantic3d":
        # context-block pkls from `prepare_data.py semantic3d_context`
        # (train_gpn_semantic3d_context.py:50-71)
        return semantic3d.context_blocks_from_pkl
    return {
        "s3dis": partial(s3dis.blocks_from_room_pkl,
                         use_covars=d.feat_dim > 3),
        "scannet": scannet.blocks_from_scene_pkl,
        "semantic3d": semantic3d.blocks_from_pkl,
        "modelnet40": modelnet.clouds_from_pkl,
    }[config_name]


def make_batches(cfg, args, split: str, batch_size: int):
    d = cfg.data
    if args.synthetic or not args.data_dir:
        steps = args.steps_per_epoch or 50
        if cfg.model == "dense_semantic3d":
            return lambda: (_ablate(b, args.ablate_feats)
                            for b in toy.dense_batches(
                                steps, batch_size,
                                num_points=d.num_points,
                                num_classes=d.num_classes,
                                feat_dim=max(d.feat_dim, 1),
                                seed=0 if split == "train" else 1))
        return lambda: (_ablate(b, args.ablate_feats)
                        for b in toy.toy_batches(
                            steps, batch_size, num_points=d.num_points,
                            kind="room", num_classes=d.num_classes,
                            feat_dim=max(d.feat_dim, 1),
                            seed=0 if split == "train" else 1))
    data_dir = args.data_dir if split == "train" else (
        args.test_data_dir or args.data_dir)
    files = sorted(glob.glob(os.path.join(data_dir, "*.pkl")))
    if not files:
        raise FileNotFoundError(f"no .pkl files in {data_dir}")
    read_fn = _read_fn_for(cfg, args.config)
    return lambda: (_ablate(b, args.ablate_feats)
                    for b in Provider(files, split, batch_size, read_fn,
                                      d.num_points))


def _metrics_writer(args, cfg):
    """Append-mode JSONL sink for per-epoch eval metrics — the machine-
    readable replacement for the reference's grep-the-log analysis flow
    (analysis_feats_compare.py:7-39 parses 'mean iou'/'<class> iou' lines
    out of free-text logs; here every epoch record is one JSON object)."""
    import json

    path = args.metrics_file
    if path is None and args.log_file:
        path = os.path.splitext(args.log_file)[0] + ".metrics.jsonl"
    if path is None and cfg.checkpoint_dir:
        path = os.path.join(cfg.checkpoint_dir, "metrics.jsonl")
    if path is None:
        return lambda rec: None
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)

    def write(rec):
        def clean(v):
            if isinstance(v, np.ndarray):
                return [float(x) for x in v]
            return float(v) if isinstance(v, (np.floating, np.integer)) \
                else v
        with open(path, "a") as f:
            f.write(json.dumps({k: clean(v) for k, v in rec.items()}) + "\n")

    return write


def main(argv=None):
    from ..utils import cache as _cache
    _cache.enable()
    args = parse_args(argv)
    cfg = build_cfg(args)
    log = get_logger("pcs_tpu.cli", args.log_file)
    write_metrics = _metrics_writer(args, cfg)

    mesh = None if args.no_mesh else make_mesh()
    n_dev = 1 if mesh is None else mesh.size
    batch_size = args.batch_size or max(
        n_dev * cfg.batch_per_device, 1)
    batch_size = (batch_size // n_dev) * n_dev or n_dev
    log.info("config=%s model=%s devices=%d batch=%d points=%d", args.config,
             cfg.model, n_dev, batch_size, cfg.data.num_points)

    trainer = Trainer(cfg, mesh=mesh)
    rng = jax.random.PRNGKey(cfg.seed)
    train_batches = make_batches(cfg, args, "train", batch_size)
    test_batches = make_batches(cfg, args, "test", batch_size)

    state = trainer.init_state(rng, next(iter(train_batches())))
    ckpt: Optional[CheckpointManager] = None
    start_epoch = 0
    if cfg.checkpoint_dir:
        ckpt = CheckpointManager(cfg.checkpoint_dir, cfg.keep_checkpoints)
        if args.restore_best:
            state = ckpt.restore_best(state)
            start_epoch = (ckpt.latest_epoch() or 0) + 1
            log.info("restored best epoch %d", ckpt.best_epoch())
        elif args.restore:
            state = ckpt.restore(state, args.restore_epoch)
            start_epoch = (ckpt.latest_epoch() or 0) + 1
            log.info("restored epoch %d", start_epoch - 1)

    if args.eval:
        state, res = trainer.run_epoch(state, test_batches(), rng,
                                       train=False)
        log.info("eval mIoU %.4f oIoU %.4f oAcc %.4f loss %.4f",
                 res["miou"], res["oiou"], res["oacc"], res.get("loss", 0))
        for i, iou in enumerate(res["iou"]):
            log.info("  class %d iou %.4f acc %.4f", i, iou, res["acc"][i])
        write_metrics({"epoch": -1, "split": "eval", "miou": res["miou"],
                       "oiou": res["oiou"], "oacc": res["oacc"],
                       "loss": res.get("loss", 0), "iou": res["iou"],
                       "acc": res["acc"]})
        return res

    for epoch in range(start_epoch, cfg.num_epochs):
        # LR at the epoch's FIRST step — state.step after the epoch would
        # read the NEXT step's schedule value (one staircase boundary early
        # at decay epochs) and drifts from the applied LR after skipped
        # non-finite steps
        epoch_lr = float(trainer.lr_at(int(jax.device_get(state.step))))
        state, tr = trainer.run_epoch(state, train_batches(), rng,
                                      train=True)
        state, te = trainer.run_epoch(state, test_batches(), rng,
                                      train=False)
        log.info("epoch %d train-loss %.4f | test mIoU %.4f oIoU %.4f "
                 "oAcc %.4f | %.0f points/s",
                 epoch, tr.get("loss", 0), te["miou"], te["oiou"],
                 te["oacc"], tr["points_per_sec"])
        write_metrics({"epoch": epoch, "train_loss": tr.get("loss", 0),
                       "lr": epoch_lr,
                       "miou": te["miou"], "oiou": te["oiou"],
                       "oacc": te["oacc"], "iou": te["iou"],
                       "acc": te["acc"],
                       "points_per_sec": tr["points_per_sec"]})
        if ckpt is not None:
            # async: the host snapshot inside save() makes the background
            # write safe; only the end-of-training wait() blocks
            ckpt.save(epoch, state, metrics={"miou": float(te["miou"])})
    if ckpt is not None:
        ckpt.wait()
    return state


if __name__ == "__main__":
    main()
